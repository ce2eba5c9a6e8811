"""Character-entropy quality signal: closed-form values, Python
reference parity, junk-tail separation, empty-doc contract."""

import math
import random
from collections import Counter

from opentelemetry_collector_components_spark.operators.entropy import char_entropy


def _ref_micro(text):
    c = Counter(text)
    n = len(text)
    return sum(cnt * math.floor(1e6 * math.log(n / cnt)) for cnt in c.values()) // n


def test_closed_form_values(spark):
    rows = [(0, "aaaa"), (1, "abab"), (2, "abcd"), (3, "ab€c")]
    out = {
        r["doc_id"]: r
        for r in char_entropy(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert out[0]["entropy_bits"] == 0.0          # one symbol
    assert out[1]["entropy_bits"] == 1.0          # two equiprobable
    assert out[2]["entropy_bits"] == 2.0          # four equiprobable
    assert out[3]["entropy_bits"] == 2.0          # unicode chars count once each
    assert out[2]["n_chars"] == 4


def test_matches_python_reference_random(spark):
    rng = random.Random(11)
    alphabet = "abcdefg 0123!"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 200))))
        for i in range(50)
    ]
    out = {
        r["doc_id"]: r
        for r in char_entropy(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    for i, t in rows:
        assert out[i]["entropy_micro_nats"] == _ref_micro(t), i
        assert out[i]["n_chars"] == len(t)


def test_junk_tails_separate_from_prose(spark):
    prose = "the quick brown fox jumps over the lazy dog and runs far away today"
    base64ish = "QmFzZTY0IGp1bmsgYmxvYnMgbG9vayBsaWtlIHRoaXMgKzAxMjM0NTY3ODk="
    padding = "=" * 60 + "-" * 10
    df = spark.createDataFrame(
        [(0, prose), (1, base64ish), (2, padding)], ["doc_id", "text"]
    )
    bits = {r["doc_id"]: r["entropy_bits"] for r in char_entropy(df).collect()}
    assert bits[2] < 1.0 < bits[0] < bits[1]


def test_empty_doc_produces_no_row(spark):
    df = spark.createDataFrame([(0, ""), (1, "ab")], ["doc_id", "text"])
    out = char_entropy(df).collect()
    assert {r["doc_id"] for r in out} == {1}


def test_plan_hygiene(spark):
    df = spark.createDataFrame([(0, "ab")], ["doc_id", "text"])
    plan = char_entropy(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# script profile (textstats.script_counts / dominant_script)
# ---------------------------------------------------------------------------
def test_script_counts_and_dominant(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.functions.textstats import (
        dominant_script,
        script_counts,
    )

    rows = [
        (0, "Привет мир hello 你好 123"),
        (1, "plain english text"),
        (2, "☃☃☃ !!!"),              # no script chars at all
        (3, "ab АБ"),                # 2-2 tie: alphabetical -> cyrillic
        (4, "مرحبا שלום ελλάδα 한글 かな"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "t"])
    cc = script_counts(F.col("t"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[c.alias(n) for n, c in cc.items()],
            dominant_script(F.col("t")).alias("dom"),
        ).collect()
    }
    assert (out[0]["n_cyrillic"], out[0]["n_latin"], out[0]["n_cjk"]) == (9, 5, 2)
    assert out[0]["n_digit"] == 3 and out[0]["dom"] == "cyrillic"
    assert out[1]["dom"] == "latin"
    assert out[2]["dom"] == "none"
    assert out[3]["dom"] == "cyrillic"  # deterministic alphabetical tie
    assert out[4]["n_arabic"] == 5 and out[4]["n_hebrew"] == 4
    assert out[4]["n_greek"] == 6 and out[4]["n_hangul"] == 2
    assert out[4]["n_kana"] == 2
