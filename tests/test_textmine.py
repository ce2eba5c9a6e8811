"""Log template mining + tf-idf ranking."""

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.textmine import (
    log_template,
    log_template_counts,
    tfidf_top_terms,
)


def test_masking_rules(spark):
    cases = [
        ("ts=2026-08-17T09:00:00Z ok", "ts=<TS> ok"),
        ("id=550e8400-e29b-41d4-a716-446655440000", "id=<UUID>"),
        ("src=192.168.0.1 dst=10.0.0.255", "src=<IP> dst=<IP>"),
        ("req=0xdeadbeef trace=0123456789abcdef0123", "req=<HEX> trace=<HEX>"),
        ("took 12.5 ms, 3 retries", "took <NUM> ms, <NUM> retries"),
        ("plain words survive", "plain words survive"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "text string")
    got = [r["t"] for r in df.select(log_template(F.col("text")).alias("t")).collect()]
    assert got == [want for _, want in cases]


def test_template_collapse(spark):
    lines = [
        f"ts=2026-01-01T00:00:{i:02d}Z level=INFO code={i}" for i in range(50)
    ] + [f"ts=2026-01-01T00:01:{i:02d}Z level=ERROR code={i}" for i in range(7)]
    df = spark.createDataFrame([(t,) for t in lines], "text string")
    got = {
        r["template"]: r["n_lines"] for r in log_template_counts(df).collect()
    }
    assert got == {
        "ts=<TS> level=INFO code=<NUM>": 50,
        "ts=<TS> level=ERROR code=<NUM>": 7,
    }


def test_tfidf_ranks_rare_terms_up(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common rare"),
            (2, "common other other"),
            (3, "common unique"),
        ],
        "doc_id long, text string",
    )
    top = {
        (r["doc_id"], r["term_rank"]): r["term"]
        for r in tfidf_top_terms(docs, top_n=2).collect()
    }
    # 'common' appears in every doc (df=3) -> rare terms outrank it even
    # at lower tf; within doc 1 'rare' (tf=1, df=1) beats 'common'
    # (tf=2, df=3): 1e6*1//2 = 500000 > 2e6//4 = 500000 — tie! broken by
    # term asc -> 'common' first.  Use doc 3 for the clean case.
    assert top[(3, 1)] == "unique"  # tf=1 df=1 -> 500000 vs common 250000
    assert top[(3, 2)] == "common"
    assert top[(2, 1)] == "other"   # tf=2 df=1 -> 1000000


def test_no_python_in_plans(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    for frame in (log_template_counts(df), tfidf_top_terms(df)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


def test_ip_mask_is_word_bounded(spark):
    """Review r4: a 4+-digit trailing octet must not fragment into
    <IP><NUM> — the whole run masks as uniform <NUM> components."""
    df = spark.createDataFrame(
        [("ip=10.0.1.1234",), ("ip=10.0.1.123",)], "text string"
    )
    got = [r["t"] for r in df.select(log_template(F.col("text")).alias("t")).collect()]
    # the non-IP run falls through to the NUM rule, which pairs decimals:
    # "10.0" and "1.1234" each mask as one <NUM>
    assert got == ["ip=<NUM>.<NUM>", "ip=<IP>"]


# ---------------------------------------------------------------------------
# zipf_fit
# ---------------------------------------------------------------------------
def test_zipf_planted_power_law_and_reference(spark):
    import math
    import random
    from collections import Counter

    from opentelemetry_collector_components_spark.operators.textmine import zipf_fit

    rng = random.Random(6)
    words = []
    for i in range(1, 200):
        words += [f"w{i:03d}"] * max(1, 2000 // i)
    rng.shuffle(words)
    docs = [" ".join(words[i::10]) for i in range(10)]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    r = zipf_fit(df, "text", max_rank=150).collect()[0]
    assert -1.15 < r["slope"] < -0.85  # planted 1/i corpus

    c = Counter(w for d in docs for w in d.lower().split())
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:150]
    xs = [math.floor(1000 * math.log(i + 1)) for i in range(len(ranked))]
    ys = [math.floor(1000 * math.log(tf)) for _, tf in ranked]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    assert (r["sx"], r["sy"], r["sxy"], r["sxx"]) == (sx, sy, sxy, sxx)
    assert (r["slope_num"], r["slope_den"]) == (n * sxy - sx * sy, n * sxx - sx * sx)


def test_zipf_flat_corpus_slope_near_zero(spark):
    # every token equally frequent: slope ~ 0 (degenerate uniform head)
    from opentelemetry_collector_components_spark.operators.textmine import zipf_fit

    docs = [(0, " ".join(f"t{i}" for i in range(100)))] * 4
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    r = zipf_fit(df, "text", max_rank=100).collect()[0]
    assert abs(r["slope"]) < 0.01


def test_zipf_empty_and_validation(spark):
    import pytest

    from opentelemetry_collector_components_spark.operators.textmine import zipf_fit

    empty = spark.createDataFrame([(0, "")], ["doc_id", "text"])
    assert zipf_fit(empty, "text").count() == 0
    df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="min_rank"):
        zipf_fit(df, "text", max_rank=5, min_rank=9)
    with pytest.raises(ValueError, match="overflow"):
        zipf_fit(df, "text", max_rank=1_000_000)


# ---------------------------------------------------------------------------
# heaps_fit
# ---------------------------------------------------------------------------
def test_heaps_planted_growth_and_reference(spark):
    import math
    import random

    from opentelemetry_collector_components_spark.operators.textmine import heaps_fit

    # build slices of growing size from a shared zipf-ish vocabulary:
    # V ~ K*N^beta with beta in (0,1)
    rng = random.Random(13)
    def slice_text(n_tokens):
        # zipf sampling: token index ~ floor(1/u) capped
        toks = [f"w{min(5000, int(1 / max(rng.random(), 1e-9)))}" for _ in range(n_tokens)]
        return " ".join(toks)

    rows = [(f"s{i}", slice_text(200 * (i + 1) ** 2)) for i in range(8)]
    df = spark.createDataFrame(rows, ["source", "text"])
    r = heaps_fit(df, "source", "text").collect()[0]
    assert 0.1 < r["beta"] < 0.95

    from collections import Counter

    xs, ys = [], []
    for _, t in rows:
        c = Counter(t.lower().split())
        xs.append(math.floor(1000 * math.log(sum(c.values()))))
        ys.append(math.floor(1000 * math.log(len(c))))
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    assert (r["sx"], r["sy"], r["sxy"], r["sxx"]) == (sx, sy, sxy, sxx)
    assert (r["slope_num"], r["slope_den"]) == (n * sxy - sx * sy, n * sxx - sx * sx)


def test_heaps_template_farm_flat(spark):
    from opentelemetry_collector_components_spark.operators.textmine import heaps_fit

    # identical vocab at every size: beta ~ 0
    rows = [(f"s{i}", " ".join(["the same ten words repeat here again ok now go"] * (i + 1)))
            for i in range(6)]
    df = spark.createDataFrame(rows, ["source", "text"])
    r = heaps_fit(df, "source", "text").collect()[0]
    assert abs(r["beta"]) < 0.05


def test_heaps_degenerate_cases_empty(spark):
    from opentelemetry_collector_components_spark.operators.textmine import heaps_fit

    one = spark.createDataFrame([("s0", "a b c")], ["source", "text"])
    assert heaps_fit(one, "source", "text").count() == 0  # < 2 groups
    same = spark.createDataFrame(
        [("s0", "a b"), ("s1", "c d")], ["source", "text"]
    )
    # both groups same token count -> x identical -> slope_den 0 -> empty
    assert heaps_fit(same, "source", "text").count() == 0


def test_segment_language_profile_mixed_doc(spark):
    """A doc with 2 English and 1 German sentence: dominant en at 2/3;
    an all-German doc; an empty-after-split doc is absent."""
    from opentelemetry_collector_components_spark.operators.textmine import (
        segment_language_profile,
    )

    rows = [
        (1, "the cat and the dog. der hund und die katze ein. a cup of tea."),
        (2, "der hund und das ein. die katze und der hund."),
        (3, "..."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in segment_language_profile(df).collect()}
    assert out[1]["n_segments"] == 3 and out[1]["n_langs"] == 2
    assert out[1]["dominant_lang"] == "en"
    assert out[1]["dominant_ppm"] == 666_666
    assert out[2]["dominant_lang"] == "de" and out[2]["dominant_ppm"] == 1_000_000
    assert 3 not in out


def test_segment_language_profile_tie_breaks_to_lang_asc(spark):
    from opentelemetry_collector_components_spark.operators.textmine import (
        segment_language_profile,
    )

    df = spark.createDataFrame(
        [(1, "the cat and of to. der und die das ein.")],
        "doc_id long, text string",
    )
    r = segment_language_profile(df).collect()[0]
    # 1 en segment, 1 de segment -> tie -> 'de' < 'en' wins
    assert r["dominant_lang"] == "de" and r["dominant_ppm"] == 500_000
