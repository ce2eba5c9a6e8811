"""Web-text hygiene: repetition features, PII scrub, corpus line dedup,
benchmark decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F


def _one(spark, text):
    from opentelemetry_collector_components_spark.functions.webtext import (
        repetition_features,
    )

    df = spark.createDataFrame([(text,)], "text string")
    feats = repetition_features(F.col("text"), chunk_size=2, max_tokens=512)
    return df.select(*[c.alias(n) for n, c in feats.items()]).first()


def test_repetition_all_unique(spark):
    r = _one(spark, "a b c d e f")
    assert r.n_lines == 3
    assert r.dup_line_frac == 0.0
    assert r.dup_line_char_frac == 0.0
    assert r.dup_bigram_frac == 0.0


def test_repetition_fully_duplicated(spark):
    # chunks of 2: ["x y","x y","x y"] — all lines are dups
    r = _one(spark, "x y x y x y")
    assert r.n_lines == 3
    assert r.dup_line_frac == round(1 - 1 / 3, 4)
    assert r.dup_line_char_frac == round(9 / 11, 4)
    # bigrams: [x y, y x, x y, y x, x y] -> "x y"x3 covers 9 of 11 chars
    assert r.top_bigram_char_frac == round(9 / 11, 4)
    assert r.dup_bigram_frac == round(1 - 2 / 5, 4)


def test_repetition_single_token(spark):
    r = _one(spark, "solo")
    assert r.n_lines == 1 and r.dup_bigram_frac == 0.0


def test_pii_scrub_and_counts(spark):
    from opentelemetry_collector_components_spark.functions.webtext import (
        pii_counts,
        pii_scrub,
    )

    df = spark.createDataFrame(
        [("mail a.b+c@ex-1.org ip 192.168.0.1 tel +4915112345678 end",)],
        "t string",
    )
    counts = pii_counts(F.col("t"))
    row = df.select(
        *[c.alias(n) for n, c in counts.items()],
        pii_scrub(F.col("t")).alias("s"),
    ).first()
    assert (row.n_email, row.n_ipv4, row.n_phone) == (1, 1, 1)
    assert row.s == "mail <EMAIL> ip <IPV4> tel <PHONE> end"


def test_pii_scrub_no_false_positives(spark):
    from opentelemetry_collector_components_spark.functions.webtext import pii_scrub

    df = spark.createDataFrame([("version 1.2.3 of pkg at a@b end",)], "t string")
    assert df.select(pii_scrub(F.col("t")).alias("s")).first().s == (
        "version 1.2.3 of pkg at a@b end"
    )


def test_dedup_corpus_lines_removes_shared_boilerplate(spark):
    from opentelemetry_collector_components_spark.operators.dedup import (
        dedup_corpus_lines,
    )

    # chunk_size=2 lines; "c o" is shared boilerplate across docs 1 and 2
    df = spark.createDataFrame(
        [
            (1, "a b c o x y"),
            (2, "p q c o"),
            (3, "c o"),  # only boilerplate -> doc drops out entirely
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup_corpus_lines(df, chunk_size=2, max_doc_freq=1).collect()
    }
    assert out[1].text_dedup == "a b x y" and out[1].n_lines_kept == 2
    assert out[2].text_dedup == "p q"
    assert 3 not in out


def test_dedup_corpus_lines_preserves_order(spark):
    from opentelemetry_collector_components_spark.operators.dedup import (
        dedup_corpus_lines,
    )

    df = spark.createDataFrame(
        [(1, "z z a a m m b b")], "doc_id long, text string"
    )
    out = dedup_corpus_lines(df, chunk_size=2, max_doc_freq=1).first()
    assert out.text_dedup == "z z a a m m b b"


def test_decontamination_flags_benchmark_overlap(spark):
    from opentelemetry_collector_components_spark.operators.dedup import (
        contaminated_ids,
        contamination_ngrams,
    )

    bench_doc = " ".join(f"w{i}" for i in range(13))
    clean_doc = " ".join(f"v{i}" for i in range(20))
    leaked = "intro words " + bench_doc + " trailing"
    df = spark.createDataFrame(
        [(1, bench_doc), (2, clean_doc), (3, leaked), (4, "short doc")],
        "doc_id long, text string",
    )
    bench = contamination_ngrams(df.where(F.col("doc_id") == 1), n=13)
    hits = {r.doc_id: r.n_hits for r in contaminated_ids(df, bench, n=13).collect()}
    assert set(hits) == {1, 3} and hits[1] == 1 and hits[3] == 1


def test_luhn_valid_known_numbers(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.functions.webtext import (
        luhn_valid,
    )

    rows = [
        ("4111111111111111", True),    # classic Visa test number
        ("79927398713", True),         # Wikipedia's worked example
        ("79927398710", False),
        ("1234567890123456", False),
        ("", False),
        ("4111a11111111111", False),   # non-digit -> false, not error
    ]
    df = spark.createDataFrame([(d,) for d, _ in rows], "d string")
    got = [r[0] for r in df.select(luhn_valid(F.col("d"))).collect()]
    assert got == [ok for _, ok in rows]


def test_card_candidates_extraction_and_validation(spark):
    from opentelemetry_collector_components_spark.functions.webtext import (
        card_candidates,
    )

    rows = [
        (1, "pay with 4111 1111 1111 1111 now"),          # valid, spaced
        (2, "ref 1234-5678-9012-3456 is an order id"),    # run, luhn-invalid
        (3, "short 123456789012 run"),                    # 12 digits: no hit
        (4, "embedded 94111111111111111 long"),           # 17 digits, boundary-anchored
        (5, "no digits here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["digits"]): r["luhn_ok"]
           for r in card_candidates(df).collect()}
    assert got[(1, "4111111111111111")] is True
    assert got[(2, "1234567890123456")] is False
    assert (4, "94111111111111111") in got
    assert not any(k[0] in (3, 5) for k in got)


def test_card_candidates_rejects_spaced_overlength_runs(spark):
    """A 20-digit spaced run must yield NO 13-19-digit sub-run match
    (review fix: boundary anchors bind across separators)."""
    from opentelemetry_collector_components_spark.functions.webtext import (
        card_candidates,
    )

    rows = [(1, "ref 1234 5678 9012 3456 7890 end"),
            (2, "ok 4111 1111 1111 1111 here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["digits"]) for r in card_candidates(df).collect()}
    assert got == {(2, "4111111111111111")}
