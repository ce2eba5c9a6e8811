"""RAKE keyphrases: hand-checked degree/frequency scoring, boundary
splitting on stopwords and punctuation, multi-word phrase preference,
validation."""

from __future__ import annotations

import pytest


def test_rake_hand_checked_scores(spark):
    from opentelemetry_collector_components_spark.operators.rake import (
        rake_keyphrases,
    )

    # corpus (stopwords: the/a/and/of/to): "deep learning" appears twice
    # as a 2-word phrase; "rate" twice alone
    docs = [
        ("deep learning and the rate",),
        ("deep learning of rate",),
    ]
    df = spark.createDataFrame(docs, "text string")
    out = {r.phrase: r for r in rake_keyphrases(
        df, "text", min_count=1, top=10
    ).collect()}
    # word stats: deep freq2 deg4, learning freq2 deg4, rate freq2 deg2
    # phrase scores: "deep learning" = 2e6+2e6 = 4e6; "rate" = 1e6
    assert out["deep learning"].n == 2
    assert out["deep learning"].score_ppm == 4_000_000
    assert out["rate"].score_ppm == 1_000_000
    # multi-word phrase outranks the solo word (the RAKE property)
    assert out["deep learning"].score_ppm > out["rate"].score_ppm


def test_rake_boundaries_and_limits(spark):
    from opentelemetry_collector_components_spark.operators.rake import (
        rake_keyphrases,
    )

    df = spark.createDataFrame(
        [("alpha beta, alpha beta; one two three four five",)] * 2,
        "text string",
    )
    out = {r.phrase for r in rake_keyphrases(
        df, "text", min_count=1, top=10, max_words=4
    ).collect()}
    # punctuation splits phrases; the 5-word run exceeds max_words=4
    assert "alpha beta" in out
    assert all("five" not in p for p in out)

    with pytest.raises(ValueError):
        rake_keyphrases(df, "text", top=0)
    with pytest.raises(ValueError):
        rake_keyphrases(df, "text", stopwords=[])


def test_rake_whitespace_edges_and_metachar_stopwords(spark):
    from opentelemetry_collector_components_spark.operators.rake import (
        rake_delim_regex,
        rake_keyphrases,
    )

    # pieces edged by \t/\n must collapse to the SAME phrase identity
    # as space-edged ones (collapse-then-trim; F.trim strips ' ' only)
    docs = [
        ("end.\nnext phrase",),
        ("end. next phrase",),
    ]
    df = spark.createDataFrame(docs, "text string")
    out = {r.phrase: r.n for r in rake_keyphrases(
        df, "text", min_count=1, top=10
    ).collect()}
    assert out["next phrase"] == 2
    assert not any(p != p.strip() or "  " in p for p in out)

    # a metacharacter stopword must not corrupt the alternation: the
    # pattern stays valid (escaped) and the split is deterministic —
    # the punctuation alternative consumes the '++' run first, so
    # "c" stays attached to the preceding word
    assert r"c\+\+" in rake_delim_regex(["c++", "the"])
    got = {r.phrase for r in rake_keyphrases(
        spark.createDataFrame([("rust c++ go",)], "text string"),
        "text", stopwords=["c++"], min_count=1, top=10,
    ).collect()}
    assert got == {"rust c", "go"}
