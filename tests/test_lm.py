"""Bigram LM perplexity scoring (CCNet-style quality filter)."""

from __future__ import annotations

from opentelemetry_collector_components_spark.operators.lm import (
    bigram_lm_scores,
    train_bigram_lm,
)


def test_hand_checked_smoothed_probabilities(spark):
    """target: 'the cat sat on the mat' + 'the cat ran' -> V = 7.
    doc 'the cat sat': floor is PER OCCURRENCE then summed —
    floor(1e6*ln(3/10)) + floor(1e6*ln(2/9)) = -1203973 + -1504078
    = -2708051 micro-nats.  OOV bigrams smooth to ln(1/V)."""
    target = spark.createDataFrame(
        [("the cat sat on the mat",), ("the cat ran",)], ["text"]
    )
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zx qv pl"), (3, "the")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in bigram_lm_scores(docs, target).collect()}
    assert set(out) == {1, 2}            # single-token doc has no bigrams
    assert out[1].score_micro == -2708051
    assert out[1].n_bigrams == 2
    # fully-OOV doc: every bigram ln(1/7) = -1.945910... -> -1945911 each
    assert out[2].score_micro == 2 * -1945911
    # target-like text outranks gibberish
    assert out[1].score_micro > out[2].score_micro
    assert abs(out[1].avg_logprob - out[1].score_micro / 2 / 1e6) < 1e-12


def test_train_counts_and_vocab(spark):
    target = spark.createDataFrame([("a b a",)], ["text"])
    uni, bi, v = train_bigram_lm(target)
    assert {(r.w1, r.c1) for r in uni.collect()} == {("a", 2), ("b", 1)}
    assert {(r.w1, r.w2, r.c2) for r in bi.collect()} == {
        ("a", "b", 1),
        ("b", "a", 1),
    }
    assert v == 3                        # 2 types + OOV


def test_deterministic(spark):
    target = spark.createDataFrame([("x y z x y",)], ["text"])
    docs = spark.createDataFrame([(i, "x y z") for i in range(50)], ["doc_id", "text"])
    a = sorted(tuple(r) for r in bigram_lm_scores(docs, target).collect())
    b = sorted(tuple(r) for r in bigram_lm_scores(docs, target).collect())
    assert a == b and len(a) == 50
