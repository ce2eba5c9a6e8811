"""Unigram-LM tokenizer: hand-checked Viterbi, fewer-pieces tie-break,
OOV fallback, objective decomposition, vocab weighting/cuts, word cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.unigram import (
    OOV_MICRO,
    build_unigram_vocab,
    segment_words,
    unigram_tokenize_stats,
)


def _vocab(spark, entries):
    return spark.createDataFrame(
        [(p, 1, s) for p, s in entries], "piece string, cnt long, score_micro long"
    )


def _seg(spark, word, entries):
    words = spark.createDataFrame([(word,)], "word string")
    return segment_words(words, _vocab(spark, entries)).collect()[0]


def test_viterbi_hand_checked(spark):
    # "abc": [ab, c] = -1e6 + -3e6 beats [a, b, c] = -2-4-3 = -9e6
    r = _seg(
        spark,
        "abc",
        [("ab", -1_000_000), ("a", -2_000_000), ("b", -4_000_000), ("c", -3_000_000)],
    )
    assert (r.n_pieces, r.score_micro) == (2, -4_000_000)
    assert r.objective == 128 * -4_000_000 - 2


def test_fewer_pieces_tie_break(spark):
    # [aa] and [a, a] tie on score; the -1-per-piece term prefers [aa]
    r = _seg(spark, "aa", [("aa", -2_000_000), ("a", -1_000_000)])
    assert (r.n_pieces, r.score_micro) == (1, -2_000_000)


def test_oov_single_char_fallback(spark):
    r = _seg(spark, "xy", [("a", -1_000_000)])
    assert (r.n_pieces, r.score_micro) == (2, 2 * OOV_MICRO)


def test_multichar_unknown_never_a_piece(spark):
    # "ab" unknown: must go through singles even though "ab" would be cheap
    r = _seg(spark, "ab", [("a", -30_000_000), ("b", -30_000_000)])
    assert r.n_pieces == 2 and r.score_micro == -60_000_000


def test_vocab_weighting_and_cuts(spark):
    docs = spark.createDataFrame(
        [(1, "aba aba aba"), (2, "zq")], "doc_id long, text string"
    )
    v = {r.piece: r.cnt for r in build_unigram_vocab(
        docs, top_k=5, min_count=2, max_piece_len=3
    ).collect()}
    # 'a' appears twice per 'aba' occurrence x3 occurrences = 6
    assert v["a"] == 6 and v["aba"] == 3 and v["ab"] == 3
    assert "zq" not in v  # below min_count
    assert len(v) == 5  # top_k cut applied


def test_doc_stats_and_word_cap(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa " + "x" * 40)], "doc_id long, text string"
    )
    vocab = _vocab(spark, [("aa", -1_000_000), ("a", -2_000_000)])
    r = unigram_tokenize_stats(docs, vocab, max_word_len=16).collect()[0]
    # the 40-char word is dropped by the cap on both paths
    assert (r.n_words, r.n_pieces, r.score_micro) == (2, 2, -2_000_000)


def test_vocab_validation(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="must be >= 1"):
        build_unigram_vocab(docs, top_k=0)


def test_word_len_modulus_guard(spark):
    words = spark.createDataFrame([("ab",)], "word string")
    vocab = _vocab(spark, [("a", -1_000_000)])
    with pytest.raises(ValueError, match=r"\[1, 127\]"):
        segment_words(words, vocab, max_word_len=200)
