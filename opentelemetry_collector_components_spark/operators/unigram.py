"""Unigram-LM subword tokenizer (SentencePiece-style) — vocab + Viterbi.

The second classical subword tokenizer beside BPE (``operators/bpe.py``):
Kudo 2018 ("Subword Regularization", arXiv:1804.10959) scores a vocabulary
of candidate pieces with a unigram language model and segments each word
by Viterbi — the segmentation maximizing the summed piece log-probs.
SentencePiece's EM vocabulary pruning is replaced by the one-shot
frequency heuristic (top-K substrings by corpus count), which is the
standard seed vocabulary of that algorithm; scores are the unigram
log-probs of that table.

Determinism contract (the house surrogate-integer rule, same as
``lm.bigram_lm_scores``): piece scores are ``floor(1e6 * ln(cnt/total))``
micro-nats computed ENGINE-side, and the Viterbi objective is the single
integer ``128 * Σscore_micro − n_pieces`` — maximizing it maximizes the
score with a fewer-pieces tie-break, and both readouts recover exactly
from the one DP value (``n = (−obj) mod 128``, ``Σscore = −((−obj) div
128)``), so equal-score alternative paths cannot make the output
ambiguous.  The oracle replays the DP as an unrolled per-position
expression chain over a substring-score pivot — no path enumeration.

Scale shape: vocabulary candidates explode bounded substrings of the
DISTINCT word table weighted by occurrence counts (one groupBy +
skew-proof top-K); Viterbi runs in an Arrow-batched UDF over the distinct
word table only (|vocab of corpus words|, never per occurrence — the
overwhelming win on natural text), and documents aggregate per-word
results through one broadcast join.  Words longer than ``max_word_len``
are dropped upfront on BOTH paths (documented cap, keeps the oracle's
unrolled DP finite).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OOV_MICRO = -20_000_000  # single-char fallback: ln ~ e^-20, below any vocab piece


def _words(docs: DataFrame, id_col: str, text_col: str, max_word_len: int):
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    return (
        docs.select(F.col(id_col).alias("_id"), F.explode(toks).alias("word"))
        .where((F.length("word") >= 1) & (F.length("word") <= max_word_len))
    )


def build_unigram_vocab(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 6,
    top_k: int = 200,
    min_count: int = 2,
    max_word_len: int = 16,
) -> DataFrame:
    """Seed unigram vocabulary: ``(piece, cnt, score_micro)`` — the
    ``top_k`` word-internal substrings (length ≤ ``max_piece_len``) by
    occurrence-weighted corpus count, scored as micro-nat unigram
    log-probs against the selected table's own total."""
    from .partition import two_phase_top_n

    if max_piece_len < 1 or top_k < 1 or min_count < 1:
        raise ValueError("max_piece_len, top_k, min_count must be >= 1")
    wc = (
        _words(docs, id_col, text_col, max_word_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    pieces = wc.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(
                        F.lit(1), F.least(F.length("word"), F.lit(max_piece_len))
                    ),
                    lambda ln: F.transform(
                        F.sequence(F.lit(1), F.length("word") - ln + 1),
                        lambda st: F.col("word").substr(st, ln),
                    ),
                )
            )
        ).alias("piece"),
        "n_occ",
    )
    counts = (
        pieces.groupBy("piece")
        .agg(F.sum("n_occ").alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
    top = two_phase_top_n(
        counts, [], [F.col("cnt").desc(), F.col("piece").asc()], top_k
    )
    total = top.agg(F.sum("cnt").alias("_t"))
    return top.crossJoin(F.broadcast(total)).select(
        "piece",
        "cnt",
        F.floor(
            F.lit(1_000_000) * F.log(F.col("cnt").cast("double") / F.col("_t"))
        )
        .cast("long")
        .alias("score_micro"),
    )


def segment_words(
    words: DataFrame, vocab: DataFrame, max_word_len: int = 16
) -> DataFrame:
    """Viterbi-segment each DISTINCT word against the vocabulary:
    ``(word, objective, n_pieces, score_micro)``.  The UDF runs over the
    distinct-word table only; the vocab (≤ top_k rows) ships as a plain
    broadcast dict."""
    from pyspark.sql.functions import pandas_udf

    from ..caching import track_handle

    if not 1 <= max_word_len < 128:
        # n_pieces <= word length must stay below the 128 modulus or the
        # objective decode (pmod / DIV 128) silently wraps
        raise ValueError("max_word_len must be in [1, 127]")

    table = {r.piece: int(r.score_micro) for r in vocab.collect()}
    max_piece = max((len(p) for p in table), default=1)
    bc = track_handle(words.sparkSession.sparkContext.broadcast(table))

    @pandas_udf("long")
    def _viterbi(col: pd.Series) -> pd.Series:
        t = bc.value
        out = []
        for w in col:
            n = len(w)
            best = [None] * (n + 1)
            best[0] = 0
            for i in range(1, n + 1):
                cand = None
                for ln in range(1, min(i, max_piece) + 1):
                    if best[i - ln] is None:
                        continue
                    piece = w[i - ln : i]
                    sc = t.get(piece)
                    if sc is None:
                        if ln != 1:
                            continue
                        sc = OOV_MICRO
                    v = best[i - ln] + 128 * sc - 1
                    if cand is None or v > cand:
                        cand = v
                best[i] = cand
            out.append(best[n])
        return pd.Series(out)

    return words.select("word").distinct().where(
        F.length("word") <= max_word_len
    ).select(
        "word", _viterbi(F.col("word")).alias("objective")
    ).select(
        "word",
        "objective",
        (F.pmod(-F.col("objective"), F.lit(128))).cast("int").alias("n_pieces"),
        F.expr("-((-objective) DIV 128)").cast("long").alias("score_micro"),
    )


def unigram_tokenize_stats(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word_len: int = 16,
) -> DataFrame:
    """Per-document tokenization readout: ``(id_col, n_words, n_pieces,
    score_micro)`` — word occurrences joined to the per-distinct-word
    Viterbi results (broadcast) and summed."""
    occ = _words(docs, id_col, text_col, max_word_len)
    seg = segment_words(occ, vocab, max_word_len)
    return (
        occ.join(F.broadcast(seg), "word")
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
            F.sum("score_micro").cast("long").alias("score_micro"),
        )
    )
