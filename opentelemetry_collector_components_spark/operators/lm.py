"""Bigram language-model perplexity scoring — the CCNet quality filter.

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") ranks Common-Crawl documents by the
perplexity of a language model trained on a high-quality target corpus
(there: KenLM on Wikipedia) and keeps the low-perplexity head/middle.
This is the relational form of that filter: an add-1-smoothed bigram LM
trained on the target with two aggregates, scoring the corpus with one
explode + two count joins — no model server, no per-row Python.

Score of a document = sum over its bigram occurrences (w1, w2) of

    ln P(w2 | w1) = ln( (c(w1 w2) + 1) / (c(w1) + V) )

with c(.) the target-corpus counts and V the target unigram vocabulary
size + 1 (the OOV type).  Emitted as integer micro-nats
(``floor(1e6 * ln p)`` per occurrence, summed as BIGINT) so the score is
association-order-free and exactly restatable in any SQL engine — the
same surrogate-integer rule as ``sampling.dsir_importance_scores`` and
``textmine.tf_idf_top_terms``.  A float ``avg_logprob`` (plain nats per
token, the quantity whose exp(-x) is perplexity) is emitted for
consumers but carries the float caveat; rank on ``score_micro`` /
``n_bigrams``.

Scale shape: the target is small by definition (a curated corpus), so
its unigram and bigram count tables broadcast; the corpus pays one
tokenize/explode plus two broadcast joins and one groupBy(doc) — never
a corpus x corpus join, and the corpus-side stream carries 8-byte
counts, not model state.  For a target too large to broadcast, the two
joins degrade gracefully to shuffle hash joins on well-spread token
keys (AQE decides by size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per bigram OCCURRENCE: (_id, w1, w2)."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return df.select(
        F.col(id_col).alias("_id"), F.explode(pairs).alias("p")
    ).select("_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def train_bigram_lm(
    target: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """(unigram counts, bigram counts, V) from the target corpus.  Two
    partial-aggregated passes; V = distinct unigram types + 1 (OOV)."""
    toks = F.explode(
        F.split(F.lower(F.col(text_col)), r"\s+")
    ).alias("w1")
    uni = (
        target.select(toks)
        .where(F.col("w1") != "")
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = (
        _doc_bigrams(target, text_col=text_col, id_col=text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    vocab = uni.count() + 1
    return uni, bi, vocab


def bigram_lm_scores(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document LM score against the target corpus: ``score_micro``
    (BIGINT micro-nats, the exact rank key), ``n_bigrams``, and
    ``avg_logprob`` (float nats/bigram; perplexity = exp(-avg_logprob)).
    Documents with fewer than 2 tokens have no bigrams and drop out —
    the CCNet filter has nothing to rank them on.  See module docstring
    for the smoothing recipe and 100 TB join shape."""
    uni, bi, vocab = train_bigram_lm(target, text_col)
    occ = _doc_bigrams(df, id_col, text_col)
    num = F.col("c2") + F.lit(1)
    den = F.col("c1") + F.lit(vocab)
    lp_micro = F.floor(
        F.lit(1000000.0) * F.log(num.cast("double") / den.cast("double"))
    ).cast("long")
    scored = (
        occ.join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(F.broadcast(uni), ["w1"], "left")
        .withColumn("c2", F.coalesce(F.col("c2"), F.lit(0)))
        .withColumn("c1", F.coalesce(F.col("c1"), F.lit(0)))
        .withColumn("_lp", lp_micro)
    )
    return scored.groupBy(F.col("_id").alias(id_col)).agg(
        F.sum("_lp").alias("score_micro"),
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum("_lp") / F.count(F.lit(1)) / F.lit(1000000.0)).alias(
            "avg_logprob"
        ),
    )


def ccnet_buckets(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet's head/middle/tail split: per language, rank documents by
    LM score per bigram and NTILE(3) them — head = lowest perplexity,
    the slice CCNet keeps for training.  Returns ``(id_col, lang,
    ratio_milli, bucket)`` with ``ratio_milli`` the exact integer rank
    key (milli-micro-nats per bigram, sign-guarded truncating div — the
    per-doc normalization that makes long and short docs comparable).

    The per-lang NTILE is a rank over the whole language partition —
    fine at audit scale; at 100 TB replace it with two broadcast tertile
    THRESHOLDS from ``quantiles.exact_quantiles`` and a stateless CASE,
    trading the sort for two scans (same buckets up to threshold ties).
    Sub-2-token documents have no bigrams and drop out (nothing to rank),
    exactly as in ``bigram_lm_scores``."""
    from pyspark.sql.window import Window

    scored = bigram_lm_scores(df, target, id_col, text_col)
    langs = df.select(F.col(id_col), F.col(lang_col).alias("lang"))
    ranked = scored.join(langs, id_col).withColumn(
        "ratio_milli",
        F.expr(f"-(((-score_micro) * 1000) DIV n_bigrams)"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("ratio_milli").desc(), F.col(id_col).asc()
    )
    return ranked.select(
        id_col,
        "lang",
        "ratio_milli",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            F.ntile(3).over(w),
        ).alias("bucket"),
    )
