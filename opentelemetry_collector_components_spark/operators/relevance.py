"""Ranking-quality evaluation: nDCG@k, MRR@k, precision/recall@k.

The measurement half of the retrieval stack (operators/retrieval.py
produces rankings; this module grades them against relevance judgments)
— the standard TREC evaluation battery (Järvelin & Kekäläinen, TOIS
2002 for nDCG; Voorhees, TREC-8 for MRR) that a corpus-mining pipeline
runs to pick retrieval parameters before committing a 100 TB sweep.

Engine-exact arithmetic (the repo-wide rank-key discipline from
operators/retrieval.py): every metric is carried as a BIGINT in micro
units so cross-engine sums are associative and bit-identical.

- per-hit DCG gain uses the graded form ``(2^grade - 1) / log2(rank+1)``
  quantized once per hit: ``floor(1e6 * (2^grade - 1) / log2(rank + 1))``
  — one integer shift, one ``log2`` of a small integer, one double
  multiply-divide, one floor; both engines agree bit-for-bit.  The
  per-query DCG/IDCG are BIGINT sums of those quanta.
- nDCG is the pure-BIGINT ``(dcg_micro * 1000000) div idcg_micro``
  (0 when a query has no relevant documents).
- reciprocal rank is ``1000000 div first_relevant_rank`` — exact.
- precision@k = ``(hits * 1000000) div k``; recall@k =
  ``(hits * 1000000) div n_rel`` — exact rationals, truncating division.

Overflow bound: dcg_micro <= 1e6 * k * (2^max_grade - 1); the nDCG
numerator ``dcg_micro * 1e6`` stays under 2^63 for k * 2^max_grade up to
~9e6 — any sane judgment scale (TREC grades are 0..3, k <= 1000).

Scale shape: qrels (human judgments) are inherently small but the
operator never assumes it — the ideal-ranking cut uses the shared
skew-proof ``two_phase_top_n`` and every per-query reduction is a plain
aggregate (map-side partial combine, one shuffle on query_id).  The
ranking side is pre-cut to rank <= k before the join, so the join input
is |Q| x k rows regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _dcg_term(grade_name: str, rank_name: str):
    """floor(1e6 * (2^grade - 1) / log2(rank + 1)) as BIGINT — integer
    shift for the gain (no float pow), then the one quantized float
    evaluation (module docstring)."""
    return F.expr(
        f"CAST(floor(1000000.0"
        f" * (shiftleft(CAST(1 AS BIGINT), CAST({grade_name} AS INT)) - 1)"
        f" / log2({rank_name} + 1)) AS BIGINT)"
    )


def ranking_metrics(
    ranking: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    grade_col: str = "grade",
) -> DataFrame:
    """Per-query evaluation of a ranking against relevance judgments.

    ``ranking``: (query_id, doc_id, rank) with rank 1-based within query
    (e.g. the output of ``retrieval.bm25_join``).  ``qrels``: (query_id,
    doc_id, grade) with integer grade >= 0; relevant means grade > 0.
    The query universe is the queries present in ``qrels`` (TREC
    convention: unjudged queries cannot be scored); a judged query with
    no ranking rows scores zero everywhere.

    Output, one row per query: (query_id, n_rel, judged_at_k, hits,
    rr_micro, dcg_micro, idcg_micro, ndcg_micro, precision_micro,
    recall_micro, ndcg, mrr, precision, recall) — the *_micro BIGINTs
    are the engine-exact forms (module docstring), the doubles are the
    same quantities in natural units rounded to 4 dp.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from .partition import two_phase_top_n

    qr = qrels.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(grade_col).cast("long").alias("grade"),
    )
    per_q = qr.groupBy("query_id").agg(
        F.sum((F.col("grade") > 0).cast("long")).alias("n_rel")
    )

    # ideal DCG: the top-k grades per query in descending grade order
    # (doc_id tie-break for a total order; ties don't change the value).
    ideal = two_phase_top_n(
        qr.filter(F.col("grade") > 0),
        ["query_id"],
        [F.col("grade").desc(), F.col("doc_id").asc()],
        k,
        rank_col="ideal_rank",
    )
    idcg = ideal.groupBy("query_id").agg(
        F.sum(_dcg_term("grade", "ideal_rank")).alias("idcg_micro")
    )

    # observed top-k joined to judgments; unjudged retrieved docs
    # contribute nothing (standard trec_eval behavior).
    topk = ranking.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(rank_col).cast("long").alias("rank"),
    ).filter(F.col("rank") <= k)
    matched = topk.join(qr, ["query_id", "doc_id"])
    obs = matched.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("judged_at_k"),
        F.sum((F.col("grade") > 0).cast("long")).alias("hits"),
        F.min(F.when(F.col("grade") > 0, F.col("rank"))).alias("first_rel_rank"),
        F.sum(_dcg_term("grade", "rank")).alias("dcg_micro"),
    )

    z = F.lit(0).cast("long")
    out = (
        per_q.join(obs, "query_id", "left")
        .join(idcg, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.coalesce("judged_at_k", z).alias("judged_at_k"),
            F.coalesce("hits", z).alias("hits"),
            F.coalesce(
                F.expr(f"{MICRO} div first_rel_rank"), z
            ).alias("rr_micro"),
            F.coalesce("dcg_micro", z).alias("dcg_micro"),
            F.coalesce("idcg_micro", z).alias("idcg_micro"),
        )
        .withColumn(
            "ndcg_micro",
            F.when(
                F.col("idcg_micro") > 0,
                F.expr(f"(dcg_micro * {MICRO}) div idcg_micro"),
            ).otherwise(z),
        )
        .withColumn("precision_micro", F.expr(f"(hits * {MICRO}) div {k}"))
        .withColumn(
            "recall_micro",
            F.when(
                F.col("n_rel") > 0, F.expr(f"(hits * {MICRO}) div n_rel")
            ).otherwise(z),
        )
    )
    return out.select(
        "*",
        F.round(F.col("ndcg_micro") / MICRO, 4).alias("ndcg"),
        F.round(F.col("rr_micro") / MICRO, 4).alias("mrr"),
        F.round(F.col("precision_micro") / MICRO, 4).alias("precision"),
        F.round(F.col("recall_micro") / MICRO, 4).alias("recall"),
    )


def mean_ranking_metrics(per_query: DataFrame) -> DataFrame:
    """Macro-averaged evaluation summary: one row (n_queries, mrr, ndcg,
    precision, recall), each the BIGINT micro-sum divided once by
    ``1e6 * n_queries`` and rounded to 4 dp — association-order-free
    (the sums are integer; only the final division is float).

    Input: the output of ``ranking_metrics``.  Macro = every judged
    query weighs equally, the TREC convention.
    """
    agg = per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("rr_micro").alias("_rr"),
        F.sum("ndcg_micro").alias("_nd"),
        F.sum("precision_micro").alias("_pr"),
        F.sum("recall_micro").alias("_rc"),
    )
    denom = F.lit(1000000.0) * F.col("n_queries")
    return agg.select(
        "n_queries",
        F.round(F.col("_rr") / denom, 4).alias("mrr"),
        F.round(F.col("_nd") / denom, 4).alias("ndcg"),
        F.round(F.col("_pr") / denom, 4).alias("precision"),
        F.round(F.col("_rc") / denom, 4).alias("recall"),
    )
