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


def _rbo_weights_micro(p_num: int, p_den: int, depth: int) -> list[int]:
    """Micro-floored RBO depth weights (1-p)*p^(d-1), d = 1..depth —
    computed ONCE driver-side in exact rational arithmetic and inlined
    into both engines as literals, because pow() is not exactly-rounded
    IEEE and libm results may differ between JVM and DuckDB."""
    from fractions import Fraction

    p = Fraction(p_num, p_den)
    w, out = (1 - p), []
    for _ in range(depth):
        out.append(int(w * MICRO))  # floor: w*1e6 is an exact Fraction
        w *= p
    return out


def rbo(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    item_col: str,
    rank_col: str,
    p_num: int = 9,
    p_den: int = 10,
    depth: int = 50,
) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between
    two rankings per key — the standard top-weighted similarity for
    comparing ranked lists of possibly different membership ("how much
    did today's trending list move vs yesterday's?"; "did the index
    rebuild change the top results?").  Kendall/Spearman need identical
    membership; RBO handles disjoint tails and weights the head, with
    persistence p (top-heavier as p falls).

        RBO@D = (1-p) * sum_{d=1..D} p^(d-1) * |topd(L) ∩ topd(R)| / d

    Exactness: the depth weights are micro-floored Fractions computed
    once driver-side and inlined as literals in BOTH engines (pow is
    not cross-engine reproducible; a literal table is); each term is
    the pure-integer ``(A_d * w_micro_d) div d`` and the per-key score
    their BIGINT sum.  A_d comes from the shared-item join: an item
    enters the intersection at depth max(rank_l, rank_r), so A_d is a
    bounded cumulative sum over the D-row depth grid per key.

    Inputs carry (key..., item, rank) with rank 1-based and unique per
    key; rows ranked beyond ``depth`` are ignored.  Keys present in
    only one ranking score 0 (no shared items).  Output: (*key_cols,
    shared_at_depth BIGINT, rbo_micro BIGINT, rbo DOUBLE 6dp).

    Scale shape: one equi-join on (key, item) cut to rank <= depth on
    both sides (|keys| x depth rows each), one groupBy onto the depth
    grid, one key-partitioned cumsum over D rows per key.  Driver cost
    is the D-element literal list.
    """
    from pyspark.sql.window import Window

    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not 0 < p_num < p_den:
        raise ValueError("p must be a proper fraction in (0, 1)")
    if depth < 1:
        raise ValueError("depth must be >= 1")
    weights = _rbo_weights_micro(p_num, p_den, depth)

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.where(F.col(rank_col) <= depth).select(
            *key_cols,
            F.col(item_col).alias("_item"),
            F.col(rank_col).cast("long").alias(f"_r{tag}"),
        )

    shared = side(left, "l").join(side(right, "r"), [*key_cols, "_item"])
    entry = (
        shared.select(*key_cols, F.greatest("_rl", "_rr").alias("_m"))
        .groupBy(*key_cols, "_m")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )

    # depth grid per key: every key present in EITHER ranking gets D rows
    keys_df = (
        side(left, "l")
        .select(*key_cols)
        .union(side(right, "r").select(*key_cols))
        .distinct()
    )
    grid = keys_df.select(
        *key_cols,
        F.explode(F.sequence(F.lit(1), F.lit(depth))).alias("_d"),
    ).withColumn("_d", F.col("_d").cast("long"))
    wmap = F.map_from_arrays(
        F.array(*[F.lit(d + 1) for d in range(depth)]),
        F.array(*[F.lit(w) for w in weights]),
    )
    win = Window.partitionBy(*key_cols).orderBy("_d")
    terms = (
        grid.join(
            entry.withColumnRenamed("_m", "_d"), [*key_cols, "_d"], "left"
        )
        .withColumn("_c", F.coalesce(F.col("_c"), F.lit(0)))
        .withColumn("_a", F.sum("_c").over(win).cast("long"))
        .withColumn("_w", wmap[F.col("_d")])
        .withColumn("_term", F.expr("(_a * _w) div _d"))
    )
    return (
        terms.groupBy(*key_cols)
        .agg(
            F.max(F.when(F.col("_d") == depth, F.col("_a")))
            .cast("long")
            .alias("shared_at_depth"),
            F.sum("_term").cast("long").alias("rbo_micro"),
        )
        .select(
            *key_cols,
            "shared_at_depth",
            "rbo_micro",
            F.round(F.col("rbo_micro") / MICRO, 6).alias("rbo"),
        )
    )
