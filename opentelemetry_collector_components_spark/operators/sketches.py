"""Mergeable HyperLogLog sketch columns — distinct counts that compose.

The reference's LSM interval pipeline keeps per-interval cardinality
state so overflow routing can ask "how many distinct identities has this
key seen?" without rescanning raw data (lsmintervalprocessor; cf.
`operators/route.py` here, which uses ``approx_count_distinct`` inline).
At 100 TB the production shape is stronger: materialize a per-partition
(e.g. per-day, per-host) SKETCH column, then answer any window's
distinct count by MERGING sketches — no second scan of the raw events,
ever.  A 7-day distinct-users query over a year of data touches 7 sketch
rows per key instead of 7 days of raw logs.

Spark ships Apache DataSketches HLL natively (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``, JVM-side, whole-stage
codegen compatible), so the sketch build is one partial-aggregated
shuffle on the grouping key and the sketch binary is a fixed few KB per
group (lgK=12 -> ~2.5 KB, ~1.6% relative standard error).  The binary
format is the public DataSketches wire format — sketches built here
merge with sketches built by Druid, Hive, or the DataSketches Java/C++
libraries.

Scale shape: ``sketch_distinct`` is one groupBy (map-side partials
combine sketches per task before the shuffle); ``merge_sketches``
shuffles only sketch rows — bounded by |groups|, not |events|.  No UDF,
no driver collect.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per key group.

    Returns (key_cols..., hll_sketch BINARY).  ``lgk`` trades size for
    accuracy (2^lgk buckets; 12 -> ~1.6% RSE).  This is the
    materialization pass a corpus runs once per ingest partition.
    """
    if not 4 <= lgk <= 21:
        raise ValueError("lgk must be in [4, 21]")
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll_sketch")
    )


def merge_sketches(
    df: DataFrame,
    key_cols: list[str],
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Union sketches across rows into one sketch per (coarser) key.

    The rollup pass: daily sketches -> weekly/monthly/all-time, host
    sketches -> domain sketches.  Input rows are sketch rows (bounded by
    the finer grouping's cardinality), so this shuffle never touches raw
    data.  With ``key_cols=[]`` produces the single global sketch.
    """
    agg = F.hll_union_agg(sketch_col).alias(sketch_col)
    if key_cols:
        return df.groupBy(*key_cols).agg(agg)
    return df.agg(agg)


def estimate(sketch: Column | str) -> Column:
    """Distinct-count estimate (BIGINT) of a sketch column."""
    return F.hll_sketch_estimate(sketch)


def hll_intersection_estimate(a: Column | str, b: Column | str) -> Column:
    """|A ∩ B| estimate from two HLL sketches via inclusion–exclusion.

    HLL unions losslessly but cannot intersect, so the standard estimator
    is ``est(A) + est(B) − est(A ∪ B)`` — the "how many users were active
    on BOTH days / both surfaces" question over materialized sketch rows,
    no rescan of raw events.  Error compounds: each term carries the
    sketch RSE, so the absolute error scales with the UNION size, not the
    intersection — a tiny overlap of two huge sets is where this estimator
    is weakest (callers wanting tight small intersections need K-minimum-
    values/theta sketches, which Spark does not ship).  Callers should
    gate tolerance on the union estimate.
    """
    return (
        F.hll_sketch_estimate(a)
        + F.hll_sketch_estimate(b)
        - F.hll_sketch_estimate(F.hll_union(a, b))
    )


# ---------------------------------------------------------------------------
# DDSketch — fully-mergeable relative-error quantiles
# ---------------------------------------------------------------------------
def _dd_gamma(alpha: float) -> float:
    if not 0 < alpha < 1:
        raise ValueError("alpha must be in (0, 1)")
    return (1 + alpha) / (1 - alpha)


def ddsketch_build(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    alpha: float = 0.01,
) -> DataFrame:
    """DDSketch (Masson/Rim/Lee, VLDB 2019) as sketch ROWS: one
    ``(key..., bucket INT, n BIGINT)`` row per occupied log-γ bucket.

    Bucket ``i = ceil(log_γ(x))`` covers ``(γ^(i-1), γ^i]``; any value in
    the bucket is within relative error ``alpha`` of the bucket midpoint
    ``2γ^i/(γ+1)``.  Unlike rank-error sketches (GK / ``approx_percentile``)
    the guarantee is RELATIVE to the value — p99 latency tails stay
    accurate no matter how heavy.  Row-shaped sketches merge by plain
    ``groupBy(bucket).sum(n)`` (``ddsketch_merge``), so daily sketches roll
    up to any window without rescanning raw data, same shape as the HLL
    rows above.  Bucket count is bounded by the value dynamic range:
    log_γ(max/min) buckets total (~916 buckets for 6 decades at α=1%),
    so sketch rows per key are O(100s) regardless of event count.

    Non-positive and NULL values are ignored (DDSketch's positive store;
    track zeros/negatives in a separate column if needed).  The log-γ
    index is rounded to 9 dp before ``ceil`` so the bucket id is identical
    across engines (ln differs by ≤1 ulp between libm implementations).
    """
    gamma = _dd_gamma(alpha)
    x = F.col(value_col)
    bucket = F.ceil(
        F.round(F.log(x) / F.lit(math.log(gamma)), 9)
    ).cast("int")
    return (
        df.where(x > 0)
        .groupBy(*key_cols, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def ddsketch_merge(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Merge sketch rows to a coarser key (daily → monthly, host → fleet):
    one groupBy over |buckets|·|groups| rows, never raw events."""
    return df.groupBy(*key_cols, "bucket").agg(F.sum("n").alias("n"))


def ddsketch_quantiles(
    sketch: DataFrame,
    key_cols: list[str],
    qs: list[float],
    alpha: float = 0.01,
) -> DataFrame:
    """Quantile estimates from DDSketch rows: for each q, the value of the
    first bucket whose cumulative count reaches rank ``floor(1+q·(n−1))``,
    estimated at the bucket midpoint ``2γ^i/(γ+1)`` (rounded to 4 dp).

    Returns ``(key..., q DOUBLE, est DOUBLE)``.  The cumulative walk runs
    over SKETCH rows only (bounded by bucket count, not event count): a
    window partitioned by the sketch key when keys exist; keyless sketches
    use a join-based cumsum instead (|buckets|² pairs of an already-tiny
    frame) — partitioning a window by a constant does not help, Catalyst
    folds the constant away and leaves a single-task global window.  The
    q fan-out is a broadcast of a |qs|-row literal frame.
    """
    gamma = _dd_gamma(alpha)
    spark = sketch.sparkSession
    if not qs:
        raise ValueError("qs must be non-empty")
    if key_cols:
        from pyspark.sql.window import Window

        w = Window.partitionBy(*key_cols).orderBy("bucket")
        cum = sketch.withColumn("cum", F.sum("n").over(w)).withColumn(
            "total", F.sum("n").over(Window.partitionBy(*key_cols))
        )
    else:
        other = sketch.select(
            F.col("bucket").alias("_b2"), F.col("n").alias("_n2")
        )
        cum = (
            sketch.join(F.broadcast(other), F.col("_b2") <= F.col("bucket"))
            .groupBy("bucket")
            .agg(F.sum("_n2").alias("cum"))
            .crossJoin(
                F.broadcast(sketch.agg(F.sum("n").alias("total")))
            )
        )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    rank = F.floor(F.lit(1.0) + F.col("q") * (F.col("total") - 1)).cast("long")
    est = F.round(
        F.lit(2.0) * F.pow(F.lit(gamma), F.col("bucket")) / F.lit(gamma + 1), 4
    )
    return (
        cum.join(F.broadcast(qdf))
        .where(F.col("cum") >= rank)
        .groupBy(*key_cols, "q")
        .agg(F.min("bucket").alias("bucket"))
        .select(*key_cols, "q", est.alias("est"))
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — mergeable point-frequency estimates
# ---------------------------------------------------------------------------
def cm_sketch_build(
    df: DataFrame,
    key_cols: list[str],
    item_col: str,
    width: int = 512,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, 2005) as sketch ROWS:
    ``(key..., r INT, c INT, n BIGINT)`` — depth×width counters per key
    group, stored sparsely (only occupied cells).

    Each item increments cell ``(r, h_r(item) mod width)`` for every row
    ``r < depth``; a point query reads the MIN over the depth cells
    (``cm_estimate``), overestimating by at most ``2N/width`` with
    probability ``1 − 2^−depth``.  The hash is the repo-wide cross-engine
    ``md5_hash60`` seeded per row, so the whole sketch — build, merge,
    estimate — replays exactly in any SQL engine with ``md5()``.

    Scale shape: the build is one groupBy over (key, r, c) after a
    depth-way explode — map-side partial aggregation collapses each task
    to ≤ depth·width cells before the shuffle, so shuffle volume is
    bounded by |groups|·depth·width regardless of event count.  Merging
    (``cm_merge``) is counter addition: groupBy-sum over sketch rows.
    """
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    from ..functions.textstats import md5_hash60

    rows = F.explode(F.array([F.lit(r) for r in range(depth)])).alias("r")
    h = md5_hash60(
        F.concat(F.col("_item"), F.lit(f":cm{seed}:"), F.col("r").cast("string"))
    )
    return (
        df.select(*key_cols, F.col(item_col).cast("string").alias("_item"), rows)
        .withColumn("c", F.pmod(h, F.lit(width)).cast("int"))
        .groupBy(*key_cols, "r", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cm_merge(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Merge CM sketches to a coarser key: counter addition, one groupBy
    over sketch rows (≤ depth·width per input group)."""
    return df.groupBy(*key_cols, "r", "c").agg(F.sum("n").alias("n"))


def cs_sketch_build(
    df: DataFrame,
    key_cols: list[str],
    item_col: str,
    width: int = 256,
    depth: int = 5,
    seed: int = 11,
) -> DataFrame:
    """CountSketch / AMS sketch (Charikar-Chen-Farach-Colton 2004; Alon-
    Matias-Szegedy 1996) as sparse rows ``(key..., r, c, v BIGINT)``:
    each item adds a ±1 sign to cell ``(r, h_r(item))``.

    What it buys over Count-Min: UNBIASED linear estimates.  The inner
    product of two sketches estimates a JOIN SIZE (Σ_k f_A(k)·f_B(k)) and
    the self inner product estimates F2 (self-join size) — the statistics
    a planner wants BEFORE committing to a shuffle ("will this key join
    explode?"), read from sketch tables instead of scanning raw data.
    Median over ``depth`` (odd) independent rows controls the variance.

    Same scale shape and cross-engine md5 hashing as the CM sketch above:
    one partial-aggregated groupBy, ≤ |groups|·depth·width cells, exact
    integer arithmetic end to end (estimates replay exactly in SQL).
    """
    if width < 1 or depth < 1 or depth % 2 == 0:
        raise ValueError("width >= 1 and odd depth >= 1 required")
    from ..functions.textstats import md5_hash60

    rows = F.explode(F.array([F.lit(r) for r in range(depth)])).alias("r")
    hc = md5_hash60(
        F.concat(F.col("_item"), F.lit(f":cs{seed}:"), F.col("r").cast("string"))
    )
    hs = md5_hash60(
        F.concat(F.col("_item"), F.lit(f":css{seed}:"), F.col("r").cast("string"))
    )
    sign = (F.pmod(hs, F.lit(2)) * 2 - 1).cast("long")
    return (
        df.select(*key_cols, F.col(item_col).cast("string").alias("_item"), rows)
        .withColumn("c", F.pmod(hc, F.lit(width)).cast("int"))
        .withColumn("_s", sign)
        .groupBy(*key_cols, "r", "c")
        .agg(F.sum("_s").alias("v"))
    )


def cs_merge(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Merge CountSketches (linearity: cell-wise addition)."""
    return df.groupBy(*key_cols, "r", "c").agg(F.sum("v").alias("v"))


def cs_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """Join-size estimate between two (single-group) CountSketches:
    median over depth rows of Σ_c v_a·v_b — an unbiased estimator of
    Σ_k f_A(k)·f_B(k), i.e. the row count of ``A JOIN B`` on the sketched
    key.  Cost: one equi-join of two ≤ depth·width-row frames.  Returns a
    1-row frame ``(join_size_est DOUBLE)`` (the median of odd-many exact
    integers — replays exactly in SQL).  Self-apply for F2."""
    per_r = (
        a.select("r", "c", F.col("v").alias("_va"))
        .join(b.select("r", "c", F.col("v").alias("_vb")), ["r", "c"])
        .groupBy("r")
        .agg(F.sum(F.col("_va") * F.col("_vb")).alias("_ip"))
    )
    # a depth row with no overlapping cells has inner product 0, not
    # "absent" — without the fill the median would skip it and bias up
    rs = a.select("r").union(b.select("r")).distinct()
    filled = rs.join(per_r, "r", "left").select(
        F.coalesce(F.col("_ip"), F.lit(0).cast("long")).alias("_ip")
    )
    return filled.agg(
        F.expr("percentile(_ip, 0.5)").alias("join_size_est")
    )


def cm_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 512,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Point-frequency estimates for ``items`` against a (single-group)
    CM sketch: min over the depth cells, 0 for never-hashed cells.

    ``items`` is the small query side (broadcast); the sketch side is at
    most depth·width rows.  Returns ``items.columns + (cm_n BIGINT)``.
    Exact-integer arithmetic end to end — estimates replay exactly in SQL.
    """
    from ..functions.textstats import md5_hash60

    rows = F.explode(F.array([F.lit(r) for r in range(depth)])).alias("r")
    item = F.col(item_col).cast("string")
    h = md5_hash60(
        F.concat(item, F.lit(f":cm{seed}:"), F.col("r").cast("string"))
    )
    probes = items.select(
        *items.columns, rows
    ).withColumn("c", F.pmod(h, F.lit(width)).cast("int"))
    return (
        probes.join(F.broadcast(sketch.select("r", "c", "n")), ["r", "c"], "left")
        .groupBy(*items.columns)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("cm_n"))
    )
