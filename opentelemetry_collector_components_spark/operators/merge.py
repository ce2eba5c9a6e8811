"""Datapoint merge semantics — lsminterval merger re-expressed relationally.

The reference folds datapoints pairwise inside pebble's merge operator
(processor/lsmintervalprocessor/internal/merger/datapoints.go,
internal/data/add.go).  Each fold rule below is restated as a groupBy
aggregate whose result equals the pairwise fold for ANY fold order — the
property pebble itself requires (MergeNewer/MergeOlder, merger.go:40-86).

Fold-order equivalences (documented per SURVEY.md §7.3):

- **delta sum** (datapoints.go:81-121, add.go:58-68): plain ``SUM`` —
  trivially associative.
- **cumulative, any type** (datapoints.go:65-79): replace iff strictly newer
  (``from.Timestamp() > to.Timestamp()``).  Equivalent set form:
  ``max_by(value, (ts, arrival))`` — keep the datapoint with max timestamp;
  the reference's strict ``>`` means on equal timestamps the EARLIER
  arrival wins, so ties break by MIN arrival order (we carry an explicit
  ``seq`` column for that; out-of-order test fixture in
  testdata/sum_delta/input.yaml).
- **delta histogram** (add.go:70-107): same bounds -> vector add of
  bucket_counts + sum/count/min/max fold; **bounds mismatch -> reset to
  newest** (add.go:72-76).  Set form: per group keep only rows carrying the
  bounds of the max-(ts,seq) datapoint, then vector-add those.  Equal to the
  pairwise fold when arrival order is ``seq`` order.
- **summary** (merger/value.go:770-779): cumulative -> replace-by-newest.
- **gauge**: never aggregated — pass through (processor.go:297-302).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ord(ts: str = "ts", seq: str = "seq") -> Column:
    """Merge-order key: newest timestamp wins; ties -> earliest arrival wins
    (strict > in datapoints.go:75 keeps the existing value on equal ts).
    No cast on ts: struct ordering compares the native type, so numeric
    AND timestamp ts columns both work."""
    return F.struct(F.col(ts).alias("t"), (-F.col(seq)).alias("s"))


def merge_delta_sum(df: DataFrame, keys: list[str], value_col: str = "value_double") -> DataFrame:
    return df.groupBy(*keys).agg(
        F.sum(value_col).alias("value"),
        F.count(F.lit(1)).alias("merged_count"),
    )


def merge_cumulative(df: DataFrame, keys: list[str], value_col: str = "value_double") -> DataFrame:
    """Last-writer-by-timestamp wins; tie -> first arrival."""
    return df.groupBy(*keys).agg(
        F.max_by(F.col(value_col), _ord()).alias("value"),
        F.max(F.col("ts")).alias("ts"),
    )


def merge_delta_histogram(df: DataFrame, keys: list[str]) -> DataFrame:
    """Explicit-bounds histogram merge with newest-bounds reset.

    Columns expected: bounds array<double>, bucket_counts array<long>,
    count long, sum double, min double, max double, ts, seq.

    The reference folds pairwise in merge order and RESETS the accumulator
    whenever bounds change — so the result covers only the datapoints
    after the LAST bounds change, not every datapoint that happens to
    share the winning bounds (bounds A -> B -> A must not resurrect the
    pre-reset A datapoints).  Implemented as two window functions + the
    final aggregate over one shuffle on ``keys``: winner bounds by merge
    order, the newest non-winner ordinal as the reset point, then only
    rows after it fold."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys)
    staged = (
        df.withColumn("_ordv", _ord())
        .withColumn("_wb", F.max_by(F.col("bounds"), F.col("_ordv")).over(w))
        .withColumn(
            "_reset",
            F.max(
                F.when(F.col("bounds") != F.col("_wb"), F.col("_ordv"))
            ).over(w),
        )
    )
    with_bounds = staged.filter(
        (F.col("bounds") == F.col("_wb"))
        & (F.col("_reset").isNull() | (F.col("_ordv") > F.col("_reset")))
    )
    return with_bounds.groupBy(*keys).agg(
        F.first("bounds").alias("bounds"),
        F.reduce(
            F.collect_list("bucket_counts"),
            F.array().cast("array<bigint>"),
            lambda acc, x: F.when(F.size(acc) == 0, x).otherwise(
                F.zip_with(acc, x, lambda a, b: a + b)
            ),
        ).alias("bucket_counts"),
        F.sum("count").alias("count"),
        F.sum("sum").alias("sum"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
    )


def merge_cumulative_struct(df: DataFrame, keys: list[str], value_cols: list[str]) -> DataFrame:
    """Replace-by-newest for multi-column datapoints (cumulative histogram /
    exponential histogram): the newest datapoint wins WHOLESALE — bounds,
    buckets, count, sum together (datapoints.go:65-79 applies to any type;
    golden: testdata/histogram_cumulative, exphistogram_cumulative)."""
    winner = F.max_by(F.struct(*[F.col(c) for c in value_cols]), _ord()).alias("_w")
    agg = df.groupBy(*keys).agg(winner, F.max("ts").alias("ts"))
    return agg.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in value_cols], "ts")


def merge_summary(df: DataFrame, keys: list[str]) -> DataFrame:
    """Summaries assumed cumulative -> replace-by-newest (value.go:770-779)."""
    pick = lambda c: F.max_by(F.col(c), _ord()).alias(c)  # noqa: E731
    return df.groupBy(*keys).agg(pick("count"), pick("sum"), F.max("ts").alias("ts"))


def overflow_remap(
    df: DataFrame,
    group_keys: list[str],
    id_col: str,
    limit: int,
    overflow_key: str = "_overflow",
) -> DataFrame:
    """Cardinality limits with overflow buckets (SURVEY.md A7;
    internal/merger/limits/tracker.go:40-98, value.go:468-630).

    The reference admits the first ``limit`` distinct child ids per parent
    and routes later ones into an ``_overflow`` bucket, tracking overflowed
    ids in an HLL sketch.  Deterministic set form: rank distinct ids by
    (first_seen_ts, first_seen_seq) and remap rank > limit.  Equal to the
    reference's arrival-order admission when arrival order == seq order.

    Adds ``overflow`` flag; callers then aggregate with the remapped id and
    count distinct overflowed ids for the ``_overflow_datapoints`` metric
    (value.go:311-366).
    """
    from pyspark.sql.window import Window

    first_seen = df.groupBy(*group_keys, id_col).agg(
        F.min(F.struct(F.col("ts").cast("double"), F.col("seq"))).alias("_fs")
    )
    w = Window.partitionBy(*group_keys).orderBy(F.col("_fs"))
    ranked = first_seen.withColumn("_rank", F.row_number().over(w)).select(
        *group_keys, id_col, (F.col("_rank") > limit).alias("overflow")
    )
    out = df.join(ranked, on=[*group_keys, id_col], how="left")
    return out.withColumn(
        f"{id_col}_merged",
        F.when(F.col("overflow"), F.lit(overflow_key)).otherwise(F.col(id_col)),
    )


def cumulative_to_delta(
    df: DataFrame,
    keys: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    seq_col: str | None = None,
) -> DataFrame:
    """The contrib ``cumulativetodeltaprocessor`` (shipped in the
    reference distribution, manifest.yaml:49): cumulative monotonic
    sums arriving from scrape-style sources become the delta stream the
    interval merger (``merge_delta_sum``) and rate operators consume.

    Per series (``keys``), points in (``ts_col``, ``seq_col``) order:

    - the FIRST point is dropped — there is no baseline to difference
      against (the processor's documented behavior for monotonic sums);
    - delta = value - previous value;
    - a value BELOW its predecessor is a counter reset (process
      restart): the post-reset value IS the delta from the implicit
      zero, so delta = value.

    Adds ``delta`` next to the input columns.  Scale shape: ONE window
    over the series key — partitioned by the full series identity, so
    parallelism is |series| (the same key the downstream interval agg
    shuffles on; at 10^9 series this is the well-distributed case, and
    a single pathological series is inherently sequential here exactly
    as in the processor's per-identity state map)."""
    from pyspark.sql import Window

    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.col(value_col)).over(w)
    return (
        df.withColumn("_prev", prev)
        .where(F.col("_prev").isNotNull())
        .withColumn(
            "delta",
            F.when(
                F.col(value_col) >= F.col("_prev"),
                F.col(value_col) - F.col("_prev"),
            ).otherwise(F.col(value_col)),
        )
        .drop("_prev")
    )
