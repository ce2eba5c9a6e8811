"""Partitioning & skew handling — partitioningprocessor analog (E9) made real.

The reference declares a partitioning stage that is currently a pass-through
(processor/partitioningprocessor/processor.go:32-61) because a single Go
process has no shuffle.  In Spark the stage is load-bearing: hot domains
(~20% of rows on 3 of 50 domains in our input) would put 20% of the data in
3 reducer tasks of any domain-keyed shuffle.

Two tools:

- ``salted_repartition``: spread rows of the same hot key across
  ``n_salts`` tasks via ``murmur3(url) % n_salts`` (the BASELINE.json
  mandated salting key) — for downstream per-partition work (writes,
  mapInPandas) that doesn't need key co-location.
- ``two_phase_agg``: salt -> partial agg -> unsalt -> final agg; the classic
  skew-proof aggregate.  With AQE skew-join handling enabled in session.py
  this is only needed for extreme aggregation skew, but at 1000 executors
  it is cheap insurance: the partial pass shrinks hot groups by ~rows/salts
  before any single reducer sees them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(key: Column, n_salts: int) -> Column:
    """murmur3-based salt in [0, n_salts) — F.hash IS Spark's murmur3."""
    return F.pmod(F.hash(key), F.lit(n_salts))


def salted_repartition(df: DataFrame, key: str, n_salts: int = 16, n_partitions: int | None = None) -> DataFrame:
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    salted = df.withColumn("_salt", salt_col(F.col(key), n_salts))
    return salted.repartition(parts, F.col(key), F.col("_salt")).drop("_salt")


def two_phase_top_n(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    n: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Skew-proof first-N rows per group (strict (order_cols) order with the
    caller responsible for making it a total order).

    A plain ``Window.partitionBy(group).orderBy(...)`` sorts each group's
    FULL row set on one task — fatal when one group dominates (an overflow
    bucket, a Common-Crawl source, ...).  Phase 1 ranks within (physical
    partition, group) and keeps at most ``n`` rows per slice; phase 2
    re-ranks the survivors per group, bounded by partitions x n.  Any row
    in a group's true first-N is also in the first-N of its own partition
    slice, so the result is exact.

    ``rank_col``: when set, the final per-group rank (1-based) is kept
    under that name so callers needing a finer per-group cut don't re-run
    an identical window over the survivors."""
    from pyspark.sql.window import Window

    local = Window.partitionBy("_pid", *group_cols).orderBy(*order_cols)
    cand = (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrn", F.row_number().over(local))
        .filter(F.col("_lrn") <= n)
        .drop("_pid", "_lrn")
    )
    final = Window.partitionBy(*group_cols).orderBy(*order_cols)
    name = rank_col or "_rn"
    out = (
        cand.withColumn(name, F.row_number().over(final))
        .filter(F.col(name) <= n)
    )
    return out if rank_col else out.drop(name)


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt_key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof aggregate: groupBy(keys + salt) partials, then
    groupBy(keys) finals.

    ``partial_aggs``/``final_aggs``: output-name -> aggregate expression;
    the final expressions reference the partial output columns.
    """
    salted = df.withColumn("_salt", salt_col(F.col(salt_key), n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in final_aggs.items()]
    )
