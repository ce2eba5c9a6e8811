"""Range join: enrich rows whose value falls inside [lo, hi) intervals.

The IP-to-geo / latency-to-bucket / price-tier lookup shape: a fact value
matched against an interval table.  Spark has no native range-join
operator, and the naive form (theta-join on two inequalities) executes as
BroadcastNestedLoopJoin — fine for a small interval table, quadratic
disaster for a big one.  Two Spark-first forms:

- ``range_lookup_broadcast`` — the honest small-dim path: broadcast the
  interval table and let the nested-loop run against an in-memory list.
  Right when intervals fit in one executor's memory (geo tables do).
- ``range_lookup_bucketed`` — the scale path: intervals explode into the
  fixed-width buckets they span, facts compute their bucket, and the
  match becomes an EQUI-join on bucket + a residual containment filter.
  Shuffle-partitionable on both sides, no nested loop; cost is
  |facts| + |intervals| x avg_buckets_per_interval.  Pick ``bucket_size``
  near the median interval width so that factor stays small.

Both forms emit one output row per (fact, matching interval) — identical
results (test-pinned) and oracle-matched against DuckDB's plain
inequality join.  Left semantics: unmatched facts keep NULL attributes.
Overlapping intervals yield one row per match by design; callers wanting
single-match lookup semantics keep their interval table disjoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _attr_list(ranges: DataFrame, lo_col: str, hi_col: str, attrs):
    return attrs or [c for c in ranges.columns if c not in (lo_col, hi_col)]


def range_lookup_broadcast(
    df: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    attrs: list[str] | None = None,
) -> DataFrame:
    attrs = _attr_list(ranges, lo_col, hi_col, attrs)
    cond = (F.col(f"f.{value_col}") >= F.col(f"r.{lo_col}")) & (
        F.col(f"f.{value_col}") < F.col(f"r.{hi_col}")
    )
    joined = df.alias("f").join(F.broadcast(ranges).alias("r"), cond, "left")
    return joined.select(
        *[F.col(f"f.{c}") for c in df.columns],
        *[F.col(f"r.{a}").alias(a) for a in attrs],
    )


def range_lookup_bucketed(
    df: DataFrame,
    ranges: DataFrame,
    value_col: str,
    bucket_size: int,
    lo_col: str = "lo",
    hi_col: str = "hi",
    attrs: list[str] | None = None,
) -> DataFrame:
    """Equi-join form: interval [lo, hi) lands in buckets
    floor(lo/bs) .. last bucket strictly below hi; a fact joins only its
    own bucket.  Empty intervals (hi <= lo) match nothing, as in the
    naive form.

    Bucket arithmetic runs in decimal, not double: double division
    misplaces longs above 2^53 into adjacent buckets (the residual filter
    never sees the row once the equi-join misses), and the upper bound
    uses floor(hi/bs) minus one exactly when hi sits on a bucket boundary
    — correct for fractional bounds too, where the old floor((hi-1)/bs)
    form dropped matches in the final partial bucket."""
    attrs = _attr_list(ranges, lo_col, hi_col, attrs)

    def _bucket(col):
        return F.floor(col.cast("decimal(38,9)") / bucket_size).cast("long")

    hi_dec = F.col(hi_col).cast("decimal(38,9)")
    upper = (
        _bucket(F.col(hi_col))
        - F.when(F.pmod(hi_dec, F.lit(bucket_size)) == 0, F.lit(1)).otherwise(F.lit(0))
    )
    r = ranges.where(F.col(hi_col) > F.col(lo_col)).withColumn(
        "_b", F.explode(F.sequence(_bucket(F.col(lo_col)), upper))
    )
    f = df.withColumn("_b", _bucket(F.col(value_col)))
    cond = (
        (F.col("f._b") == F.col("r._b"))
        & (F.col(f"f.{value_col}") >= F.col(f"r.{lo_col}"))
        & (F.col(f"f.{value_col}") < F.col(f"r.{hi_col}"))
    )
    joined = f.alias("f").join(r.alias("r"), cond, "left")
    return joined.select(
        *[F.col(f"f.{c}") for c in df.columns],
        *[F.col(f"r.{a}").alias(a) for a in attrs],
    )
