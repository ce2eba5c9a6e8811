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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    bucket_size: int,
    lo_col: str = "lo",
    hi_col: str = "hi",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Interval x interval OVERLAP join — "which deploy windows overlap
    which incident windows", the two-sided sibling of the point-in-range
    lookups above.  Half-open [lo, hi) semantics throughout (the time-
    window convention everywhere in this repo): a pair overlaps iff
    a.lo < b.hi AND b.lo < a.hi; empty intervals (hi <= lo) match
    nothing.

    Scale shape: the naive form is an inequality cross join (|L| x |R|
    per key); here BOTH sides explode into the fixed-width buckets they
    cover (same decimal-exact bucket arithmetic as
    ``range_lookup_bucketed``) and pairs meet by EQUI-join on
    (*key_cols, bucket) — cost is sum over buckets of L_b * R_b, the
    co-occupancy, never |L| x |R|.  A pair spanning k shared buckets
    would surface k times; the one distinct() on id pairs dedups before
    attributes join back (ids must uniquely identify their interval
    rows — enforced by the verify join's row count being the pair
    count).  Choose bucket_size near the TYPICAL interval length: too
    small explodes long intervals into many buckets, too large packs
    unrelated intervals into the same bucket (both correct, both slow).

    Output: (*key_cols from the left row, left_id, right_id,
    overlap_lo, overlap_hi, overlap_len) with overlap in the interval
    columns' own units.
    """
    if bucket_size <= 0:
        raise ValueError("bucket_size must be positive")
    keys = list(key_cols or [])

    def _bucket(col):
        return F.floor(col.cast("decimal(38,9)") / bucket_size).cast("long")

    def explode_side(df: DataFrame, id_col: str, tag: str) -> DataFrame:
        hi_dec = F.col(hi_col).cast("decimal(38,9)")
        upper = _bucket(F.col(hi_col)) - F.when(
            F.pmod(hi_dec, F.lit(bucket_size)) == 0, F.lit(1)
        ).otherwise(F.lit(0))
        return (
            df.where(F.col(hi_col) > F.col(lo_col))
            .select(
                *keys,
                F.col(id_col).alias(f"{tag}_id"),
                F.col(lo_col).cast("long").alias(f"{tag}_lo"),
                F.col(hi_col).cast("long").alias(f"{tag}_hi"),
                F.explode(F.sequence(_bucket(F.col(lo_col)), upper)).alias("_b"),
            )
        )

    a = explode_side(left, left_id, "a")
    b = explode_side(right, right_id, "b")
    pairs = (
        a.join(b, [*keys, "_b"])
        .where(
            (F.col("a_lo") < F.col("b_hi")) & (F.col("b_lo") < F.col("a_hi"))
        )
        .select(
            *keys,
            "a_id",
            "b_id",
            F.greatest("a_lo", "b_lo").alias("overlap_lo"),
            F.least("a_hi", "b_hi").alias("overlap_hi"),
        )
        .distinct()
    )
    return pairs.select(
        *keys,
        F.col("a_id").alias(left_id if left_id != right_id else "left_id"),
        F.col("b_id").alias(
            right_id if left_id != right_id else "right_id"
        ),
        "overlap_lo",
        "overlap_hi",
        (F.col("overlap_hi") - F.col("overlap_lo")).cast("long").alias("overlap_len"),
    )
