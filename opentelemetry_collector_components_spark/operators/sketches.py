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
