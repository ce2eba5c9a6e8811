"""Zone-map file skipping: min/max scan pruning and layout effectiveness.

At 100 TB the fastest tuple is the one never read.  Engines prune file
scans from per-file column min/max statistics ("zone maps"): a file whose
``[min, max]`` envelope is disjoint from a predicate's range cannot
contain a matching row and is skipped without opening it — the mechanism
behind parquet row-group stats, Iceberg manifest column summaries
(``sources/iceberg_meta.py`` parses the real ones), and Delta file stats.
This module makes the planner itself a first-class, testable operator:

- ``file_stats`` — build the zone map from data + a file-id column: one
  partial-aggregated groupBy emitting |files| rows.  In production the
  stats come free from footers/manifests (``parquet_footer_meta``,
  ``iceberg_snapshot_files``); building them from rows is how layout
  experiments and backfill audits work.
- ``prune_scan`` — the pruning decision: a file must be read iff EVERY
  conjunct's range overlaps that file's envelope.  A NULL envelope (the
  file is all-NULL in that column) is skippable — no NULL satisfies a
  range predicate.  Pure projection over the manifest: planner cost is
  O(|files|), independent of data size — the entire point.
- ``scan_summary`` — files/rows read vs skipped per decision, the number
  a layout change must move.

The companion gate pair demonstrates WHY ``layout.zorder_key`` exists:
the same rows filed by arrival time answer a user-range predicate by
reading everything, while z-order-prefix files skip most of the corpus —
measured, not asserted, and fully SQL-replayable (decisions are integer
comparisons over integer envelopes).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (col, lo, hi): closed interval conjunct `col BETWEEN lo AND hi`
Predicate = tuple[str, int, int]


def file_stats(df: DataFrame, file_col: str, stat_cols: list[str]) -> DataFrame:
    """Per-file zone map: ``n_rows`` + ``<col>_min`` / ``<col>_max`` per
    stat column.  One map-side-combined groupBy; output is |files| rows
    (the manifest scale, never the corpus scale)."""
    if not stat_cols:
        raise ValueError("stat_cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.groupBy(F.col(file_col).alias("file_id")).agg(*aggs)


def prune_scan(stats: DataFrame, predicates: list[Predicate]) -> DataFrame:
    """Mark each manifest row with the pruning decision for a conjunctive
    range workload: ``must_read`` = every predicate's ``[lo, hi]``
    overlaps the file's ``[min, max]``; files all-NULL in a predicate
    column are skippable (range predicates never match NULL).  Adds
    nothing but the flag — callers chain ``.where("must_read")`` in front
    of the actual scan, or aggregate with ``scan_summary``."""
    if not predicates:
        raise ValueError("predicates must be non-empty")
    conjuncts: list[Column] = []
    for col, lo, hi in predicates:
        if lo > hi:
            raise ValueError(f"empty predicate range for {col}: [{lo}, {hi}]")
        mn, mx = F.col(f"{col}_min"), F.col(f"{col}_max")
        conjuncts.append(mn.isNotNull() & (mx >= F.lit(lo)) & (mn <= F.lit(hi)))
    return stats.withColumn(
        "must_read", reduce(lambda a, b: a & b, conjuncts)
    )


def scan_summary(pruned: DataFrame, label: str | None = None) -> DataFrame:
    """Collapse a pruned manifest to the planner readout: total/read/
    skipped file counts and the row volumes behind them.  ``label`` tags
    the row so layout variants union into one comparison table."""
    out = pruned.agg(
        F.count(F.lit(1)).cast("int").alias("files_total"),
        F.sum(F.col("must_read").cast("int")).cast("int").alias("files_read"),
        F.sum(F.when(F.col("must_read"), F.col("n_rows")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_read"),
        F.sum("n_rows").cast("long").alias("rows_total"),
    )
    if label is not None:
        out = out.select(F.lit(label).alias("layout"), "*")
    return out
