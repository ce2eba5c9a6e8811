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


# --- point-lookup pruning: per-file Bloom membership -----------------------
# Range envelopes can't skip equality lookups on high-cardinality unordered
# keys (every file's [min, max] spans the domain); the file-level Bloom
# filter can — the mechanism behind parquet's optional bloom_filter pages
# and Iceberg puffin blobs.  Positions use the house cross-engine hash so
# the whole decision replays in SQL, unlike functions/bloom.py whose
# engine-internal xxhash bitmap is a row-set prefilter, not a manifest.


def _positions(key, m_bits: int, k_hashes: int) -> list[Column]:
    from ..functions.textstats import md5_hash60

    key_s = key.cast("string") if isinstance(key, Column) else F.lit(str(key))
    return [
        F.pmod(md5_hash60(F.concat(key_s, F.lit(f":{j}"))), F.lit(m_bits))
        for j in range(k_hashes)
    ]


def file_bloom_stats(
    df: DataFrame,
    file_col: str,
    key_col: str,
    m_bits: int = 512,
    k_hashes: int = 3,
) -> DataFrame:
    """Per-file Bloom summary: ``bloom_bits`` = sorted distinct set bit
    positions of the file's keys (≤ min(k·distinct, m) ints — the sparse
    representation; at the default sizing a few hundred per file) plus
    ``n_rows``.  One explode + one partial-aggregated groupBy.

    ``n_rows`` counts ALL rows of the file (NULL keys included), matching
    ``file_stats`` so the range-pruning and point-lookup manifests report
    comparable row volumes; NULL keys contribute no bit positions (a
    NULL never matches an equality lookup)."""
    if m_bits < 8:
        raise ValueError("m_bits must be >= 8")
    if k_hashes < 1:
        raise ValueError("k_hashes must be >= 1")
    # NULL key -> empty position array -> explode_outer keeps one
    # NULL-_pos row so the file's row count survives; collect_set
    # ignores the NULL so the bit set is unchanged.
    pos_arr = F.when(
        F.col(key_col).isNotNull(),
        F.array(*_positions(F.col(key_col), m_bits, k_hashes)),
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        df.select(
            F.col(file_col).alias("file_id"),
            F.explode_outer(pos_arr).alias("_pos"),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.when(F.col("_pos").isNotNull(), 1)).alias("_nk"),
            F.count(F.when(F.col("_pos").isNull(), 1)).alias("_nn"),
            F.sort_array(F.collect_set("_pos")).alias("bloom_bits"),
        )
        .withColumn(
            "n_rows", (F.col("_nk") / k_hashes + F.col("_nn")).cast("long")
        )
        .drop("_nk", "_nn")
    )


def prune_point_lookups(
    stats: DataFrame, keys: list, m_bits: int = 512, k_hashes: int = 3
) -> DataFrame:
    """Mark each manifest row with the point-lookup verdict: ``must_read``
    iff SOME key has ALL its bit positions present in the file's Bloom
    summary (no false negatives; false positives read a file for
    nothing, never miss one).  Keys are literals — the lookup workload —
    so the check is a flat expression forest over |files| rows."""
    if not keys:
        raise ValueError("keys must be non-empty")
    per_key = [
        reduce(
            lambda a, b: a & b,
            [F.array_contains("bloom_bits", p) for p in _positions(k, m_bits, k_hashes)],
        )
        for k in keys
    ]
    return stats.withColumn("must_read", reduce(lambda a, b: a | b, per_key))


def bloom_positions_sql(key_expr: str, m_bits: int, k_hashes: int) -> list[str]:
    """The identical position computation as SQL strings (oracle twin)."""
    return [
        f"CAST(('0x' || substr(md5({key_expr} || ':{j}'), 1, 15)) AS BIGINT)"
        f" % {m_bits}"
        for j in range(k_hashes)
    ]
