"""KMV (k-minimum-values / bottom-k) distinct sketch with set algebra.

Beside HLL (``sketches.py``) the other classical mergeable distinct-count
sketch (Bar-Yossef et al., RANDOM 2002; the Theta sketch of the Apache
DataSketches library is its generalization): keep the ``k`` smallest
60-bit hashes of the values seen.  The k-th smallest hash measures how
densely the hash space is filled — ``est = (k-1) * 2^60 / h_(k)`` — and,
unlike HLL registers, the sketch IS a uniform sample of the distinct
values, so two sketches combine into DIRECT union / intersection /
Jaccard estimates: the k smallest of ``A ∪ B`` is itself a KMV sketch of
the union, and the fraction of it present in both input sketches is an
unbiased Jaccard estimate (Beyer et al., SIGMOD 2007).  That sidesteps
the error stacking of HLL inclusion-exclusion (``hll_overlap_users``'s
documented caveat) for audience-overlap / retention style questions.

Everything is exact integer arithmetic over the house cross-engine hash
(``textstats.md5_hash60``): estimates use a DECIMAL(38,0) product and a
truncating DIV, so every number replays bit-for-bit in a DuckDB oracle
(``HUGEINT`` product, ``//``) with no float boundary anywhere.

Scale shape: the corpus is touched once — build hashes the value column,
takes the per-group DISTINCT, and cuts to the k smallest via the shared
skew-proof ``partition.two_phase_top_n`` (never a per-group full sort on
one task); the resulting signature arrays are bounded by k, so merges and
set operations are pure JVM array expressions over |groups| rows —
``array_distinct(concat(...))`` on ≤2k elements, no explode, no second
shuffle.  At 100 TB the sketch table is the only thing that moves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import md5_hash60
from .partition import two_phase_top_n

_HASH_SPACE = 1 << 60  # md5_hash60 is uniform on [0, 2^60)


def kmv_build(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV signature: ``sig`` = sorted array of the ``k``
    smallest distinct 60-bit hashes of ``value_col`` (fewer when the
    group has fewer distinct values — then the sketch is exact).

    One distinct + one skew-proof top-N; output is |groups| rows with a
    ≤k-element array each.  NULL values are excluded (no identity to
    hash), matching COUNT(DISTINCT ...) semantics.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (the estimator uses h_(k))")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    hashed = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, md5_hash60(F.col(value_col).cast("string")).alias("_h"))
        .distinct()
    )
    return (
        two_phase_top_n(hashed, group_cols, ["_h"], k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("_h")).alias("sig"))
    )


def kmv_estimate(sig: str, k: int) -> Column:
    """Distinct-count estimate from the signature array column named
    ``sig``: exact size when the sketch never filled, else
    ``(k-1) * 2^60 DIV h_(k)`` — computed with a DECIMAL(38,0) product so
    the ~2^66 intermediate never overflows and the truncating DIV replays
    exactly in the oracle's HUGEINT ``//``."""
    s = F.col(sig)
    return F.when(F.size(s) < k, F.size(s).cast("long")).otherwise(
        F.expr(
            f"CAST((CAST({k - 1} AS DECIMAL(38,0)) * {_HASH_SPACE})"
            f" DIV element_at({sig}, {k}) AS BIGINT)"
        )
    )


def kmv_merge(df: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Merge partial sketches (rows carrying ``sig`` arrays) per group —
    the lossless KMV property: k smallest of the union of bottom-k sets
    == bottom-k of the union.  Arrays are ≤k each, so the merge is one
    partial-aggregated groupBy over |partials| rows; the slice back to k
    is a JVM array expression."""
    return (
        df.groupBy(*group_cols)
        .agg(F.flatten(F.collect_list("sig")).alias("_all"))
        .select(
            *group_cols,
            F.slice(F.array_sort(F.array_distinct("_all")), 1, k).alias("sig"),
        )
    )


def kmv_set_stats(
    a: DataFrame, b: DataFrame, join_cols: list[str], k: int
) -> DataFrame:
    """Union / intersection / Jaccard estimates from two signature tables
    (columns ``join_cols + [sig]``), joined per group.

    The combined sketch ``X`` = k smallest of ``distinct(sig_a ∪ sig_b)``
    is a valid KMV sketch of the set union; with ``m = |X|`` and ``c`` =
    members of X present in BOTH inputs:

    - ``union_est``     — KMV estimate over X (exact when m < k),
    - ``jaccard_micro`` — ``c * 1e6 DIV m`` (exact integer readout),
    - ``inter_est``     — ``c * union_est DIV m``.

    ``jaccard_micro`` stays far inside BIGINT (c ≤ k); ``inter_est``'s
    product can reach k * 2^60, so it runs through the same DECIMAL(38,0)
    product + truncating DIV as the estimator.  Groups present in only
    one input are dropped (inner join) — no overlap to measure.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (the estimator uses h_(k))")
    joined = a.select(*join_cols, F.col("sig").alias("_sa")).join(
        b.select(*join_cols, F.col("sig").alias("_sb")), on=join_cols, how="inner"
    )
    x = F.slice(F.array_sort(F.array_distinct(F.concat("_sa", "_sb"))), 1, k)
    out = joined.select(*join_cols, F.col("_sa"), F.col("_sb"), x.alias("_x"))
    m = F.size("_x")
    c = F.size(
        F.filter(
            "_x",
            lambda h: F.array_contains(F.col("_sa"), h)
            & F.array_contains(F.col("_sb"), h),
        )
    )
    union_est = F.when(m < k, m.cast("long")).otherwise(
        F.expr(
            f"CAST((CAST({k - 1} AS DECIMAL(38,0)) * {_HASH_SPACE})"
            f" DIV element_at(_x, {k}) AS BIGINT)"
        )
    )
    return (
        out.withColumn("union_est", union_est)
        .withColumn("sketch_size", m.cast("int"))
        .withColumn("inter_hits", c.cast("int"))
        .withColumn(
            "jaccard_micro",
            F.expr("CAST(inter_hits AS BIGINT) * 1000000 DIV sketch_size"),
        )
        .withColumn(
            "inter_est",
            F.expr(
                "CAST((CAST(inter_hits AS DECIMAL(38,0)) * union_est)"
                " DIV sketch_size AS BIGINT)"
            ),
        )
        .drop("_sa", "_sb", "_x")
    )
