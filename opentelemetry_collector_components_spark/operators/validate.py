"""Data-quality expectation audit: named row predicates -> one violation
report row per rule, computed in a single fused scan.

A 100 TB ingest without an expectations gate ships silent corruption into
every downstream table; the dbt-tests / Great-Expectations shape — a list
of named boolean rules, each with a violation count and rate — is the
standard contract.  Re-expressed Spark-first: every rule compiles to a
``sum((NOT rule)::int)`` aggregate in ONE ungrouped aggregation, so the
whole audit costs a single pass over the scan with map-side partial
aggregation and a one-row shuffle, regardless of how many rules run; the
per-rule rows come from exploding a literal-built struct array of the
aggregate results (rows = rules, driver never sees the data).

Rules are row predicates (not-null, range, set membership, regex,
cross-column comparisons).  Uniqueness is deliberately NOT a rule here —
it needs a groupBy on the candidate key, a different (and far more
expensive) plan; use ``operators/dedup.py::exact_dedup`` /
``dedup_exact_incremental`` for identity audits.

A NULL predicate result counts as a violation: an expectation that cannot
be evaluated on a row has not been met by it (SQL three-valued logic would
otherwise let NULLs slip through every range rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Audit ``df`` against named boolean rules.

    Returns one row per rule: ``(rule, n_rows, n_violations,
    violation_ppm)`` with the rate as exact parts-per-million
    (``n_violations * 1_000_000 // n_rows``, 0 for an empty input) so the
    report is engine-exact integer arithmetic end to end.  Rule order in
    the output follows the sorted rule names.
    """
    if not rules:
        raise ValueError("rules must be a non-empty {name: boolean Column} dict")

    names = sorted(rules)
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, name in enumerate(names):
        holds = F.coalesce(rules[name], F.lit(False))
        aggs.append(F.sum((~holds).cast("long")).alias(f"_v{i}"))
    totals = df.agg(*aggs)

    report = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("_n").alias("n_rows"),
                F.coalesce(F.col(f"_v{i}"), F.lit(0).cast("long")).alias(
                    "n_violations"
                ),
            )
            for i, name in enumerate(names)
        ]
    )
    return (
        totals.select(F.explode(report).alias("r"))
        .select("r.rule", "r.n_rows", "r.n_violations")
        .withColumn(
            # BIGINT `div`, not double `/`+floor: at 10^12 rows the
            # numerator passes 2^53 and double division stops being exact
            "violation_ppm",
            F.expr("n_violations * 1000000L div greatest(n_rows, 1L)").cast("long"),
        )
    )


def detect_interval_gaps(
    present: DataFrame,
    key_cols: list[str],
    ts_col: str,
    interval_s: int,
) -> DataFrame:
    """Missing time partitions per key — the backfill planner's input.

    A late-arriving or failed ingest leaves holes in an interval-
    partitioned table that downstream rollups silently absorb as zeros;
    this audits the manifest instead: for every key, the expected
    interval grid spans that key's own [min, max] timestamps, and any
    grid slot with no row is a gap.  Returns
    ``(key..., gap_start TIMESTAMP)`` — empty means dense.

    Scale shape: one aggregate collapses the table to |keys| (min, max)
    rows; the grid explodes dim-side from those bounds
    (``sequence()``, bounded by span/interval slots per key); the
    anti-join back runs against the DISTINCT (key, slot) projection,
    not raw rows.  No window, no collect.
    """
    if interval_s < 1:
        raise ValueError("interval_s must be >= 1")
    slot = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / interval_s).cast("long")
        * interval_s
    )
    slots = present.select(*key_cols, slot.alias("_slot")).distinct()
    bounds = slots.groupBy(*key_cols).agg(
        F.min("_slot").alias("_lo"), F.max("_slot").alias("_hi")
    )
    expected = bounds.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(interval_s))
        ).alias("_slot"),
    )
    return (
        expected.join(slots, [*key_cols, "_slot"], "left_anti")
        .select(
            *key_cols,
            F.timestamp_seconds(F.col("_slot")).alias("gap_start"),
        )
    )


def fd_violations(
    df: DataFrame,
    lhs_cols: list[str],
    rhs_col: str,
) -> DataFrame:
    """Functional-dependency audit: keys where ``lhs -> rhs`` is
    VIOLATED — the schema-assumption check behind joins and dedup
    ("one tier per customer", "one charset per url", "one owner per
    service").  A violated FD upstream is how a downstream equi-join
    silently fans out.

    One row per violating LHS key: distinct RHS count, total rows, the
    lexicographic min/max conflicting RHS values (two concrete
    witnesses for the bug report, deterministic — no arbitrary
    ``first()``), and ``rhs_has_null`` — min/max skip NULL, so without
    the flag a {NULL, 'w'} conflict would report two identical 'w'
    witnesses and hide the NULL mapping.  Empty result == the
    dependency holds.

    Scale shape: one partial-aggregated groupBy on (lhs, rhs), one on
    lhs — bounded by key cardinality; no distinct-count expression on
    raw rows (the (lhs, rhs) pre-aggregate makes COUNT(*) the distinct
    count).  NULL RHS counts as a value (a key mapping to both NULL
    and a value IS two mappings — eqNullSafe semantics).
    """
    if not lhs_cols:
        raise ValueError("lhs_cols must be non-empty")
    pairs = df.groupBy(
        *lhs_cols, F.col(rhs_col).alias("__rhs")
    ).agg(F.count(F.lit(1)).alias("__n"))
    return (
        pairs.groupBy(*lhs_cols)
        .agg(
            F.count(F.lit(1)).alias("distinct_rhs"),
            F.sum("__n").alias("n_rows"),
            F.min("__rhs").alias("rhs_min"),
            F.max("__rhs").alias("rhs_max"),
            F.max(F.col("__rhs").isNull().cast("int"))
            .cast("int")
            .alias("rhs_has_null"),
        )
        .where(F.col("distinct_rhs") > 1)
    )
