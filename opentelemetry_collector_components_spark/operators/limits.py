"""Hierarchical cardinality limits with overflow buckets (A7 full form).

Reproduces the lsmintervalprocessor's chained resource -> scope -> metric ->
datapoint trackers (internal/merger/limits/tracker.go:40-166, value.go:
308-366, 460-560):

- Each level keeps the FIRST ``limit`` distinct identities; later identities
  route to ONE overflow bucket per parent (resource/scope levels — the data
  is retained under the overflow identity) or are dropped and only counted
  (metric/datapoint levels).
- Children of an overflowed parent are tracked under the overflow parent's
  identity, so e.g. scopes of two overflowed resources share one scope
  tracker — the chained part.
- At harvest, each scope with metric overflow gains a ``_overflow_metric``
  row and each kept metric with datapoint overflow gains a
  ``_overflow_datapoints`` row carrying the distinct-overflowed-identity
  count (value.go:330-360).

Determinism divergence (documented): the reference's "first N" follows LSM
merge arrival order; a distributed engine has no single arrival order, so
"first" here is min(``seq_col``) per identity (ties broken by identity) —
callers supply the ordering column (ingest offset, event time, ...).  The
reference estimates overflow with HyperLogLog-14 (exact below ~16k
distinct); this implementation counts exactly via ``count_distinct`` by
default, with ``approximate=True`` switching to Spark's HLL++
``approx_count_distinct`` for 100 TB-scale harvests.

Scale notes: identity tables are distinct-aggregates (bounded by series
cardinality, orders of magnitude below row count).  Scope/metric/datapoint
ranks are TWO-PHASE per-parent top-Ns (local rank within a physical
partition, final rank over <= partitions x limit survivors) because the
chained design concentrates every overflowed parent's children under one
synthetic "_overflow" parent — a plain parent-keyed window would sort that
hot parent's entire identity set on one task.
The resource level has no parent, and a bare ``Window.orderBy`` would sort
EVERY distinct resource identity on one task (at 10^7-10^8 identities, a
single-task straggler); instead the kept set is defined by a THRESHOLD —
the limit-th smallest (min_seq, id) pair — computed with Spark's
distributed top-N (``orderBy().limit()`` -> TakeOrderedAndProject, a
per-partition heap + tiny driver merge) and broadcast back as one row.
No unpartitioned WindowExec appears anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OVERFLOW_METRIC_NAME = "_overflow_metric"  # value.go:37
OVERFLOW_DATAPOINT_METRIC_NAME = "_overflow_datapoints"  # value.go:40


def _rank_level(
    df: DataFrame,
    parent_cols: list[str],
    id_col: str,
    seq_col: str,
    limit: int | None,
) -> DataFrame:
    """First-N rank of distinct ``id_col`` per parent: returns the identity
    table (parent_cols + id_col + _kept)."""
    firsts = df.groupBy(*parent_cols, id_col).agg(F.min(seq_col).alias("_s0"))
    if limit is None:
        return firsts.select(*parent_cols, id_col, F.lit(True).alias("_kept"))
    if parent_cols:
        # Skew-proof per-parent first-N (operators.partition.two_phase_top_n):
        # the chained design routes every overflowed parent's children under
        # ONE synthetic "_overflow" parent, so a plain parent-keyed window
        # would sort that hot parent's entire identity set on one task.
        from .partition import two_phase_top_n

        kept = two_phase_top_n(firsts, parent_cols, ["_s0", id_col], limit).select(
            *parent_cols, id_col, F.lit(True).alias("_kept")
        )
        # null-SAFE join-back: a NULL identity is a legal tracked value (the
        # window form ranked it); a plain equi-join would never match it,
        # silently marking it overflow and under-filling the parent's limit
        return _nullsafe_join(
            firsts.select(*parent_cols, id_col), kept, [*parent_cols, id_col], "left"
        ).select(
            *parent_cols,
            id_col,
            F.coalesce("_kept", F.lit(False)).alias("_kept"),
        )
    # Parent-less level: avoid the global unpartitioned window (single-task
    # sort over every distinct identity).  (_s0, id) is a strict total order
    # (id is the groupBy key), so "first N" == "(_s0, id) <= the limit-th
    # smallest pair".  orderBy().limit() compiles to TakeOrderedAndProject —
    # a distributed per-partition top-N heap — and the threshold is ONE row,
    # broadcast-cross-joined back onto the identity table.  Fewer identities
    # than the limit -> threshold = global max -> everything kept.
    pair = F.struct(F.col("_s0"), F.col(id_col).alias("_i"))
    thr = (
        firsts.orderBy("_s0", id_col)
        .limit(limit)
        .agg(F.max(pair).alias("_thr"))
    )
    # coalesce: limit=0 (deny-all) leaves the threshold NULL, and NULL
    # comparisons must read as not-kept, not as a nullable boolean
    return firsts.crossJoin(F.broadcast(thr)).select(
        id_col,
        F.coalesce(pair <= F.col("_thr"), F.lit(False)).alias("_kept"),
    )


def _nullsafe_join(left: DataFrame, right: DataFrame, cols: list[str], how: str = "inner") -> DataFrame:
    """Join on identity columns with NULL-safe equality: a NULL identity is
    a legal tracked value and must match its own rank row, not fall out of
    an equi-join (which would silently reroute it to overflow)."""
    renamed = right.select(
        *[F.col(c).alias(f"_r_{c}") for c in right.columns]
    )
    cond = None
    for c in cols:
        eq = left[c].eqNullSafe(renamed[f"_r_{c}"])
        cond = eq if cond is None else cond & eq
    out = left.join(renamed, cond, how)
    for c in right.columns:
        out = out.drop(f"_r_{c}") if c in cols else out.withColumnRenamed(f"_r_{c}", c)
    return out


def hierarchical_overflow_limits(
    df: DataFrame,
    seq_col: str = "seq",
    res_col: str = "resource_id",
    scope_col: str = "scope_id",
    metric_col: str = "metric_name",
    dp_col: str = "dp_id",
    res_limit: int | None = None,
    scope_limit: int | None = None,
    metric_limit: int | None = None,
    dp_limit: int | None = None,
    overflow_marker: str = "_overflow",
) -> DataFrame:
    """Annotates datapoint rows with post-limit effective identities.

    Adds: ``res_eff``/``scope_eff`` (original id, or ``overflow_marker`` once
    the parent's limit is breached — data retained under the bucket), and
    ``metric_overflowed``/``dp_overflowed`` booleans (reference drops these
    rows from the merged output and only counts them; filtering is left to
    the caller so the harvest can count the same frame)."""
    res_ids = _rank_level(df, [], res_col, seq_col, res_limit)
    res_eff = F.when(F.col("_kept"), F.col(res_col)).otherwise(F.lit(overflow_marker))
    out = _nullsafe_join(df, res_ids, [res_col]).withColumn("res_eff", res_eff).drop("_kept")

    scope_ids = _rank_level(out, ["res_eff"], scope_col, seq_col, scope_limit)
    scope_eff = F.when(F.col("_kept"), F.col(scope_col)).otherwise(F.lit(overflow_marker))
    out = (
        _nullsafe_join(out, scope_ids, ["res_eff", scope_col])
        .withColumn("scope_eff", scope_eff)
        .drop("_kept")
    )

    metric_ids = _rank_level(out, ["res_eff", "scope_eff"], metric_col, seq_col, metric_limit)
    out = (
        _nullsafe_join(out, metric_ids, ["res_eff", "scope_eff", metric_col])
        .withColumn("metric_overflowed", ~F.col("_kept"))
        .drop("_kept")
    )

    # datapoint identities are only tracked inside kept metrics — on metric
    # overflow the reference discards the datapoint estimator (value.go:248-251)
    kept = out.filter(~F.col("metric_overflowed"))
    dp_ids = _rank_level(kept, ["res_eff", "scope_eff", metric_col], dp_col, seq_col, dp_limit)
    out = (
        _nullsafe_join(
            out,
            dp_ids.withColumnRenamed("_kept", "_dp_kept"),
            ["res_eff", "scope_eff", metric_col, dp_col],
            "left",
        )
        .withColumn(
            "dp_overflowed",
            F.when(F.col("metric_overflowed"), F.lit(False)).otherwise(
                ~F.coalesce(F.col("_dp_kept"), F.lit(True))
            ),
        )
        .drop("_dp_kept")
    )
    return out


def harvest_overflow_metrics(
    annotated: DataFrame,
    metric_col: str = "metric_name",
    dp_col: str = "dp_id",
    approximate: bool = False,
) -> DataFrame:
    """Overflow harvest rows (value.go:308-366): one ``_overflow_metric`` per
    scope with metric overflow, one ``_overflow_datapoints`` per kept metric
    with datapoint overflow; value = distinct overflowed identities."""
    cd = F.approx_count_distinct if approximate else F.count_distinct

    metric_rows = (
        annotated.filter(F.col("metric_overflowed"))
        .groupBy("res_eff", "scope_eff")
        .agg(cd(F.col(metric_col)).alias("value"))
        .select(
            "res_eff",
            "scope_eff",
            F.lit(OVERFLOW_METRIC_NAME).alias(metric_col),
            F.lit(None).cast("string").alias("for_metric"),
            F.col("value").cast("long").alias("value"),
        )
    )
    dp_rows = (
        annotated.filter(F.col("dp_overflowed"))
        .groupBy("res_eff", "scope_eff", metric_col)
        .agg(cd(F.col(dp_col)).alias("value"))
        .select(
            "res_eff",
            "scope_eff",
            F.lit(OVERFLOW_DATAPOINT_METRIC_NAME).alias("_name"),
            F.col(metric_col).alias("for_metric"),
            F.col("value").cast("long").alias("value"),
        )
        .withColumnRenamed("_name", metric_col)
    )
    return metric_rows.unionByName(dp_rows)


def resource_scope_overflow_estimates(
    annotated: DataFrame,
    res_col: str = "resource_id",
    scope_col: str = "scope_id",
    overflow_marker: str = "_overflow",
    approximate: bool = False,
) -> DataFrame:
    """OverflowStats for the two retained levels (value.go:106-112,319-326):
    distinct resource identities folded into the resource overflow bucket,
    and per-resource distinct scope identities folded into scope buckets."""
    cd = F.approx_count_distinct if approximate else F.count_distinct
    res = (
        annotated.filter(F.col("res_eff") == overflow_marker)
        .agg(cd(F.col(res_col)).alias("value"))
        .select(F.lit("resources").alias("level"), F.col("value").cast("long"))
    )
    scope = (
        annotated.filter(F.col("scope_eff") == overflow_marker)
        .agg(cd(F.concat_ws("\x01", F.col("res_eff"), F.col(scope_col))).alias("value"))
        .select(F.lit("scopes").alias("level"), F.col("value").cast("long"))
    )
    return res.unionByName(scope)
