"""Anomaly detection over aggregated metric series: robust MAD scoring and
CUSUM changepoint detection.

The pipeline's aggregation stages (``operators/aggregate.py``,
``operators/alerts.py``) end at (key, window, value) metric tables; the two
detectors every monitoring deployment runs on those tables are a robust
outlier score (median/MAD — immune to the outliers it is hunting, unlike
mean/stddev) and a sequential drift detector (CUSUM — catches small
persistent shifts a per-point threshold misses).  Both are re-expressed as
pure window chains over integer counts so batch, streaming-foreachBatch,
and the DuckDB oracle agree bit-for-bit.

Scale shape: both operators partition by the rule key and sort by the
window index — ONE shuffle, per-key groups bounded by the number of
evaluation windows (the input is the aggregated table, never corpus rows).
``mad_anomaly`` stacks two ordered ranks on the same partitioning (value
rank, then residual rank), which Spark executes as one exchange + two
sorts.  No self-joins, no driver collection, no Python in the data path.

CUSUM's recursion ``S_i = max(0, S_{i-1} + x_i)`` is not a windowable
expression as written, but it has a closed form over prefix sums:
``S_i = P_i - min(0, min_{j<=i} P_j)`` with ``P`` the running sum of
``x`` — two stacked window aggregates (public identity, used in
sequential-analysis texts for the Page test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def mad_anomaly(
    df: DataFrame,
    key_cols: list[str],
    window_col: str,
    value_col: str,
    threshold_num: int = 7,
    threshold_den: int = 2,
) -> DataFrame:
    """Flag windows whose |value - median| exceeds (num/den) x MAD per key.

    Median and MAD use the *lower-median* rule (k-th smallest,
    k = (n+1) div 2) so every quantity stays an exact integer for integer
    inputs — the anomaly comparison ``|v - med| * den > num * mad`` never
    touches a double.  The default 7/2 is the classic 3.5-MAD rule.  When
    a key's MAD is 0 (over half its windows share one value), ANY
    deviation from the median is flagged — the standard degenerate-MAD
    convention, documented rather than hidden.

    Adds ``med``, ``mad``, ``abs_dev``, ``is_anomaly``.  Ties in the value
    rank break on ``window_col`` for determinism.  NULL values are
    excluded from the median/MAD computation (they would otherwise shift
    the rank the median pick lands on) and come back with
    ``is_anomaly = NULL`` — unscorable, not silently normal or anomalous.
    """
    if threshold_num < 0 or threshold_den < 1:
        raise ValueError("threshold must be a non-negative num/den ratio")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")

    v = F.col(value_col)
    wk = Window.partitionBy(*key_cols)
    # count(v) skips NULLs; NULLS LAST in the rank ordering keeps ranks
    # 1..n_valid on the scorable rows, so the mid pick never lands on (or
    # is displaced by) a NULL-value row
    mid = F.floor((F.count(v).over(wk) + F.lit(1)) / F.lit(2))

    rank_v = F.row_number().over(
        wk.orderBy(v.asc_nulls_last(), F.col(window_col))
    )
    out = df.withColumn("_med_pick", F.when(rank_v == mid, v))
    out = out.withColumn("med", F.max("_med_pick").over(wk))

    dev = F.abs(v - F.col("med"))
    rank_d = F.row_number().over(
        wk.orderBy(dev.asc_nulls_last(), F.col(window_col))
    )
    out = (
        out.withColumn("abs_dev", dev)
        .withColumn("_mad_pick", F.when(rank_d == mid, dev))
        .withColumn("mad", F.max("_mad_pick").over(wk))
        .drop("_med_pick", "_mad_pick")
    )
    return out.withColumn(
        "is_anomaly",
        F.when(
            v.isNotNull(),
            F.col("abs_dev") * F.lit(threshold_den)
            > F.lit(threshold_num) * F.col("mad"),
        ),
    )


def cusum_changepoints(
    df: DataFrame,
    key_cols: list[str],
    window_col: str,
    value_col: str,
    target: int,
    slack: int,
    h: int,
) -> DataFrame:
    """Two-sided CUSUM (Page test) per key over an integer metric series.

    ``target`` is the in-control level, ``slack`` the allowance k (drift
    smaller than ``slack`` per window is ignored), ``h`` the decision
    threshold.  High side accumulates ``max(0, S + (v - target - slack))``
    — closed form over prefix sums, see module docstring — and the low
    side mirrors it for downward shifts.  Adds ``s_high``, ``s_low``
    (exact BIGINT statistics) and ``alarm_high`` / ``alarm_low``
    (statistic >= h).

    This is the no-reset form: after a genuine shift the statistic stays
    elevated (every subsequent window alarms) rather than re-arming —
    the right shape for batch audit; a streaming deployment resets by
    filtering to the first alarm per island, exactly the
    ``alerts.alert_for_duration`` transition pattern.
    """
    if h <= 0:
        raise ValueError("h must be positive")
    if slack < 0:
        raise ValueError("slack must be non-negative")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")

    w = Window.partitionBy(*key_cols).orderBy(window_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    v = F.col(value_col).cast("long")

    # prefix sums land as real columns first: Spark (correctly) rejects a
    # window aggregate nested inside another window aggregate, and both
    # layers share the one exchange+sort anyway.
    staged = df.withColumn(
        "_p_hi", F.sum(v - F.lit(target) - F.lit(slack)).over(run)
    ).withColumn("_p_lo", F.sum(v - F.lit(target) + F.lit(slack)).over(run))
    s_hi = F.col("_p_hi") - F.least(
        F.lit(0).cast("long"), F.min("_p_hi").over(run)
    )
    s_lo = F.greatest(F.lit(0).cast("long"), F.max("_p_lo").over(run)) - F.col(
        "_p_lo"
    )

    return (
        staged.withColumn("s_high", s_hi.cast("long"))
        .withColumn("s_low", s_lo.cast("long"))
        .withColumn("alarm_high", F.col("s_high") >= F.lit(h))
        .withColumn("alarm_low", F.col("s_low") >= F.lit(h))
        .drop("_p_hi", "_p_lo")
    )


def changepoint_locate(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Retrospective single change-point LOCALIZATION per key — the
    "where did the level shift" answer to ``cusum_changepoints``'s
    online "is it shifting now" alarm (Page's test detects; this one
    places).  The estimator is the max-|CUSUM|-of-deviations point
    (Taylor's cumulative-sum change analysis; the first step of binary
    segmentation): with 1-indexed position t, prefix sum S(t), series
    length n and total S,

        C(t) = sum_{i<=t}(x_i - mean) scaled by n  =  n*S(t) - t*S

    is pure BIGINT, and t* = argmax_{t<n} |C(t)| (earliest t on ties —
    a deterministic total order both engines share).  A constant series
    yields c_max = 0 at t* = 1; a single-point series has no valid
    split and emits NO row for that key (callers treat absence as "no
    split exists", the drift family's empty-histogram contract).

    Output per key: (*key_cols, split_at = order_col value of the LAST
    point in the left segment, split_idx, c_max BIGINT, mean_before,
    mean_after, shift DOUBLE 4dp — the doubles derived from the exact
    integer sums for presentation).

    Scale shape: every window is key-partitioned (one exchange + one
    sort, shared by rank/prefix/total frames); nothing unpartitioned.
    Overflow: n*S must stay under 9.2e18 — e.g. 1e6-point per-key
    series with values summing to 1e12.  Significance is the caller's
    job: pair with ``bootstrap.py`` resampling when a confidence level
    is needed; c_max alone ranks keys by shift evidence.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    v = F.col(value_col).cast("long")
    staged = (
        df.withColumn("_t", F.row_number().over(w).cast("long"))
        .withColumn("_st", F.sum(v).over(run))
        .withColumn("_n", F.count(F.lit(1)).over(full))
        .withColumn("_s", F.sum(v).over(full))
    )
    cand = staged.where(F.col("_t") < F.col("_n")).withColumn(
        "_c", F.col("_n") * F.col("_st") - F.col("_t") * F.col("_s")
    )
    pick = Window.partitionBy(*key_cols).orderBy(
        F.abs(F.col("_c")).desc(), F.col("_t").asc()
    )
    mean_before = F.col("_st") / F.col("_t")
    mean_after = (F.col("_s") - F.col("_st")) / (F.col("_n") - F.col("_t"))
    return (
        cand.withColumn("_rk", F.row_number().over(pick))
        .where(F.col("_rk") == 1)
        .select(
            *key_cols,
            F.col(order_col).alias("split_at"),
            F.col("_t").alias("split_idx"),
            F.abs(F.col("_c")).cast("long").alias("c_max"),
            F.round(mean_before, 4).alias("mean_before"),
            F.round(mean_after, 4).alias("mean_after"),
            F.round(mean_after - mean_before, 4).alias("shift"),
        )
    )


def seasonal_hour_anomaly(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    threshold_pct: int = 300,
) -> DataFrame:
    """Seasonality-aware volume anomalies: each (key, hour) bucket is
    compared against the MEDIAN of the SAME hour-of-day's history for
    that key — Tuesday 3 AM is judged against other 3 AMs, not against
    the daily mean, so ordinary diurnal swings stop tripping the global
    detectors above (MAD scores a flat series; CUSUM finds level shifts;
    neither knows the clock).

    Returns one row per (key, hour bucket): ``hour_ts``, ``n`` (that
    hour's row count), ``hod`` (0-23), ``baseline_x2`` (2x the exact
    median of the key's same-hour counts — doubling keeps the .5-step
    median integral), and ``anomalous`` = ``200·n > threshold_pct ·
    baseline_x2`` (n > threshold_pct% of baseline, exact-integer
    compare; default 300 % = triple the usual hour).

    Scale shape: two grouped aggregates (hourly counts — map-side
    combined; per-(key, hod) exact median over ≤ days-of-history values
    per group).  The baseline join back is on (key, hod) — 24·|keys|
    rows, broadcastable.  The baseline includes the scored hour itself
    (self-exclusion would need per-row leave-one-out medians; with weeks
    of history one hour cannot move its own median materially, and
    inclusion keeps the oracle a pure two-aggregate replay).
    """
    if threshold_pct < 1:
        raise ValueError("threshold_pct must be >= 1")
    sec = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    hourly = (
        df.select(*key_cols, (F.floor(sec / 3600) * 3600).alias("_hour_s"))
        .groupBy(*key_cols, "_hour_s")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("hod", F.pmod(F.floor(F.col("_hour_s") / 3600), F.lit(24)).cast("int"))
    )
    baseline = hourly.groupBy(*key_cols, "hod").agg(
        (F.median("n") * 2).cast("long").alias("baseline_x2")
    )
    return (
        hourly.join(F.broadcast(baseline), [*key_cols, "hod"])
        .select(
            *key_cols,
            F.timestamp_seconds(F.col("_hour_s")).alias("hour_ts"),
            "hod",
            "n",
            "baseline_x2",
            (
                F.col("n") * 200 > F.lit(threshold_pct) * F.col("baseline_x2")
            ).alias("anomalous"),
        )
    )
