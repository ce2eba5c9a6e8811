"""Hampel filter — rolling-median outlier detection and repair.

The standard pre-cleaning step for sensor-grade telemetry (Hampel
1974; Pearson 2005 popularized the moving-window form): each point is
compared to the MEDIAN of its ±k neighborhood, scaled by the window's
MAD — both robust to the very outliers being hunted, which is exactly
what the mean/stddev z-score gets wrong (one spike inflates the stddev
and masks itself).  Complements the repo's anomaly stack: ``anomaly``
MAD scores whole-series points against per-key global statistics;
``ewma`` tracks a causal smoothed level; Hampel is the LOCAL two-sided
window — right for de-spiking a series BEFORE a forecast fit
(``forecast``/``decompose``) or before training-data extraction.

Exact-integer semantics: the window median and MAD are LOWER medians
(element ⌈m/2⌉ of the sorted m values — no averaging of middle pairs,
so everything stays BIGINT and both engines agree bit for bit).  The
scale factor 1.4826 (MAD→σ for Gaussians) is folded into the caller's
threshold: ``z_milli`` defaults to 4448 = round(3·1.4826·1000), the
classic 3σ rule, and the flag test is the pure-integer
``|y − med|·1000 > z_milli·mad``.  A zero-MAD window (a majority of
identical values) flags any deviating point — the textbook behavior —
via the strict inequality.  Edge windows are truncated (fewer than
2k+1 rows) and still filter: the estimator degrades gracefully at
series boundaries rather than emitting NULLs.

Scale shape: per-key ROWS window over the (pre-aggregated) series —
collect_list is bounded by 2k+1 elements per row, sorted in the JVM
(sort_array/transform, no UDF); one pass, one shuffle on the key.
Window size is the caller's cost dial: k ≤ a few hundred keeps the
per-row work trivial.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _lower_median(arr: Column) -> Column:
    return F.element_at(arr, ((F.size(arr) + 1) / 2).cast("int"))


def hampel_filter(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    y_col: str,
    k: int = 3,
    z_milli: int = 4448,
) -> DataFrame:
    """(*key_cols, t, y, window_median, window_mad, is_outlier,
    y_repaired) — y_repaired replaces flagged points with the window
    median (the filter's output), passes everything else through."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if z_milli < 1:
        raise ValueError("z_milli must be >= 1")
    keys = list(key_cols)
    src = df.select(
        *keys,
        F.col(t_col).cast("long").alias("t"),
        F.col(y_col).cast("long").alias("y"),
    )
    w = Window.partitionBy(*keys).orderBy("t").rowsBetween(-k, k)
    arr = F.sort_array(F.collect_list("y").over(w))
    staged = src.withColumn("_med", _lower_median(arr)).withColumn(
        "_mad",
        _lower_median(
            F.sort_array(
                F.transform(arr, lambda v: F.abs(v - F.col("_med")))
            )
        ),
    )
    flagged = staged.withColumn(
        "is_outlier",
        F.abs(F.col("y") - F.col("_med")) * 1000 > z_milli * F.col("_mad"),
    )
    return flagged.select(
        *keys,
        "t",
        "y",
        F.col("_med").alias("window_median"),
        F.col("_mad").alias("window_mad"),
        "is_outlier",
        F.when(F.col("is_outlier"), F.col("_med"))
        .otherwise(F.col("y"))
        .alias("y_repaired"),
    )


def hampel_oracle_sql(
    series_sql: str,
    key_cols: list[str],
    t_col: str,
    y_col: str,
    k: int = 3,
    z_milli: int = 4448,
) -> str:
    """DuckDB replay: list window agg + the same lower-median picks."""
    kc = ", ".join(key_cols)
    over = (
        f"OVER (PARTITION BY {kc} ORDER BY t "
        f"ROWS BETWEEN {k} PRECEDING AND {k} FOLLOWING)"
    )
    return f"""
    WITH src AS (
        SELECT {kc}, CAST({t_col} AS BIGINT) AS t,
               CAST({y_col} AS BIGINT) AS y
        FROM ({series_sql}) s0
    ), windows AS (
        SELECT *, list_sort(list(y) {over}) AS arr FROM src
    ), med AS (
        SELECT *, arr[CAST((len(arr) + 1) // 2 AS INT)] AS window_median
        FROM windows
    ), mad AS (
        SELECT *, list_sort(list_transform(arr, v -> abs(v - window_median)))
                      [CAST((len(arr) + 1) // 2 AS INT)] AS window_mad
        FROM med
    )
    SELECT {kc}, t, y, window_median, window_mad,
           abs(y - window_median) * 1000 > {z_milli} * window_mad
               AS is_outlier,
           CASE WHEN abs(y - window_median) * 1000 > {z_milli} * window_mad
                THEN window_median ELSE y END AS y_repaired
    FROM mad
    """
