"""Classical seasonal decomposition — MA trend, phase means, remainder.

The classical additive decomposition (Persons 1919 lineage; the
``decompose()`` every stats package ships and STL's baseline): split a
per-key series into

    y_t = trend_t + seasonal_(t mod p) + remainder_t

with trend the centered moving average over one period, seasonal the
per-phase mean of the detrended series re-centered to sum ~0, and
remainder what's left.  The repo's forecasting operators (Holt,
Holt-Winters) PREDICT; this one EXPLAINS — the readout a capacity
review wants ("how much of Monday's peak is seasonal vs trend vs
noise") and the preprocessing an anomaly monitor runs before
thresholding residuals (``ewma`` / MAD over remainder instead of raw).

Exact-integer arithmetic (micro units, truncating division — both
engines truncate toward zero):

- even period p (hour-of-day 24, the common case): the standard 2×p
  MA with half end-weights, doubled to stay integral —
  ``trend = ((y_{t−h} + y_{t+h} + 2·Σ_{|i|<h} y_{t+i})·1e6) div 2p``,
  h = p/2, window of p+1 rows;
- odd p: the plain p-point MA, window of p rows... also expressible —
  kept even-only here (ROWS frame must be symmetric around t; odd p
  has no center offset issue either, frame h=(p−1)/2, divisor p).

Trend is NULL where the window is incomplete (series edges) or the
grid has a gap — detected exactly: the frame must hold the full row
count AND span exactly its nominal width in t (run
``resample.fill_intervals`` upstream to densify instead of silently
averaging across a hole).  Seasonal means use only rows with defined
trend; the per-phase mean and the re-centering offset are truncating
integer divisions, mirrored in the oracle.

Scale shape: one groupBy to the per-(key, t) series (caller usually
arrives pre-aggregated), one ROWS window per key on that bounded
table, one groupBy(key, phase) for seasonal, one broadcast-size join
back.  Nothing touches raw event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def seasonal_decompose(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    y_col: str,
    period: int,
) -> DataFrame:
    """(*key_cols, t, y, phase, trend_micro, seasonal_micro,
    remainder_micro) — additive classical decomposition on an integer
    time grid.  seasonal_micro is phase-constant per key; trend and
    remainder are NULL at edges/gaps."""
    if period < 2:
        raise ValueError("period must be >= 2")
    keys = list(key_cols)
    even = period % 2 == 0
    h = period // 2 if even else (period - 1) // 2
    frame_rows = period + 1 if even else period
    divisor = 2 * period if even else period

    src = df.select(
        *keys,
        F.col(t_col).cast("long").alias("t"),
        F.col(y_col).cast("long").alias("y"),
    )
    w = Window.partitionBy(*keys).orderBy("t").rowsBetween(-h, h)
    if even:
        # doubled sum with half end-weights: ends once, interior twice
        doubled = (
            2 * F.sum("y").over(w)
            - F.first("y").over(w)
            - F.last("y").over(w)
        )
    else:
        doubled = F.sum("y").over(w)
    complete = (F.count("y").over(w) == frame_rows) & (
        F.max("t").over(w) - F.min("t").over(w) == frame_rows - 1
    )
    trended = src.withColumn(
        "_num", F.when(complete, doubled * MICRO)
    ).withColumn(
        "trend_micro", F.expr(f"_num div {divisor}")
    ).withColumn(
        "phase", F.expr(f"t % {period}")
    )
    detr = trended.withColumn(
        "_det", F.col("y") * MICRO - F.col("trend_micro")
    )
    seasonal_raw = (
        detr.where(F.col("_det").isNotNull())
        .groupBy(*keys, "phase")
        .agg(
            F.sum("_det").alias("_ds"),
            F.count(F.lit(1)).alias("_dn"),
        )
        .withColumn("_s_raw", F.expr("_ds div _dn"))
    )
    # re-center: subtract the truncating mean of the phase means per key
    centering = seasonal_raw.groupBy(*keys).agg(
        F.expr("SUM(_s_raw) div COUNT(*)").alias("_c")
    )
    seasonal = seasonal_raw.join(centering, keys, "inner").select(
        *keys,
        "phase",
        (F.col("_s_raw") - F.col("_c")).alias("seasonal_micro"),
    )
    out = detr.join(seasonal, keys + ["phase"], "left")
    return out.select(
        *keys,
        "t",
        "y",
        "phase",
        "trend_micro",
        "seasonal_micro",
        F.when(
            F.col("trend_micro").isNotNull()
            & F.col("seasonal_micro").isNotNull(),
            F.col("y") * MICRO - F.col("trend_micro") - F.col("seasonal_micro"),
        ).alias("remainder_micro"),
    )


def seasonal_decompose_oracle_sql(
    series_sql: str,
    key_cols: list[str],
    t_col: str,
    y_col: str,
    period: int,
) -> str:
    """DuckDB replay: identical frames, identical truncating divisions."""
    keys = ", ".join(key_cols)
    dkeys = ", ".join(f"d.{k}" for k in key_cols)
    join_cond = " AND ".join(f"d.{k} = s.{k}" for k in key_cols)
    even = period % 2 == 0
    h = period // 2 if even else (period - 1) // 2
    frame_rows = period + 1 if even else period
    divisor = 2 * period if even else period
    over = (
        f"OVER (PARTITION BY {keys} ORDER BY t "
        f"ROWS BETWEEN {h} PRECEDING AND {h} FOLLOWING)"
    )
    doubled = (
        f"(2 * SUM(y) {over} - FIRST_VALUE(y) {over} - LAST_VALUE(y) {over})"
        if even
        else f"SUM(y) {over}"
    )
    return f"""
    WITH src AS (
        SELECT {keys}, CAST({t_col} AS BIGINT) AS t,
               CAST({y_col} AS BIGINT) AS y
        FROM ({series_sql}) s0
    ), trended AS (
        SELECT {keys}, t, y, t % {period} AS phase,
               CASE WHEN COUNT(y) {over} = {frame_rows}
                     AND MAX(t) {over} - MIN(t) {over} = {frame_rows - 1}
               THEN CAST(({doubled} * {MICRO}) // {divisor} AS BIGINT)
               END AS trend_micro
        FROM src
    ), detr AS (
        SELECT *, y * {MICRO} - trend_micro AS det FROM trended
    ), seasonal_raw AS (
        SELECT {keys}, phase,
               CAST(SUM(det) // COUNT(*) AS BIGINT) AS s_raw
        FROM detr WHERE det IS NOT NULL GROUP BY {keys}, phase
    ), centering AS (
        SELECT {keys}, CAST(SUM(s_raw) // COUNT(*) AS BIGINT) AS c
        FROM seasonal_raw GROUP BY {keys}
    ), seasonal AS (
        SELECT r.*, CAST(r.s_raw - c.c AS BIGINT) AS seasonal_micro
        FROM seasonal_raw r JOIN centering c USING ({keys})
    )
    SELECT {dkeys}, d.t, d.y, d.phase, d.trend_micro, s.seasonal_micro,
           CASE WHEN d.trend_micro IS NOT NULL
                 AND s.seasonal_micro IS NOT NULL
           THEN CAST(d.y * {MICRO} - d.trend_micro - s.seasonal_micro
                     AS BIGINT)
           END AS remainder_micro
    FROM detr d LEFT JOIN seasonal s
      ON {join_cond} AND d.phase = s.phase
    """
