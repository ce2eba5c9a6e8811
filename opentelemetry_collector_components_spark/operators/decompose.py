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


def acf_dominant_period(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    max_lag: int,
    min_lag: int = 2,
) -> DataFrame:
    """Dominant seasonality period per key via the autocorrelation
    argmax — the detector that FINDS the ``period`` argument
    ``seasonal_decompose`` requires (run this first when the cadence is
    unknown: is this host daily, weekly, or 36-hourly?).

    With 1-indexed position t, series length n, total S, the
    mean-centered deviation scaled to stay integral is
    ``d_t = n*y_t - S`` (= n*(y_t - mean)); then for each lag L

        acf_num(L) = sum_t d_t * d_{t+L}          (pure BIGINT)
        acf(L)     = acf_num(L) / sum_t d_t^2     (shared denominator)

    The denominator is the same for every lag and positive whenever the
    series has any variance, so ``period = argmax_L acf_num(L)`` over
    L in [min_lag, max_lag] is an EXACT INTEGER argmax (smallest L on
    ties — deterministic).  ``min_lag`` defaults to 2 because lag 1
    measures smoothness, not cycles.  Zero-variance keys are dropped
    (ACF undefined; no cycle to find), as are keys shorter than
    min_lag+1 points (no admissible lag).

    Output: (*key_cols, period BIGINT, acf_num BIGINT, acf_den BIGINT,
    acf DOUBLE 6dp).  Note acf_num may be negative (anti-correlated
    best lag) — the argmax is still well-defined and callers should
    gate on ``acf`` before trusting ``period``.

    Scale shape: key-partitioned windows for (t, n, S); the lag
    numerators come from ONE equi-join of the deviation table against
    itself exploded by lag (|series| x (max_lag - min_lag + 1) rows,
    joined on (key, t) — never key x key), partial-aggregated by
    (key, lag).  Overflow: the binding term is acf_den = sum d_t^2 =
    n^3 * var(y) (and each lag numerator is bounded by it), so
    n^3 * var(y) must stay under 9.2e18 — a year of hourly points
    (n = 8760) tolerates per-point deviations up to ~3.7e3; divide y
    by a fixed scale first for heavier series (the argmax and acf are
    scale-invariant up to the division's rounding).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not 1 <= min_lag <= max_lag:
        raise ValueError(f"need 1 <= min_lag <= max_lag, got {min_lag}..{max_lag}")
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    v = F.col(value_col).cast("long")
    dev = (
        df.withColumn("_t", F.row_number().over(w).cast("long"))
        .withColumn("_n", F.count(F.lit(1)).over(full))
        .withColumn("_s", F.sum(v).over(full))
        .select(
            *key_cols, "_t", (F.col("_n") * v - F.col("_s")).alias("_d")
        )
    )
    den = dev.groupBy(*key_cols).agg(
        F.sum(F.col("_d") * F.col("_d")).cast("long").alias("acf_den")
    )
    shifted = dev.select(
        *key_cols,
        F.explode(F.sequence(F.lit(min_lag), F.lit(max_lag))).alias("_lag"),
        (F.col("_t") + F.col("_lag")).alias("_t"),
        F.col("_d").alias("_d1"),
    )
    num = (
        shifted.join(dev, [*key_cols, "_t"])
        .groupBy(*key_cols, "_lag")
        .agg(F.sum(F.col("_d1") * F.col("_d")).cast("long").alias("acf_num"))
    )
    pick = Window.partitionBy(*key_cols).orderBy(
        F.col("acf_num").desc(), F.col("_lag").asc()
    )
    return (
        num.withColumn("_rk", F.row_number().over(pick))
        .where(F.col("_rk") == 1)
        .join(den, key_cols)
        .where(F.col("acf_den") > 0)
        .select(
            *key_cols,
            F.col("_lag").cast("long").alias("period"),
            "acf_num",
            "acf_den",
            F.round(F.col("acf_num") / F.col("acf_den"), 6).alias("acf"),
        )
    )


def ccf_lead_lag(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    series_col: str,
    series_a: str,
    series_b: str,
    max_lag: int,
) -> DataFrame:
    """Cross-correlation lead-lag detection per key — which of two
    aligned series LEADS, and by how much ("errors follow deploys by
    3 hours").  Input is long format: (key..., order_col on a shared
    INTEGER grid, series_col in {series_a, series_b}, value_col);
    run ``resample.fill_intervals`` upstream if the grid has holes
    (a missing point simply contributes no cross term — correct for
    sparse series, silently lag-shifting only if the grid itself is
    misaligned).

    With per-series deviations scaled integral (da_t = n_a*a_t - S_a,
    db likewise — each over its OWN support), for lag L in
    [-max_lag, +max_lag]:

        ccf_num(L) = sum over shared t of da_t * db_{t+L}   (BIGINT)
        ccf(L)     = ccf_num(L) / sqrt(sum da^2 * sum db^2)

    Positive lag* means series_b LAGS series_a by lag* grid steps
    (a_t co-moves with b_{t+L}).  The denominator is lag-independent,
    so lag* = argmax ccf_num(L) is an EXACT INTEGER argmax; ties
    resolve to smallest |lag| then negative first (deterministic
    total order).  The normalization is the full-series-variance
    convention (statsmodels ``ccf``); sqrt over exact BIGINTs is
    IEEE-exact in both engines.  Keys missing either series, or with
    zero variance in one, are dropped.

    Output: (*key_cols, lag BIGINT, ccf_num BIGINT, den_a BIGINT,
    den_b BIGINT, ccf DOUBLE 6dp).

    Scale shape: key-partitioned windows for the deviations; one
    explode of (2*max_lag+1) lags on the a-side joined equi on
    (key, t) to the b-side — |a| x lags rows, never key x key; one
    partial-aggregated groupBy(key, lag).  Overflow: |da*db| <=
    n_a*n_b*max|a|*max|b| summed over overlap must stay under 9.2e18.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if max_lag < 0:
        raise ValueError("max_lag must be non-negative")
    if series_a == series_b:
        raise ValueError("series_a and series_b must differ")

    def deviations(label: str, dcol: str) -> DataFrame:
        w = Window.partitionBy(*key_cols)
        v = F.col(value_col).cast("long")
        return (
            df.where(F.col(series_col) == label)
            .withColumn("_n", F.count(F.lit(1)).over(w))
            .withColumn("_s", F.sum(v).over(w))
            .select(
                *key_cols,
                F.col(order_col).cast("long").alias("_t"),
                (F.col("_n") * v - F.col("_s")).alias(dcol),
            )
        )

    da = deviations(series_a, "_da")
    db = deviations(series_b, "_db")
    den = (
        da.groupBy(*key_cols)
        .agg(F.sum(F.col("_da") * F.col("_da")).cast("long").alias("den_a"))
        .join(
            db.groupBy(*key_cols).agg(
                F.sum(F.col("_db") * F.col("_db")).cast("long").alias("den_b")
            ),
            key_cols,
        )
    )
    shifted = da.select(
        *key_cols,
        F.explode(F.sequence(F.lit(-max_lag), F.lit(max_lag))).alias("_lag"),
        (F.col("_t") + F.col("_lag")).alias("_t"),
        "_da",
    )
    num = (
        shifted.join(db, [*key_cols, "_t"])
        .groupBy(*key_cols, "_lag")
        .agg(F.sum(F.col("_da") * F.col("_db")).cast("long").alias("ccf_num"))
    )
    pick = Window.partitionBy(*key_cols).orderBy(
        F.col("ccf_num").desc(), F.abs("_lag").asc(), F.col("_lag").asc()
    )
    return (
        num.withColumn("_rk", F.row_number().over(pick))
        .where(F.col("_rk") == 1)
        .join(den, key_cols)
        .where((F.col("den_a") > 0) & (F.col("den_b") > 0))
        .select(
            *key_cols,
            F.col("_lag").cast("long").alias("lag"),
            "ccf_num",
            "den_a",
            "den_b",
            F.round(
                F.col("ccf_num")
                / F.sqrt(F.col("den_a").cast("double") * F.col("den_b")),
                6,
            ).alias("ccf"),
        )
    )
