"""Holt linear-trend forecasting over per-key metric series.

The capacity-planning / alert-threshold operator every telemetry pipeline
grows after the anomaly detectors: exponential smoothing with a trend
term (Holt 1957; the non-seasonal core of Holt-Winters) produces a
one-step-ahead fit for every observed point and an h-step forecast past
the series end.  The reference collector forwards points and leaves
forecasting to the backend (Elasticsearch ML jobs); this is part of the
beyond-the-reference analytics surface, sitting next to
``anomaly.seasonal_hour_anomaly`` (which models seasonality by same-hour
medians instead of a recurrence).

Recurrence (standard Holt, smoothing ``alpha``, trend ``beta``)::

    l_1 = y_1                 b_1 = y_2 - y_1
    yhat_t = l_{t-1} + b_{t-1}
    l_t = alpha*y_t + (1-alpha)*(l_{t-1} + b_{t-1})
    b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
    forecast(n, h) = l_n + h*b_n

Scale shape — the recurrence is sequential, but it runs on the PER-KEY
AGGREGATED series, never the raw events: the one corpus-sized pass is
the ``groupBy(key, hour).count()`` upstream (partial-aggregated, one
shuffle), after which each key's frame is hours-not-events sized
(a year of hourly points is 8,760 rows).  ``applyInPandas`` groups those
tiny frames per key — keys parallelize, the Python loop touches series
points only.  Same shape as ``exphist`` final merge and the stateful
token bucket: Python is confined to per-key-tiny state.

Cross-engine determinism: the recurrence is pure IEEE-754 double
arithmetic written with the identical expression tree the DuckDB
``WITH RECURSIVE`` oracle uses (defaults alpha=0.5, beta=0.25 are
exactly representable), so level/trend/forecast replay bit-for-bit and
the repo's round-to-4dp emission convention is cosmetic, not masking.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def holt_forecast(
    series: DataFrame,
    key_cols: list[str],
    order_col: str,
    y_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    horizon: int = 0,
) -> DataFrame:
    """Per-key Holt fit + ``horizon`` future steps.

    Input: one row per (key, period) — an already-aggregated series
    (``order_col`` orders periods within a key; duplicates are an input
    error the caller owns, see ``validate.detect_interval_gaps`` for the
    gap/duplicate audit).

    Output columns: ``key_cols...``, ``i`` (1-based position; fitted rows
    are 2..n, forecast rows n+1..n+horizon), ``y`` (observed, NULL on
    forecast rows), ``level``, ``trend`` (NULL on forecast rows),
    ``yhat`` (one-step-ahead fit, or ``l_n + h*b_n``) — doubles rounded
    to 4 dp.  Keys with fewer than 2 points are dropped (no trend is
    identifiable); the first point carries no one-step fit, so it is not
    emitted.
    """
    if not 0.0 < alpha <= 1.0 or not 0.0 <= beta <= 1.0:
        raise ValueError("alpha must be in (0, 1], beta in [0, 1]")
    if horizon < 0:
        raise ValueError("horizon must be >= 0")
    a, b_ = float(alpha), float(beta)
    h_ = int(horizon)

    key_fields = [series.schema[c] for c in key_cols]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in key_fields]
        + ["i long", "y double", "level double", "trend double", "yhat double"]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        ys = [float(v) for v in pdf[y_col]]
        n = len(ys)
        keys = {c: pdf[c].iloc[0] for c in key_cols}
        if n < 2:
            return pd.DataFrame(
                columns=[*key_cols, "i", "y", "level", "trend", "yhat"]
            )
        lev = ys[0]
        tr = ys[1] - ys[0]
        rows: list[dict] = []
        for i in range(1, n):
            y = ys[i]
            yhat = lev + tr
            lev_new = a * y + (1.0 - a) * (lev + tr)
            tr_new = b_ * (lev_new - lev) + (1.0 - b_) * tr
            rows.append(
                {**keys, "i": i + 1, "y": y, "level": lev_new,
                 "trend": tr_new, "yhat": yhat}
            )
            lev, tr = lev_new, tr_new
        for h in range(1, h_ + 1):
            rows.append(
                {**keys, "i": n + h, "y": None, "level": None,
                 "trend": None, "yhat": lev + h * tr}
            )
        return pd.DataFrame(rows)

    out = series.groupBy(*key_cols).applyInPandas(fold, out_schema)
    return out.select(
        *key_cols,
        "i",
        F.round("y", 4).alias("y"),
        F.round("level", 4).alias("level"),
        F.round("trend", 4).alias("trend"),
        F.round("yhat", 4).alias("yhat"),
    )


def holt_winters_forecast(
    series: DataFrame,
    key_cols: list[str],
    order_col: str,
    y_col: str,
    period: int,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
    horizon: int = 0,
) -> DataFrame:
    """Additive Holt-Winters (level + trend + ``period``-long seasonal
    cycle) — the seasonal extension of :func:`holt_forecast` for series
    where same-hour-of-day / same-day-of-week structure dominates.

    Recurrence (standard additive form, textbook init)::

        l_p  = mean(y_1..y_p)
        b_p  = (mean(y_{p+1}..y_{2p}) - mean(y_1..y_p)) / p
        s_i  = y_i - l_p                      (i = 1..p)
        yhat_t = l_{t-1} + b_{t-1} + s_{t-p}
        l_t  = alpha*(y_t - s_{t-p}) + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t  = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
        s_t  = gamma*(y_t - l_t) + (1-gamma)*s_{t-p}
        forecast(n, h) = l_n + h*b_n + s_{n-p+1+((h-1) mod p)}

    Keys with fewer than ``2*period`` points are dropped (the init
    needs two full seasons).  Output: key_cols..., ``i`` (1-based;
    fitted rows are period+1..n, forecast rows n+1..n+horizon), ``y``,
    ``level``, ``trend``, ``seasonal`` (all NULL on forecast rows),
    ``yhat`` — doubles rounded to 4 dp.

    Scale shape: identical to :func:`holt_forecast` — the recurrence
    runs per key on the AGGREGATED series via ``applyInPandas``; keys
    parallelize, Python touches period-counts of rows only.

    Cross-engine determinism: the step recurrence is the identical
    double expression tree as :func:`holt_winters_oracle_sql`'s
    ``WITH RECURSIVE`` (which carries the seasonal state as a LIST
    column).  The init means divide a SUM whose addend order SQL does
    not pin — exact anyway whenever y is integer-valued (counts,
    micro-units: integer sums below 2^53 are order-free in doubles),
    which is what the repo's fixed-point conventions feed it; for
    general float series the replay is exact-after-init only.
    """
    if not 0.0 < alpha <= 1.0 or not 0.0 <= beta <= 1.0:
        raise ValueError("alpha must be in (0, 1], beta in [0, 1]")
    if not 0.0 <= gamma <= 1.0:
        raise ValueError("gamma must be in [0, 1]")
    if period < 2:
        raise ValueError("period must be >= 2")
    if horizon < 0:
        raise ValueError("horizon must be >= 0")
    a, b_, g = float(alpha), float(beta), float(gamma)
    p, h_ = int(period), int(horizon)

    key_fields = [series.schema[c] for c in key_cols]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in key_fields]
        + ["i long", "y double", "level double", "trend double",
           "seasonal double", "yhat double"]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        ys = [float(v) for v in pdf[y_col]]
        n = len(ys)
        keys = {c: pdf[c].iloc[0] for c in key_cols}
        cols = [*key_cols, "i", "y", "level", "trend", "seasonal", "yhat"]
        if n < 2 * p:
            return pd.DataFrame(columns=cols)
        lev = sum(ys[:p]) / p
        tr = (sum(ys[p : 2 * p]) / p - sum(ys[:p]) / p) / p
        season = [y - lev for y in ys[:p]]  # s_{t-p+1} .. s_t window
        rows: list[dict] = []
        for t in range(p, n):
            y = ys[t]
            s_old = season[0]
            yhat = lev + tr + s_old
            lev_new = a * (y - s_old) + (1.0 - a) * (lev + tr)
            tr_new = b_ * (lev_new - lev) + (1.0 - b_) * tr
            s_new = g * (y - lev_new) + (1.0 - g) * s_old
            season = season[1:] + [s_new]
            rows.append(
                {**keys, "i": t + 1, "y": y, "level": lev_new,
                 "trend": tr_new, "seasonal": s_new, "yhat": yhat}
            )
            lev, tr = lev_new, tr_new
        for h in range(1, h_ + 1):
            rows.append(
                {**keys, "i": n + h, "y": None, "level": None,
                 "trend": None, "seasonal": None,
                 "yhat": lev + h * tr + season[(h - 1) % p]}
            )
        return pd.DataFrame(rows)

    out = series.groupBy(*key_cols).applyInPandas(fold, out_schema)
    return out.select(
        *key_cols,
        "i",
        F.round("y", 4).alias("y"),
        F.round("level", 4).alias("level"),
        F.round("trend", 4).alias("trend"),
        F.round("seasonal", 4).alias("seasonal"),
        F.round("yhat", 4).alias("yhat"),
    )


def holt_winters_oracle_sql(
    series_sql: str,
    key_cols: Iterable[str],
    order_col: str,
    y_col: str,
    period: int,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
    horizon: int = 0,
) -> str:
    """DuckDB ``WITH RECURSIVE`` replay of :func:`holt_winters_forecast`
    — the recursion carries the rolling seasonal window as a LIST
    column (``slist[2:] || [s_new]`` mirrors the Python deque)."""
    keys = list(key_cols)
    kc = ", ".join(keys)
    a, b_, g = float(alpha), float(beta), float(gamma)
    p = int(period)
    join_keys = " AND ".join(f"x.{k} = r.{k}" for k in keys)
    rk = ", ".join(f"r.{k}" for k in keys)
    lk = ", ".join(f"l.{k}" for k in keys)
    mk = ", ".join(f"m.{k}" for k in keys)
    lev_new = (
        f"{a!r}*(x.y - r.slist[1]) + {1.0 - a!r}*(r.level + r.trend)"
    )
    return f"""
    WITH RECURSIVE idx AS (
        SELECT {kc}, CAST({y_col} AS DOUBLE) AS y,
               ROW_NUMBER() OVER (PARTITION BY {kc} ORDER BY {order_col})
                   AS i
        FROM ({series_sql}) s
    ), m AS (
        SELECT {kc},
               SUM(y) FILTER (WHERE i <= {p}) AS s1,
               SUM(y) FILTER (WHERE i > {p} AND i <= {2 * p}) AS s2,
               MAX(i) AS n
        FROM idx GROUP BY {kc} HAVING MAX(i) >= {2 * p}
    ), init AS (
        SELECT {mk}, m.n, m.s1/{p} AS level,
               (m.s2/{p} - m.s1/{p})/{p} AS trend,
               list(x.y - m.s1/{p} ORDER BY x.i) AS slist
        FROM m JOIN idx x
          ON {" AND ".join(f"x.{k} = m.{k}" for k in keys)}
         AND x.i <= {p}
        GROUP BY {mk}, m.n, m.s1, m.s2
    ), rec AS (
        SELECT {kc}, n, CAST({p} AS BIGINT) AS i,
               CAST(NULL AS DOUBLE) AS y, level, trend,
               CAST(NULL AS DOUBLE) AS seasonal,
               CAST(NULL AS DOUBLE) AS yhat, slist
        FROM init
        UNION ALL
        SELECT {rk}, r.n, r.i + 1, x.y,
               {lev_new} AS level,
               {b_!r}*(({lev_new}) - r.level) + {1.0 - b_!r}*r.trend
                   AS trend,
               {g!r}*(x.y - ({lev_new})) + {1.0 - g!r}*r.slist[1]
                   AS seasonal,
               r.level + r.trend + r.slist[1] AS yhat,
               r.slist[2:]
                   || [{g!r}*(x.y - ({lev_new})) + {1.0 - g!r}*r.slist[1]]
                   AS slist
        FROM rec r
        JOIN idx x ON {join_keys} AND x.i = r.i + 1
    ), lastrow AS (
        SELECT r.* FROM rec r WHERE r.i = r.n
    ), fut AS (
        SELECT {lk}, l.i + h.h AS i, CAST(NULL AS DOUBLE) AS y,
               CAST(NULL AS DOUBLE) AS level, CAST(NULL AS DOUBLE) AS trend,
               CAST(NULL AS DOUBLE) AS seasonal,
               l.level + h.h*l.trend + l.slist[((h.h - 1) % {p}) + 1]
                   AS yhat
        FROM lastrow l
        CROSS JOIN (SELECT unnest(range(1, {horizon} + 1)) AS h) h
    )
    SELECT {kc}, i, ROUND(y, 4) AS y, ROUND(level, 4) AS level,
           ROUND(trend, 4) AS trend, ROUND(seasonal, 4) AS seasonal,
           ROUND(yhat, 4) AS yhat
    FROM (
        SELECT {kc}, i, y, level, trend, seasonal, yhat
        FROM rec WHERE i > {p}
        UNION ALL SELECT * FROM fut
    ) u
    """


def holt_oracle_sql(
    series_sql: str,
    key_cols: Iterable[str],
    order_col: str,
    y_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    horizon: int = 0,
) -> str:
    """DuckDB ``WITH RECURSIVE`` replay of :func:`holt_forecast` over the
    same series query — the identical double expression tree, so results
    match exactly (not just to rounding)."""
    keys = list(key_cols)
    kc = ", ".join(keys)
    a, b_ = float(alpha), float(beta)
    join_keys = " AND ".join(f"x.{k} = r.{k}" for k in keys)
    rk = ", ".join(f"r.{k}" for k in keys)
    lk = ", ".join(f"l.{k}" for k in keys)
    level_expr = f"{a!r}*x.y + {1.0 - a!r}*(r.level + r.trend)"
    return f"""
    WITH RECURSIVE idx AS (
        SELECT {kc}, CAST({y_col} AS DOUBLE) AS y,
               ROW_NUMBER() OVER (PARTITION BY {kc} ORDER BY {order_col})
                   AS i
        FROM ({series_sql}) s
    ), nper AS (
        SELECT {kc}, MAX(i) AS n FROM idx GROUP BY {kc}
    ), rec AS (
        SELECT {", ".join(f"i1.{k}" for k in keys)},
               CAST(1 AS BIGINT) AS i, i1.y AS y,
               i1.y AS level, i2.y - i1.y AS trend,
               CAST(NULL AS DOUBLE) AS yhat
        FROM idx i1
        JOIN idx i2
          ON {" AND ".join(f"i2.{k} = i1.{k}" for k in keys)}
         AND i1.i = 1 AND i2.i = 2
        UNION ALL
        SELECT {rk}, r.i + 1, x.y,
               {level_expr} AS level,
               {b_!r}*(({level_expr}) - r.level) + {1.0 - b_!r}*r.trend
                   AS trend,
               r.level + r.trend AS yhat
        FROM rec r
        JOIN idx x ON {join_keys} AND x.i = r.i + 1
    ), lastrow AS (
        SELECT r.* FROM rec r
        JOIN nper n ON {" AND ".join(f"n.{k} = r.{k}" for k in keys)}
                   AND r.i = n.n
    ), fut AS (
        SELECT {lk}, l.i + h.h AS i, CAST(NULL AS DOUBLE) AS y,
               CAST(NULL AS DOUBLE) AS level, CAST(NULL AS DOUBLE) AS trend,
               l.level + h.h*l.trend AS yhat
        FROM lastrow l
        CROSS JOIN (SELECT unnest(range(1, {horizon} + 1)) AS h) h
    )
    SELECT {kc}, i, ROUND(y, 4) AS y, ROUND(level, 4) AS level,
           ROUND(trend, 4) AS trend, ROUND(yhat, 4) AS yhat
    FROM (SELECT * FROM rec WHERE i >= 2 UNION ALL SELECT * FROM fut) u
    """


def holt_backtest(
    series: DataFrame,
    key_cols: list[str],
    order_col: str,
    y_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    warmup: int = 5,
) -> DataFrame:
    """Rolling-origin (one-step-ahead) backtest of the Holt fit — the
    readout that says whether the forecast is USABLE, per key, before
    anyone alerts on it.

    Holt's fitted ``yhat_t = l_{t-1} + b_{t-1}`` is already the honest
    one-step-ahead forecast (it never sees ``y_t``), so the backtest is
    the same single recurrence pass — no per-cutoff refits.  The first
    ``warmup`` fitted points are excluded (initialization-dominated).

    Exact-integer error algebra (floor-quantized ten-thousandths —
    FLOOR, never ROUND: both engines floor doubles identically, while
    half-away rounding has engine-boundary corners):

    - ``d_e4 = floor((y_t − yhat_t)·1e4)``  per evaluated point,
    - ``bias_e4 = Σ d_e4``, ``sum_abs_e4 = Σ|d_e4|``, ``sse_e8 = Σ d²``,
    - ``mase_milli = 1000·Σ|d| DIV Σ|naive d|`` against the naive
      random-walk forecast ``yhat = y_{t-1}`` over the SAME points
      (Hyndman's MASE denominator) — < 1000 means Holt beats naive;
      NULL when the naive denominator is zero (constant series).

    Keys with no evaluated points drop out.  Same scale shape as
    ``holt_forecast``: the recurrence touches per-key aggregated series
    only."""
    if not 0.0 < alpha <= 1.0 or not 0.0 <= beta <= 1.0:
        raise ValueError("alpha must be in (0, 1], beta in [0, 1]")
    if warmup < 0:
        raise ValueError("warmup must be >= 0")
    import math

    a, b_ = float(alpha), float(beta)
    w = int(warmup)

    key_fields = [series.schema[c] for c in key_cols]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in key_fields]
        + [
            "n_eval long", "sum_abs_e4 long", "bias_e4 long",
            "sse_e8 long", "mase_milli long",
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        ys = [float(v) for v in pdf[y_col]]
        n = len(ys)
        keys = {c: pdf[c].iloc[0] for c in key_cols}
        cols = [*key_cols, "n_eval", "sum_abs_e4", "bias_e4", "sse_e8",
                "mase_milli"]
        if n < 2:
            return pd.DataFrame(columns=cols)
        lev = ys[0]
        tr = ys[1] - ys[0]
        sum_abs = bias = sse = naive_abs = n_eval = 0
        for i in range(1, n):
            y = ys[i]
            yhat = lev + tr
            if i + 1 >= 2 + w:  # 1-based fitted index past the warmup
                d = math.floor((y - yhat) * 10000.0)
                nd = math.floor((y - ys[i - 1]) * 10000.0)
                sum_abs += abs(d)
                bias += d
                sse += d * d
                naive_abs += abs(nd)
                n_eval += 1
            lev_new = a * y + (1.0 - a) * (lev + tr)
            tr = b_ * (lev_new - lev) + (1.0 - b_) * tr
            lev = lev_new
        if n_eval == 0:
            return pd.DataFrame(columns=cols)
        mase = (sum_abs * 1000) // naive_abs if naive_abs else None
        return pd.DataFrame(
            [{**keys, "n_eval": n_eval, "sum_abs_e4": sum_abs,
              "bias_e4": bias, "sse_e8": sse, "mase_milli": mase}]
        )

    return series.groupBy(*key_cols).applyInPandas(fold, out_schema)


def holt_backtest_oracle_sql(
    series_sql: str,
    key_cols: Iterable[str],
    order_col: str,
    y_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    warmup: int = 5,
) -> str:
    """DuckDB replay of :func:`holt_backtest`: the same WITH RECURSIVE
    recurrence as :func:`holt_oracle_sql` (unrounded), then the integer
    error algebra over the post-warmup fitted rows."""
    keys = list(key_cols)
    kc = ", ".join(keys)
    a, b_ = float(alpha), float(beta)
    join_keys = " AND ".join(f"x.{k} = r.{k}" for k in keys)
    rk = ", ".join(f"r.{k}" for k in keys)
    level_expr = f"{a!r}*x.y + {1.0 - a!r}*(r.level + r.trend)"
    pjoin = " AND ".join(f"p.{k} = r.{k}" for k in keys)
    ek = ", ".join(f"e.{k}" for k in keys)
    return f"""
    WITH RECURSIVE idx AS (
        SELECT {kc}, CAST({y_col} AS DOUBLE) AS y,
               ROW_NUMBER() OVER (PARTITION BY {kc} ORDER BY {order_col})
                   AS i
        FROM ({series_sql}) s
    ), rec AS (
        SELECT {", ".join(f"i1.{k}" for k in keys)},
               CAST(1 AS BIGINT) AS i, i1.y AS y,
               i1.y AS level, i2.y - i1.y AS trend,
               CAST(NULL AS DOUBLE) AS yhat
        FROM idx i1
        JOIN idx i2
          ON {" AND ".join(f"i2.{k} = i1.{k}" for k in keys)}
         AND i1.i = 1 AND i2.i = 2
        UNION ALL
        SELECT {rk}, r.i + 1, x.y,
               {level_expr} AS level,
               {b_!r}*(({level_expr}) - r.level) + {1.0 - b_!r}*r.trend
                   AS trend,
               r.level + r.trend AS yhat
        FROM rec r
        JOIN idx x ON {join_keys} AND x.i = r.i + 1
    ), ev AS (
        SELECT {rk},
               CAST(FLOOR((r.y - r.yhat) * 10000) AS BIGINT) AS d_e4,
               CAST(FLOOR((r.y - p.y) * 10000) AS BIGINT) AS nd_e4
        FROM rec r
        JOIN idx p ON {pjoin} AND p.i = r.i - 1
        WHERE r.i >= 2 + {int(warmup)}
    )
    SELECT {ek},
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(ABS(d_e4)) AS BIGINT) AS sum_abs_e4,
           CAST(SUM(d_e4) AS BIGINT) AS bias_e4,
           CAST(SUM(d_e4 * d_e4) AS BIGINT) AS sse_e8,
           CAST(CAST(SUM(ABS(d_e4)) AS BIGINT) * 1000
                // NULLIF(CAST(SUM(ABS(nd_e4)) AS BIGINT), 0) AS BIGINT)
               AS mase_milli
    FROM ev e
    GROUP BY {ek}
    """
