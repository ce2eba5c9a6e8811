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
