"""Regularize per-key series: fill missing time bins (LOCF / linear).

``validate.detect_interval_gaps`` finds the holes; this operator
repairs them so downstream recurrences (``forecast.holt_forecast``,
``forecast.holt_winters_forecast``, ``burst.kleinberg_bursts``) see
the contiguous grid they assume.  A collector outage hour becomes an
explicit row instead of a silently skipped step that would corrupt
every position-indexed recurrence after it.

Methods:

- ``locf`` — last observation carried forward, the step-function
  semantics of cumulative gauges; leading gaps (before the key's
  first observation) stay NULL.
- ``linear`` — straight-line interpolation between the surrounding
  observations, the usual choice for rates; leading/trailing gaps
  fall back to the single available side (LOCF backward/forward).

Determinism: the grid is integer arithmetic (``sequence(min, max,
step)``); LOCF copies observed values verbatim; linear interpolation
is one fixed double expression ``prev + (next - prev) * (t - pt) /
(nt - pt)`` rounded to 4 dp — engine-identical.

Scale shape: one partial-aggregated groupBy for per-key bounds, one
explode of the per-key grid (output-sized, not quadratic), one
equi-join back to observations, and two windows PARTITIONED BY KEY
(never global) for the carried values.  A key whose span/step is
enormous produces an enormous grid — that is the caller's contract
(the grid IS the requested output), not a plan defect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F


def fill_intervals(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    y_col: str,
    step: int,
    method: str = "locf",
) -> DataFrame:
    """The filled series: key_cols..., ``t_col`` (every grid bin from
    the key's min to max observation), ``y_col`` (observed or filled),
    ``filled`` (1 on repaired bins).  ``t_col`` must be integral
    (epoch seconds, hour index) with at most one row per (key, t) —
    duplicates are an upstream aggregation bug this operator must not
    paper over.  Observations must sit ON the key's ``min(t) +
    k*step`` lattice (bin timestamps first: ``floor(epoch/step) *
    step``) — an off-lattice row matches no grid bin and would be
    silently dropped, so feed binned series only."""
    if step <= 0:
        raise ValueError("step must be a positive integer")
    if method not in ("locf", "linear"):
        raise ValueError("method must be 'locf' or 'linear'")
    obs = df.select(
        *key_cols,
        F.col(t_col).cast("long").alias("__t"),
        F.col(y_col).cast("double").alias("__y"),
    )
    bounds = obs.groupBy(*key_cols).agg(
        F.min("__t").alias("__lo"), F.max("__t").alias("__hi")
    )
    grid = bounds.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(int(step)))
        ).alias("__t"),
    )
    joined = grid.join(obs, [*key_cols, "__t"], "left")
    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(*key_cols)
        .orderBy("__t")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_y = F.last("__y", ignorenulls=True).over(w_prev)
    prev_t = F.last(
        F.when(F.col("__y").isNotNull(), F.col("__t")), ignorenulls=True
    ).over(w_prev)
    if method == "locf":
        filled_y = prev_y
    else:
        next_y = F.first("__y", ignorenulls=True).over(w_next)
        next_t = F.first(
            F.when(F.col("__y").isNotNull(), F.col("__t")), ignorenulls=True
        ).over(w_next)
        interp = prev_y + (next_y - prev_y) * (
            (F.col("__t") - prev_t) / (next_t - prev_t)
        )
        filled_y = (
            F.when(F.col("__y").isNotNull(), F.col("__y"))
            .when(prev_t.isNull(), next_y)
            .when(next_t.isNull(), prev_y)
            .otherwise(F.round(interp, 4))
        )
    return joined.select(
        *key_cols,
        F.col("__t").alias(t_col),
        filled_y.alias(y_col),
        F.when(F.col("__y").isNull(), 1).otherwise(0).alias("filled"),
    )


def fill_intervals_oracle_sql(
    series_sql: str,
    key_cols: list[str],
    t_col: str,
    y_col: str,
    step: int,
    method: str = "locf",
) -> str:
    """DuckDB replay: range-generated grid, IGNORE NULLS windows, the
    identical interpolation expression."""
    keys = list(key_cols)
    kc = ", ".join(keys)
    prev_y = ("last_value(__y IGNORE NULLS) OVER (PARTITION BY {kc}"
              " ORDER BY __t ROWS BETWEEN UNBOUNDED PRECEDING AND"
              " CURRENT ROW)").format(kc=kc)
    prev_t = ("last_value(CASE WHEN __y IS NOT NULL THEN __t END"
              " IGNORE NULLS) OVER (PARTITION BY {kc} ORDER BY __t"
              " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
              ).format(kc=kc)
    next_y = ("first_value(__y IGNORE NULLS) OVER (PARTITION BY {kc}"
              " ORDER BY __t ROWS BETWEEN CURRENT ROW AND UNBOUNDED"
              " FOLLOWING)").format(kc=kc)
    next_t = ("first_value(CASE WHEN __y IS NOT NULL THEN __t END"
              " IGNORE NULLS) OVER (PARTITION BY {kc} ORDER BY __t"
              " ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
              ).format(kc=kc)
    if method == "locf":
        fill_expr = f"{prev_y}"
    else:
        fill_expr = f"""
            CASE WHEN __y IS NOT NULL THEN __y
                 WHEN {prev_t} IS NULL THEN {next_y}
                 WHEN {next_t} IS NULL THEN {prev_y}
                 ELSE ROUND({prev_y} + ({next_y} - {prev_y})
                      * ((__t - {prev_t}) / ({next_t} - {prev_t})), 4)
            END"""
    return f"""
    WITH obs AS (
        SELECT {kc}, CAST({t_col} AS BIGINT) AS __t,
               CAST({y_col} AS DOUBLE) AS __y
        FROM ({series_sql}) s
    ), bounds AS (
        SELECT {kc}, MIN(__t) AS lo, MAX(__t) AS hi FROM obs GROUP BY {kc}
    ), grid AS (
        SELECT {kc}, unnest(range(lo, hi + 1, {int(step)})) AS __t
        FROM bounds
    ), j AS (
        SELECT g.*, o.__y
        FROM grid g LEFT JOIN obs o
          ON {" AND ".join(f"o.{k} = g.{k}" for k in keys)}
         AND o.__t = g.__t
    )
    SELECT {kc}, __t AS {t_col}, {fill_expr} AS {y_col},
           CAST(CASE WHEN __y IS NULL THEN 1 ELSE 0 END AS INT) AS filled
    FROM j
    """
