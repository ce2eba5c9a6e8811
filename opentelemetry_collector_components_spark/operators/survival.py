"""Kaplan-Meier survival curves over censored durations.

The content-lifetime / retention operator: given one row per subject
with a duration and an observed-event flag (0 = right-censored at that
time), the product-limit estimator (Kaplan & Meier 1958)

    S(t) = prod over event times t_i <= t of (1 - d_i / n_i)

where ``d_i`` is events at ``t_i`` and ``n_i`` the at-risk count (still
unobserved just before ``t_i``).  Censored subjects leave the risk set
without counting as events — the property that makes this the right
tool for "how long does a page stay alive / a session stay active /
a host keep responding" when observation windows truncate the data.

Scale shape: the corpus-sized pass is ONE groupBy collapsing subjects
to the per-(key, distinct-duration) grid — everything after runs on
grid rows.  At 100 TB, bucket durations first (hour/day grain) so the
grid per key stays thousands of rows; the bucketed grid IS the
estimator's contract (ties at a bucket are simultaneous, the standard
discrete-time form).  The sequential product runs per key over that
tiny frame via ``applyInPandas`` (Holt-forecast discipline: Python
touches aggregated rows only).

Survival is EXACT-INTEGER micro-units: ``S' = (S * (n - d)) div n``
per grid row, truncating division — exactly associative, replayed
step-for-step by a DuckDB recursive CTE (same discipline as the
PageRank trajectory; rows with ``d = 0`` are exact no-ops since
``S*n div n = S``).  Quantization error is < 1e-6 per step, one-sided
(floor), and documented rather than hidden behind float rounding.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def km_survival(
    df: DataFrame,
    key_cols: list[str],
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Per-key KM curve over the (key, duration) grid.

    Input: one row per subject — ``duration_col`` (numeric, non-null
    rows only; bucket upstream at scale), ``event_col`` 1 = event
    observed at that duration, 0 = censored there.

    Output: one row per (key, distinct duration): ``n_risk`` (at-risk
    just before t), ``d`` (events at t), ``n_obs`` (subjects leaving at
    t, events + censored), ``surv_micro`` (S(t) in exact micro-units).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    grid = (
        df.where(F.col(duration_col).isNotNull())
        .groupBy(*key_cols, F.col(duration_col).alias("t"))
        .agg(
            F.sum(F.col(event_col).cast("long")).alias("d"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    key_fields = [grid.schema[c] for c in key_cols]
    t_type = grid.schema["t"].dataType.simpleString()
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in key_fields]
        + [f"t {t_type}", "n_risk long", "d long", "n_obs long",
           "surv_micro long"]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t", kind="mergesort")
        total = int(pdf["n_obs"].sum())
        keys = {c: pdf[c].iloc[0] for c in key_cols}
        rows = []
        at_risk = total
        surv = MICRO
        for t, d, n_obs in zip(pdf["t"], pdf["d"], pdf["n_obs"]):
            d, n_obs = int(d), int(n_obs)
            surv = (surv * (at_risk - d)) // at_risk
            rows.append(
                {**keys, "t": t, "n_risk": at_risk, "d": d,
                 "n_obs": n_obs, "surv_micro": surv}
            )
            at_risk -= n_obs
        return pd.DataFrame(rows)

    return grid.groupBy(*key_cols).applyInPandas(fold, out_schema)


def km_oracle_sql(
    subjects_sql: str,
    key_cols: list[str],
    duration_col: str,
    event_col: str,
) -> str:
    """DuckDB recursive-CTE replay of :func:`km_survival` over the same
    subjects query — identical integer trajectory."""
    keys = list(key_cols)
    kc = ", ".join(keys)
    jk = " AND ".join(f"x.{k} = r.{k}" for k in keys)
    xk = ", ".join(f"x.{k}" for k in keys)
    return f"""
    WITH RECURSIVE grid AS (
        SELECT {kc}, {duration_col} AS t,
               CAST(SUM({event_col}) AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM ({subjects_sql}) s
        WHERE {duration_col} IS NOT NULL
        GROUP BY ALL
    ), idx AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY {kc} ORDER BY t) AS i,
               SUM(n_obs) OVER (PARTITION BY {kc}) AS total,
               COALESCE(SUM(n_obs) OVER (
                   PARTITION BY {kc} ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_prev
        FROM grid
    ), rec AS (
        SELECT {kc}, i, t, total - cum_prev AS n_risk, d, n_obs,
               (1000000 * (total - cum_prev - d)) // (total - cum_prev)
                   AS surv
        FROM idx WHERE i = 1
        UNION ALL
        SELECT {xk}, x.i, x.t, x.total - x.cum_prev, x.d, x.n_obs,
               (r.surv * (x.total - x.cum_prev - x.d))
                   // (x.total - x.cum_prev)
        FROM rec r JOIN idx x ON {jk} AND x.i = r.i + 1
    )
    SELECT {kc}, t, CAST(n_risk AS BIGINT) AS n_risk, d, n_obs,
           CAST(surv AS BIGINT) AS surv_micro
    FROM rec
    """


def na_hazard(
    df: DataFrame,
    key_cols: list[str],
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson-Aalen cumulative hazard over the same censored-duration
    contract as :func:`km_survival` (Nelson 1972; Aalen 1978):

        H(t) = sum over event times t_i <= t of d_i / n_i

    — the additive companion to KM's product: hazard INCREMENTS are
    directly readable ("hour 3 contributes 0.4 failures per at-risk
    subject"), curves are comparable by subtraction, and at small
    d_i/n_i, S(t) ~ exp(-H(t)).

    Because it is a SUM, the whole estimator is window functions —
    no per-key Python fold at all (the structural advantage over
    km_survival's sequential product): at-risk counts come from a
    cumulative count over the grid, per-row increments truncate to
    micro (floor(1e6·d/n), one-sided, deterministic), and the running
    hazard is a window SUM of those integers — order-free BIGINT.

    Output: one row per (key, distinct duration): n_risk, d, n_obs,
    increment_micro, hazard_micro.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    from pyspark.sql.window import Window

    grid = (
        df.where(F.col(duration_col).isNotNull())
        .groupBy(*key_cols, F.col(duration_col).alias("t"))
        .agg(
            F.sum(F.col(event_col).cast("long")).alias("d"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    wp = Window.partitionBy(*key_cols)
    wo = wp.orderBy("t")
    n_risk = (
        F.sum("n_obs").over(wp)
        - F.coalesce(
            F.sum("n_obs").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
    )
    staged = grid.withColumn("n_risk", n_risk).withColumn(
        "increment_micro", F.expr(f"(d * {MICRO}) div n_risk")
    )
    return staged.withColumn(
        "hazard_micro",
        F.sum("increment_micro").over(
            Window.partitionBy(*key_cols)
            .orderBy("t")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).select(
        *key_cols, "t", "n_risk", "d", "n_obs",
        "increment_micro", "hazard_micro",
    )


def na_oracle_sql(
    subjects_sql: str,
    key_cols: list[str],
    duration_col: str,
    event_col: str,
) -> str:
    """DuckDB window replay of :func:`na_hazard` — no recursion needed."""
    kc = ", ".join(key_cols)
    return f"""
    WITH grid AS (
        SELECT {kc}, {duration_col} AS t,
               CAST(SUM({event_col}) AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM ({subjects_sql}) s
        WHERE {duration_col} IS NOT NULL
        GROUP BY ALL
    ), risk AS (
        SELECT *,
               CAST(SUM(n_obs) OVER (PARTITION BY {kc})
               - COALESCE(SUM(n_obs) OVER (
                   PARTITION BY {kc} ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS n_risk
        FROM grid
    ), inc AS (
        SELECT *, CAST((d * {MICRO}) // n_risk AS BIGINT)
                      AS increment_micro
        FROM risk
    )
    SELECT {kc}, t, CAST(n_risk AS BIGINT) AS n_risk, d, n_obs,
           increment_micro,
           CAST(SUM(increment_micro) OVER (
               PARTITION BY {kc} ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS hazard_micro
    FROM inc
    """
