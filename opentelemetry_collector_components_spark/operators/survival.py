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
