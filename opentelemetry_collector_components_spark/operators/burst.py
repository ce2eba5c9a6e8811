"""Two-state burst detection over per-key count series (Kleinberg).

"Which hours was this event type BURSTING, start to end?" — the
episode-extraction question the point-wise detectors in
``anomaly.py`` (MAD / CUSUM / seasonal) don't answer: they flag
individual outlier bins, while a burst model finds the maximum-
likelihood SEGMENTATION of the whole series into base-rate and
burst-rate regimes, tolerating mid-burst dips and charging a price
for flapping.

Model (the discrete two-state form of Kleinberg's burst automaton —
"Bursty and hierarchical structure in streams", KDD 2002): a bin with
count c costs ``r_q - c*ln(r_q)`` in state q (Poisson negative
log-likelihood, state-independent ``ln(c!)`` dropped), where
``r_0 = N/T`` is the key's base rate and ``r_1 = s * r_0`` the burst
rate; entering the burst state costs ``g * ln(T)``.  Viterbi picks
the cheapest state sequence.

Fixed-point discipline: every per-bin emission cost and the single
transition cost are quantized ONCE as ``floor(1e6 * <one double
chain>)`` (the ``pmi_collocations`` convention), after which the DP
is pure integer arithmetic with pinned tie-breaks (state 0 prefers
predecessor 0; state 1 prefers staying in 1) — so both engines walk
the identical path.  The DuckDB oracle replays the DP with a
``WITH RECURSIVE`` that carries the two alive state-sequence LISTs
and unnests the winner.

Scale shape: same as ``forecast.holt_forecast`` — the one corpus-
sized pass is the upstream groupBy(key, bin); the sequential DP runs
per key on the bins-not-events series via ``applyInPandas`` (keys
parallelize, Python touches series points only).
"""

from __future__ import annotations

import math
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def kleinberg_bursts(
    series: DataFrame,
    key_cols: list[str],
    order_col: str,
    count_col: str,
    s: float = 3.0,
    gamma: float = 1.0,
) -> DataFrame:
    """Per-bin optimal burst state for every key: key_cols..., ``i``
    (1-based bin position), ``c`` (count), ``state`` (0 base /
    1 burst).  Keys need >= 2 bins and a positive total; ``s`` (burst
    rate multiplier, > 1) and ``gamma`` (burst entry cost scale,
    >= 0) should be exactly-representable doubles so both engines
    share the literal."""
    if s <= 1.0:
        raise ValueError("s must be > 1 (burst rate above base rate)")
    if gamma < 0.0:
        raise ValueError("gamma must be >= 0")
    s_, g_ = float(s), float(gamma)

    key_fields = [series.schema[c] for c in key_cols]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in key_fields]
        + ["i long", "c long", "state int"]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        cs = [int(v) for v in pdf[count_col]]
        t_n = len(cs)
        keys = {c: pdf[c].iloc[0] for c in key_cols}
        cols = [*key_cols, "i", "c", "state"]
        total = sum(cs)
        if t_n < 2 or total <= 0:
            return pd.DataFrame(columns=cols)
        r0 = float(total) / t_n
        r1 = s_ * r0
        lr0, lr1 = math.log(r0), math.log(r1)
        tcost = math.floor(MICRO * (g_ * math.log(float(t_n))))

        def emit(c: int, r: float, lr: float) -> int:
            return math.floor(MICRO * (r - c * lr))

        # Viterbi over (d0, d1) with explicit path lists; pinned
        # tie-breaks mirror the oracle exactly
        d0, d1 = emit(cs[0], r0, lr0), emit(cs[0], r1, lr1) + tcost
        p0, p1 = [0], [1]
        for c in cs[1:]:
            n0 = emit(c, r0, lr0) + min(d0, d1)
            f0 = p0 if d0 <= d1 else p1
            n1 = emit(c, r1, lr1) + min(d0 + tcost, d1)
            f1 = p0 if d0 + tcost < d1 else p1
            d0, d1, p0, p1 = n0, n1, f0 + [0], f1 + [1]
        path = p0 if d0 <= d1 else p1
        return pd.DataFrame(
            [
                {**keys, "i": i + 1, "c": c, "state": st}
                for i, (c, st) in enumerate(zip(cs, path))
            ]
        )

    return series.groupBy(*key_cols).applyInPandas(fold, out_schema)


def kleinberg_oracle_sql(
    series_sql: str,
    key_cols: Iterable[str],
    order_col: str,
    count_col: str,
    s: float = 3.0,
    gamma: float = 1.0,
) -> str:
    """DuckDB ``WITH RECURSIVE`` replay of :func:`kleinberg_bursts`:
    the recursion carries integer costs (d0, d1) plus the two alive
    state-sequence LISTs and unnests the winning path."""
    keys = list(key_cols)
    kc = ", ".join(keys)
    rk = ", ".join(f"r.{k}" for k in keys)
    s_, g_ = float(s), float(gamma)
    e0 = f"CAST(FLOOR({MICRO} * (m.r0 - x.c * ln(m.r0))) AS BIGINT)"
    e1 = f"CAST(FLOOR({MICRO} * (m.r1 - x.c * ln(m.r1))) AS BIGINT)"
    ex0 = e0.replace("m.", "r.")
    ex1 = e1.replace("m.", "r.")
    return f"""
    WITH RECURSIVE idx AS (
        SELECT {kc}, CAST({count_col} AS BIGINT) AS c,
               ROW_NUMBER() OVER (PARTITION BY {kc} ORDER BY {order_col})
                   AS i
        FROM ({series_sql}) q
    ), meta AS (
        SELECT {kc}, MAX(i) AS n,
               CAST(SUM(c) AS DOUBLE) / MAX(i) AS r0,
               {s_!r} * (CAST(SUM(c) AS DOUBLE) / MAX(i)) AS r1,
               CAST(FLOOR({MICRO} * ({g_!r} * ln(CAST(MAX(i) AS DOUBLE))))
                    AS BIGINT) AS tc
        FROM idx GROUP BY {kc}
        HAVING MAX(i) >= 2 AND SUM(c) > 0
    ), rec AS (
        SELECT {", ".join(f"m.{k}" for k in keys)}, m.n, m.r0, m.r1, m.tc,
               x.i, {e0} AS d0, {e1} + m.tc AS d1,
               [0] AS p0, [1] AS p1
        FROM meta m JOIN idx x
          ON {" AND ".join(f"x.{k} = m.{k}" for k in keys)} AND x.i = 1
        UNION ALL
        SELECT {rk}, r.n, r.r0, r.r1, r.tc, x.i,
               {ex0} + least(r.d0, r.d1) AS d0,
               {ex1} + least(r.d0 + r.tc, r.d1) AS d1,
               (CASE WHEN r.d0 <= r.d1 THEN r.p0 ELSE r.p1 END) || [0]
                   AS p0,
               (CASE WHEN r.d0 + r.tc < r.d1 THEN r.p0 ELSE r.p1 END) || [1]
                   AS p1
        FROM rec r
        JOIN idx x ON {" AND ".join(f"x.{k} = r.{k}" for k in keys)}
                  AND x.i = r.i + 1
    ), final AS (
        SELECT {kc}, CASE WHEN d0 <= d1 THEN p0 ELSE p1 END AS path
        FROM rec WHERE i = n
    )
    SELECT {", ".join(f"x.{k}" for k in keys)}, x.i, x.c,
           CAST(f.path[CAST(x.i AS INT)] AS INT) AS state
    FROM idx x JOIN final f
      ON {" AND ".join(f"f.{k} = x.{k}" for k in keys)}
    """


def burstiness_index(
    df: DataFrame,
    key_cols: list[str],
    count_col: str,
) -> DataFrame:
    """Per-key dispersion of windowed counts — the Fano factor and CV²
    that CLASSIFY a traffic stream before ``kleinberg_bursts`` localizes
    its bursts: a Poisson-like stream has F ≈ 1 (rate alarms fine),
    F >> 1 means clumped arrivals (naive per-window thresholds will
    page constantly), F < 1 means regular/clocked traffic (a missed
    heartbeat is the anomaly, not a spike).

    Exact integer moments over each key's window counts c_1..c_n
    (n windows, S = Σc, Q = Σc²):

        fano_num = n*Q - S*S        (= n² * var)
        fano     = fano_num / (n*S)      (var / mean)
        cv2      = fano_num / (S*S)      (var / mean²)

    BIGINT numerators are emitted beside the rounded doubles; zero-sum
    keys are dropped (both ratios undefined).  The caller supplies
    pre-aggregated window counts (include empty windows via
    ``resample.fill_intervals`` when silence matters — a stream that is
    OFF half the time is bursty only if the zeros are in the data).

    Output: (*key_cols, n BIGINT, total BIGINT, sumsq BIGINT,
    fano_num BIGINT, fano DOUBLE 4dp, cv2 DOUBLE 4dp).

    Scale shape: one partial-aggregated groupBy over the (already
    aggregated) window-count table.  Overflow: the binding term is
    n*Q <= n²*max_c² under 9.2e18 — a year of hourly windows (n=8760)
    tolerates counts to ~3.5e5 RMS; rescale counts (divide by a fixed
    unit) beyond that, F and CV² are ratio-stable up to the rounding.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    c = F.col(count_col).cast("long")
    agg = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).cast("long").alias("total"),
        F.sum(c * c).cast("long").alias("sumsq"),
    )
    fano_num = F.col("n") * F.col("sumsq") - F.col("total") * F.col("total")
    return agg.where(F.col("total") > 0).select(
        *key_cols,
        "n",
        "total",
        "sumsq",
        fano_num.cast("long").alias("fano_num"),
        F.round(fano_num / (F.col("n") * F.col("total")), 4).alias("fano"),
        F.round(fano_num / (F.col("total") * F.col("total")), 4).alias("cv2"),
    )
