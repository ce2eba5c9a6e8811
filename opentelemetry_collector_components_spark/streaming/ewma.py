"""EWMA level/variance anomaly maintenance — batch twin + streaming state.

The classic EWMA control chart (Roberts 1959; NIST/SEMATECH handbook
6.3.2.4) as a continuously-maintained per-key monitor: an exponentially
weighted level tracks each series, an exponentially weighted squared
deviation tracks its spread, and a point flags when its squared
deviation from the PRE-UPDATE level exceeds ``z²`` times the
pre-update variance.  Complements the batch anomaly stack
(``anomaly.py`` MAD/CUSUM, ``seasonal`` baselines): those re-scan a
window; this folds each new interval into O(1) per-key state, which is
what a streaming pipeline can afford at 10^12 events — the state store
holds three BIGINTs per key, not a window of history.

Exact-integer recurrence (alpha = num/den, level scale S = 1000)::

    l_0 = y_0·S                     v_0 = 0
    d_t = y_t·S − l_{t−1}
    flag_t = t > warmup  AND  v_{t−1} > 0  AND  d_t² > z²·v_{t−1}
    l_t = (num·y_t·S + (den−num)·l_{t−1}) div den
    v_t = (num·d_t²  + (den−num)·v_{t−1}) div den

Every quantity is BIGINT and every division truncates toward zero in
both engines, so the stream, the batch twin, and the DuckDB recursive
oracle agree bit for bit.  Overflow envelope, derived from the chosen
params and enforced loudly per row: by induction var ≤ max d² and
|d| ≤ y_max·S, so the recurrence's worst term is
max(alpha_den, z²)·(y_max·S)² — the per-params ceiling is therefore
y_max = isqrt((2^63−1) / max(alpha_den, z²)) / S (≈ 9.5e5 for the
default 1/4, z=3 chart; tighter for large dens or z).  y must be a
non-negative integer measure under that ceiling; per-(key, interval)
counts beyond it should pre-aggregate to a coarser key anyway.

Scale shape: the batch twin folds per key over the AGGREGATED interval
series (``applyInPandas``, one shuffle on the key, numpy int64 loop —
the recurrence is inherently sequential per key, same as
``forecast.holt_forecast``); the streaming operator holds (idx, level,
var) in ``applyInPandasWithState`` and folds each micro-batch's rows
in event order — per-batch work is the batch's rows, per-key state is
O(1).  Rows must arrive in non-decreasing event order per key across
batches (the token-bucket contract); a regression raises.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCALE = 1000


def _check_params(alpha_num: int, alpha_den: int, z: int, warmup: int) -> int:
    """Validate params and return the per-params y ceiling (exclusive):
    the largest y with max(alpha_den, z²)·(y·S)² still inside BIGINT —
    see the module docstring's induction argument."""
    if not (0 < alpha_num < alpha_den <= 100):
        raise ValueError("alpha must be a proper fraction with den <= 100")
    if z < 1 or warmup < 1:
        raise ValueError("z and warmup must be >= 1")
    import math

    d_max = math.isqrt((2**63 - 1) // max(alpha_den, z * z))
    y_max = d_max // SCALE
    if y_max < 1000:
        raise ValueError(
            f"alpha_den/z leave y ceiling {y_max} < 1000 — choose a "
            "smaller den or z, or rescale the measure"
        )
    return y_max


def _fold_series(
    ys: list[int],
    alpha_num: int,
    alpha_den: int,
    z: int,
    warmup: int,
    state: tuple[int, int, int] = (0, 0, 0),
    y_max: int | None = None,
) -> tuple[list[int], list[int], list[bool], tuple[int, int, int]]:
    """THE recurrence — the batch twin and the streaming fold both call
    this (one definition, so stream==batch cannot drift).  ``state`` is
    (points_seen, level, var) from a prior call; returns the per-point
    post-update (levels, vars, flags) plus the advanced state."""
    if y_max is None:
        y_max = _check_params(alpha_num, alpha_den, z, warmup)
    levels: list[int] = []
    variances: list[int] = []
    flags: list[bool] = []
    idx, lev, var = state
    for y in ys:
        y = int(y)
        if y < 0 or y >= y_max:
            raise ValueError(f"ewma: y out of [0, {y_max}) — got {y}")
        idx += 1
        if idx == 1:
            lev, var, flag = y * SCALE, 0, False
        else:
            d = y * SCALE - lev
            flag = idx > warmup and var > 0 and d * d > z * z * var
            lev = (alpha_num * y * SCALE + (alpha_den - alpha_num) * lev) // alpha_den
            var = (alpha_num * d * d + (alpha_den - alpha_num) * var) // alpha_den
        levels.append(lev)
        variances.append(var)
        flags.append(flag)
    return levels, variances, flags, (idx, lev, var)


def ewma_anomaly(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    y_col: str,
    alpha_num: int = 1,
    alpha_den: int = 4,
    z: int = 3,
    warmup: int = 5,
) -> DataFrame:
    """Batch twin: fold each key's full (t-ordered) series.  Output
    (*key_cols, t, y, idx, level_milli, var_milli2, is_anomaly) with
    post-update state per point, idx 1-based in event order."""
    _check_params(alpha_num, alpha_den, z, warmup)
    keys = list(key_cols)
    src = df.select(
        *keys,
        F.col(t_col).cast("long").alias("t"),
        F.col(y_col).cast("long").alias("y"),
    )
    fields = [src.schema[k] for k in keys] + [
        StructField("t", LongType()),
        StructField("y", LongType()),
        StructField("idx", LongType()),
        StructField("level_milli", LongType()),
        StructField("var_milli2", LongType()),
        StructField("is_anomaly", BooleanType()),
    ]
    schema = StructType(fields)

    y_max = _check_params(alpha_num, alpha_den, z, warmup)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t").reset_index(drop=True)
        levels, variances, flags, _ = _fold_series(
            pdf["y"].tolist(), alpha_num, alpha_den, z, warmup,
            y_max=y_max,
        )
        out = pdf[keys + ["t", "y"]].copy()
        out["idx"] = range(1, len(pdf) + 1)
        out["level_milli"] = levels
        out["var_milli2"] = variances
        out["is_anomaly"] = flags
        return out

    return src.groupBy(*keys).applyInPandas(fold, schema=schema)


_STATE_SCHEMA = StructType(
    [
        StructField("idx", LongType()),
        StructField("level", LongType()),
        StructField("var", LongType()),
        StructField("t_last", LongType()),
    ]
)


def ewma_anomaly_stateful(
    stream: DataFrame,
    key_col: str,
    t_col: str,
    y_col: str,
    alpha_num: int = 1,
    alpha_den: int = 4,
    z: int = 3,
    warmup: int = 5,
) -> DataFrame:
    """Streaming maintenance of the identical recurrence: per-key
    (idx, level, var) folds across micro-batches; each batch emits its
    own rows with post-update state — stream output over in-order input
    equals the batch twin row for row.  Out-of-order arrival across
    batches raises (state cannot be rewound; bound late data with a
    watermarked interval agg upstream)."""
    y_max = _check_params(alpha_num, alpha_den, z, warmup)
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("t", LongType()),
            StructField("y", LongType()),
            StructField("idx", LongType()),
            StructField("level_milli", LongType()),
            StructField("var_milli2", LongType()),
            StructField("is_anomaly", BooleanType()),
        ]
    )

    def fold(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        idx0, lev, var, t_last = (
            state.get if state.exists else (0, 0, 0, None)
        )
        chunks = list(pdfs)
        whole = (
            pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        )
        if not len(whole):
            state.update((idx0, lev, var, t_last))
            return
        whole = whole.sort_values("t").reset_index(drop=True)
        if t_last is not None and int(whole["t"].iloc[0]) < t_last:
            raise ValueError(
                "ewma_anomaly_stateful: out-of-order arrival across batches"
            )
        ys = whole["y"].astype("int64").tolist()
        ts = whole["t"].astype("int64").tolist()
        levels, variances, flags, (idx0, lev, var) = _fold_series(
            ys, alpha_num, alpha_den, z, warmup,
            state=(idx0, lev, var), y_max=y_max,
        )
        state.update((idx0, lev, var, ts[-1]))
        out = pd.DataFrame(
            {
                "t": ts,
                "y": ys,
                "idx": list(range(idx0 - len(ys) + 1, idx0 + 1)),
                "level_milli": levels,
                "var_milli2": variances,
                "is_anomaly": flags,
            }
        )
        out.insert(0, "key", key[0])
        yield out

    return stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(t_col).cast("long").alias("t"),
        F.col(y_col).cast("long").alias("y"),
    ).groupBy("key").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_anomaly_oracle_sql(
    series_sql: str,
    key_cols: list[str],
    t_col: str,
    y_col: str,
    alpha_num: int = 1,
    alpha_den: int = 4,
    z: int = 3,
    warmup: int = 5,
) -> str:
    """DuckDB recursive-CTE replay of the integer recurrence."""
    keys = ", ".join(key_cols)
    bkeys = ", ".join(f"b.{k}" for k in key_cols)
    join_keys = " AND ".join(f"b.{k} = r.{k}" for k in key_cols)
    an, ad, s = alpha_num, alpha_den, SCALE
    return f"""
    WITH RECURSIVE base AS (
        SELECT {keys}, CAST({t_col} AS BIGINT) AS t,
               CAST({y_col} AS BIGINT) AS y,
               ROW_NUMBER() OVER (PARTITION BY {keys}
                                  ORDER BY {t_col}) AS idx
        FROM ({series_sql}) src
    ), rec AS (
        SELECT {keys}, t, y, idx,
               y * {s} AS level_milli,
               CAST(0 AS BIGINT) AS var_milli2,
               FALSE AS is_anomaly
        FROM base WHERE idx = 1
        UNION ALL
        SELECT {bkeys}, b.t, b.y, b.idx,
               ({an} * b.y * {s} + {ad - an} * r.level_milli) // {ad},
               ({an} * (b.y * {s} - r.level_milli)
                     * (b.y * {s} - r.level_milli)
                + {ad - an} * r.var_milli2) // {ad},
               b.idx > {warmup} AND r.var_milli2 > 0 AND
               (b.y * {s} - r.level_milli) * (b.y * {s} - r.level_milli)
                   > {z * z} * r.var_milli2
        FROM rec r JOIN base b ON {join_keys} AND b.idx = r.idx + 1
    )
    SELECT {keys}, t, y, idx, level_milli, var_milli2, is_anomaly
    FROM rec
    """
