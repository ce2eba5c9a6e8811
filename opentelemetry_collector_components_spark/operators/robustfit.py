"""Theil-Sen robust trend estimation over per-key series.

The outlier-proof alternative to least squares for "what's the real
trend of this metric?": the slope is the MEDIAN of all pairwise
slopes (Theil 1950 / Sen 1968, ~29% breakdown point), so a burst, a
bad deploy hour, or a collector gap cannot drag the line the way it
drags a mean-based fit.  Complements ``forecast.holt_forecast``
(recursive smoothing) and ``anomaly.py`` (point flags) with a single
interpretable rate + level per key.

Definition (lower-median convention, pinned for cross-engine
determinism): over the key's points sorted by x,

    slope     = lower median of (y_j - y_i) / (x_j - x_i), x_i < x_j
    intercept = lower median of (y_t - slope * x_t)

where "lower median" is the ascending element at 0-based index
``(n-1) div 2`` — an ORDER STATISTIC of exactly-computed doubles, so
DuckDB replays it with a rank selection over the identical pair join
(no float summation anywhere; IEEE division and multiplication agree
bit-for-bit across engines).

Scale shape: the one corpus-sized pass is the caller's upstream
aggregation; the fit runs per key via ``applyInPandas`` where the
pairwise slopes are a vectorized numpy triangle — O(T^2) doubles for
a T-point series, fine for the aggregated-series shapes this repo
feeds (a year of hourly points is 8,760 -> 38M pair slopes, ~300 MB
peak, one key's task).  Duplicate x within a key is rejected loudly
(slope undefined); keys with < 2 points are dropped.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def theil_sen(
    series: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key robust line: key_cols..., ``n_points``, ``slope``,
    ``intercept`` (doubles rounded to 4 dp on emission; the underlying
    order statistics are exact)."""
    key_fields = [series.schema[c] for c in key_cols]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in key_fields]
        + ["n_points long", "slope double", "intercept double"]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(x_col, kind="mergesort")
        xs = pdf[x_col].to_numpy(dtype="float64")
        ys = pdf[y_col].to_numpy(dtype="float64")
        keys = {c: pdf[c].iloc[0] for c in key_cols}
        n = len(xs)
        cols = [*key_cols, "n_points", "slope", "intercept"]
        if n < 2:
            return pd.DataFrame(columns=cols)
        if len(np.unique(xs)) != n:
            raise ValueError(
                f"duplicate x values within key {keys} — slope undefined;"
                " pre-aggregate to one point per x"
            )
        iu, ju = np.triu_indices(n, k=1)
        slopes = (ys[ju] - ys[iu]) / (xs[ju] - xs[iu])
        slopes.sort(kind="stable")
        slope = float(slopes[(len(slopes) - 1) // 2])
        resid = np.sort(ys - slope * xs, kind="stable")
        intercept = float(resid[(n - 1) // 2])
        return pd.DataFrame(
            [{**keys, "n_points": n, "slope": slope,
              "intercept": intercept}]
        )

    out = series.groupBy(*key_cols).applyInPandas(fit, out_schema)
    return out.select(
        *key_cols,
        "n_points",
        F.round("slope", 4).alias("slope"),
        F.round("intercept", 4).alias("intercept"),
    )


def theil_sen_oracle_sql(
    series_sql: str,
    key_cols: list[str],
    x_col: str,
    y_col: str,
) -> str:
    """DuckDB replay: pair join -> rank-selected lower median slope,
    then residual rank selection for the intercept."""
    keys = list(key_cols)
    kc = ", ".join(keys)
    return f"""
    WITH pts AS (
        SELECT {kc}, CAST({x_col} AS DOUBLE) AS x,
               CAST({y_col} AS DOUBLE) AS y
        FROM ({series_sql}) s
    ), slopes AS (
        SELECT {", ".join(f"a.{k}" for k in keys)},
               (b.y - a.y) / (b.x - a.x) AS sl
        FROM pts a JOIN pts b
          ON {" AND ".join(f"b.{k} = a.{k}" for k in keys)}
         AND a.x < b.x
    ), med AS (
        SELECT {kc}, sl AS slope FROM (
            SELECT {kc}, sl,
                   ROW_NUMBER() OVER (PARTITION BY {kc} ORDER BY sl)
                       AS rk,
                   COUNT(*) OVER (PARTITION BY {kc}) AS cnt
            FROM slopes
        ) r WHERE rk = (cnt - 1) // 2 + 1
    ), resid AS (
        SELECT {", ".join(f"p.{k}" for k in keys)},
               p.y - m.slope * p.x AS rv, m.slope
        FROM pts p JOIN med m
          ON {" AND ".join(f"m.{k} = p.{k}" for k in keys)}
    )
    SELECT {kc}, CAST(cnt AS BIGINT) AS n_points,
           ROUND(slope, 4) AS slope, ROUND(rv, 4) AS intercept
    FROM (
        SELECT {kc}, rv, slope,
               ROW_NUMBER() OVER (PARTITION BY {kc} ORDER BY rv) AS rk,
               COUNT(*) OVER (PARTITION BY {kc}) AS cnt
        FROM resid
    ) r WHERE rk = (cnt - 1) // 2 + 1
    """


def trimmed_stats(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    trim_num: int = 1,
    trim_den: int = 10,
) -> DataFrame:
    """Per-key trimmed and winsorized means — robust LOCATION beside
    ``theil_sen``'s robust TREND: a burst or a stuck counter cannot
    drag the reported level (classic use: per-host latency level
    reporting where one retry storm poisons the plain mean).

    Exact rule (pinned for cross-engine determinism): with n rows per
    key and trim fraction ``trim_num/trim_den`` per TAIL,

        k             = (n * trim_num) div trim_den      rows per tail
        trimmed mean  = sum(values at ranks k+1..n-k) / (n - 2k)
        winsorized    = (that sum + k*low + k*high) / n

    where low/high are the values at ranks k+1 and n-k (the clamp
    targets).  Ranks come from row_number over value — tie order among
    equal values cannot change any sum, so no tiebreaker is needed.
    Integer inputs stay exact: the BIGINT sums and counts are emitted
    beside the rounded means so gates hash integers.  Requires
    2*trim_num < trim_den (must keep at least the middle); keys of any
    size work (k floors to 0 when n is small).

    Output: (*key_cols, n BIGINT, k_tail BIGINT, trimmed_sum BIGINT,
    trimmed_n BIGINT, trimmed_mean DOUBLE 4dp, winsor_sum BIGINT,
    winsor_mean DOUBLE 4dp).

    Scale shape: one key-partitioned sort (rank + count share the
    window), one partial-aggregated groupBy.  The per-key sort is the
    honest cost of an order statistic — same contract as
    ``quantiles.exact_quantiles``.
    """
    from pyspark.sql.window import Window

    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not (trim_num >= 0 and 2 * trim_num < trim_den):
        raise ValueError(
            f"need 0 <= 2*trim_num < trim_den, got {trim_num}/{trim_den}"
        )
    v = F.col(value_col).cast("long")
    w = Window.partitionBy(*key_cols).orderBy(v)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = (
        df.withColumn("_rn", F.row_number().over(w).cast("long"))
        .withColumn("_n", F.count(F.lit(1)).over(full))
        .withColumn("_k", F.expr(f"(_n * {trim_num}) div {trim_den}"))
        .withColumn("_v", v)
    )
    mid = ranked.where(
        (F.col("_rn") > F.col("_k")) & (F.col("_rn") <= F.col("_n") - F.col("_k"))
    )
    agg = mid.groupBy(*key_cols).agg(
        F.max("_n").alias("n"),
        F.max("_k").alias("k_tail"),
        F.sum("_v").cast("long").alias("trimmed_sum"),
        F.count(F.lit(1)).cast("long").alias("trimmed_n"),
        F.min("_v").alias("_low"),
        F.max("_v").alias("_high"),
    )
    return agg.select(
        *key_cols,
        "n",
        "k_tail",
        "trimmed_sum",
        "trimmed_n",
        F.round(F.col("trimmed_sum") / F.col("trimmed_n"), 4).alias("trimmed_mean"),
        (
            F.col("trimmed_sum")
            + F.col("k_tail") * (F.col("_low") + F.col("_high"))
        )
        .cast("long")
        .alias("winsor_sum"),
        F.round(
            (
                F.col("trimmed_sum")
                + F.col("k_tail") * (F.col("_low") + F.col("_high"))
            )
            / F.col("n"),
            4,
        ).alias("winsor_mean"),
    )
