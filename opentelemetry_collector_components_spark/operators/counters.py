"""Counter calculus + histogram quantile — the PromQL-semantics surface.

The prometheusremotewrite path (S5/K2) moves cumulative counters and
bucket histograms; these operators implement what consumers DO with them,
per the public PromQL semantics:

- ``counter_increase`` / ``counter_rate``: per-sample delta over a
  monotonic counter with RESET detection — a counter that goes down was
  restarted, so the new value IS the increase since the reset (PromQL's
  extrapolation-free core rule).  Two lag() windows on one key-partitioned
  shuffle, whole-stage codegen.
- ``histogram_quantile``: linear interpolation inside the first cumulative
  bucket reaching q x total, from explicit finite bounds + an overflow
  bucket (PromQL ``histogram_quantile``: returns the highest finite bound
  when the quantile lands in +Inf, NULL on an empty histogram).  Pure
  column expression over a dense counts array — bounds are literals, the
  chained conditionals stay in codegen.

Scale shape: rate is a per-key ordered scan (keys parallelize, the usual
hot-key caveat); quantile is a narrow map over pre-aggregated bucket rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def counter_increase(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = None,
) -> DataFrame:
    """Adds ``increase`` (NULL for each key's first sample) and
    ``dt_us`` since the previous sample."""
    order = [F.col(ts_col).asc()] + ([F.col(order_col).asc()] if order_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_v = F.lag(F.col(value_col)).over(w)
    prev_us = F.lag(us).over(w)
    increase = F.when(prev_v.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(F.col(value_col) >= prev_v, F.col(value_col) - prev_v).otherwise(
            # counter reset: restarted from 0, so the whole new value
            # accrued since the previous sample
            F.col(value_col)
        )
    )
    return df.withColumn("increase", increase).withColumn("dt_us", us - prev_us)


def counter_rate(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = None,
) -> DataFrame:
    """``counter_increase`` plus ``rate`` = increase per second; NULL when
    there is no previous sample or the gap is zero (try_divide)."""
    out = counter_increase(df, key_cols, ts_col, value_col, order_col)
    return out.withColumn(
        "rate", F.try_divide(F.col("increase"), F.col("dt_us") / 1_000_000.0)
    )


def histogram_quantile(
    q: float, counts: Column, bounds: list[float]
) -> Column:
    """Quantile from a dense bucket-counts array (len(bounds) + 1 entries,
    last = overflow beyond the highest finite bound).

    Bucket i (1-based) covers [bounds[i-2] or 0, bounds[i-1]); the target
    rank q*total lands in the first bucket whose cumulative count reaches
    it, and interpolates linearly inside that bucket.  Overflow -> the
    highest finite bound (the PromQL rule); empty histogram -> NULL."""
    if not 0 < q <= 1:
        raise ValueError("q must be in (0, 1]")
    if not bounds:
        raise ValueError("bounds must be a non-empty list of finite bounds")
    k = len(bounds)
    total = F.aggregate(counts, F.lit(0.0), lambda a, x: a + x)
    target = F.lit(q) * total
    expr = None
    cum_prev = F.lit(0.0)
    for i in range(1, k + 1):
        # carry the previous bucket's cumulative instead of re-aggregating
        # the prefix — one slice-sum per bucket, not two
        cum_i = F.aggregate(F.slice(counts, 1, i), F.lit(0.0), lambda a, x: a + x)
        lo = F.lit(0.0) if i == 1 else F.lit(float(bounds[i - 2]))
        hi = F.lit(float(bounds[i - 1]))
        val = lo + (hi - lo) * F.try_divide(
            target - cum_prev, F.element_at(counts, i).cast("double")
        )
        cond = cum_i >= target
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
        cum_prev = cum_i
    quantile = expr.otherwise(F.lit(float(bounds[-1])))
    # a mis-sized counts array means the caller's bucket layout drifted
    # from the bounds — fail the job loudly rather than emit silent NULLs
    return F.when(
        F.size(counts) != k + 1,
        F.raise_error(
            F.lit(f"histogram_quantile: counts must have {k + 1} entries")
        ).cast("double"),
    ).otherwise(F.when(total > 0, quantile))
