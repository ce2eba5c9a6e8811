"""Distribution-free confidence intervals on quantiles.

The companion to a p95/p99 latency readout: the point estimate without
its uncertainty is noise near the tail.  The order-statistic interval
(classic nonparametric CI; Woodruff 1952 form with the large-sample
normal approximation to the Binomial(n, q) rank distribution) brackets
the true q-quantile between two DATA VALUES:

    s = sqrt(n*q*(1-q))          (rank standard deviation)
    lo rank  l = clamp(floor(n*q - z*s),     1, n)
    point    k = clamp(ceil(q*n),            1, n)   (quantile_disc rank)
    hi rank  u = clamp(ceil(n*q + z*s) + 1,  1, n)

No distributional assumption on the VALUES — only the binomial count of
observations below the quantile, which the normal approximation serves
well past a few hundred rows (the regime this operator exists for; at
tiny n, bootstrap instead).

Scale shape: ONE count, then all three order statistics resolve through
``quantiles.exact_quantiles`` in a SHARED iterative-narrowing job
(bounded memory, no global sort — the histogram rounds serve every
requested rank at once).  Driver holds four scalars.

Cross-engine determinism: l/k/u derive from one double expression tree
evaluated identically in Python and the DuckDB oracle (sqrt is
IEEE-correctly-rounded in both), and the interval endpoints are actual
data values, so the gate matches exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .quantiles import exact_quantiles


def normal_z(conf: float) -> float:
    """Two-sided z for a ``conf`` interval via Acklam's rational
    approximation of the normal PPF (|rel err| < 1.15e-9 — far inside
    the rank-rounding granularity it feeds)."""
    if not 0.0 < conf < 1.0:
        raise ValueError("conf must be in (0, 1)")
    p = 1.0 - (1.0 - conf) / 2.0
    # Acklam 2003 coefficients (public domain)
    a = (-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00)
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0]*q+c[1])*q+c[2])*q+c[3])*q+c[4])*q+c[5]) / \
               ((((d[0]*q+d[1])*q+d[2])*q+d[3])*q+1)
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0]*q+c[1])*q+c[2])*q+c[3])*q+c[4])*q+c[5]) / \
               ((((d[0]*q+d[1])*q+d[2])*q+d[3])*q+1)
    q = p - 0.5
    r = q * q
    return (((((a[0]*r+a[1])*r+a[2])*r+a[3])*r+a[4])*r+a[5])*q / \
           (((((b[0]*r+b[1])*r+b[2])*r+b[3])*r+b[4])*r+1)


def ci_ranks(n: int, q: float, z: float) -> tuple[int, int, int]:
    """(lo, point, hi) 1-based ranks — the shared definition the oracle
    replays textually."""
    s = math.sqrt(n * q * (1.0 - q))
    lo = max(1, min(n, math.floor(n * q - z * s)))
    point = max(1, min(n, math.ceil(q * n)))
    hi = max(1, min(n, math.ceil(n * q + z * s) + 1))
    return lo, point, hi


def quantile_ci(
    df: DataFrame,
    value_col: str,
    q: float,
    z: float,
    round_to: int = 4,
) -> DataFrame:
    """One-row readout: (q, n, lo, point, hi) with the three order
    statistics resolved in one shared bounded-memory selection job.
    Pass ``z = normal_z(conf)`` (or an explicit literal when the gate
    needs a reproducible constant)."""
    if not 0.0 < q < 1.0:
        raise ValueError("q must be in (0, 1)")
    vals = df.select(F.col(value_col).alias("v")).where(F.col("v").isNotNull())
    n = vals.count()
    if n == 0:
        raise ValueError(f"no non-null values in {value_col!r}")
    lo, point, hi = ci_ranks(n, q, z)
    qs = sorted({(r - 0.5) / n for r in (lo, point, hi)})
    got = {
        row["quantile"]: row["value"]
        for row in exact_quantiles(vals, "v", qs).collect()
    }
    pick = lambda r: got[(r - 0.5) / n]  # noqa: E731
    one = df.sparkSession.range(1)
    return one.select(
        F.lit(float(q)).alias("q"),
        F.lit(n).cast("long").alias("n"),
        F.round(F.lit(pick(lo)), round_to).alias("lo"),
        F.round(F.lit(pick(point)), round_to).alias("point"),
        F.round(F.lit(pick(hi)), round_to).alias("hi"),
    )
