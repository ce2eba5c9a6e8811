"""Benford first-digit audit: the data-forensics smoke test.

Naturally occurring multiplicative quantities (transaction amounts,
file sizes, populations) follow Benford's law — leading digit d with
probability ``log10(1 + 1/d)``.  Fabricated or truncated data rarely
does, which makes the first-digit histogram a standard fraud /
data-quality screen (auditing practice since Nigrini 1996).  The
operator reports per-digit observed counts against the Benford
expectation with a per-digit chi-square contribution; judging the
total against a threshold is the caller's policy choice.

Digit extraction is string-based — the first ``[1-9]`` character of
the value's decimal rendering — deliberately avoiding ``log10``
boundary rounding.  Contract: values must be positive and inside the
plain-decimal rendering range (~1e-4 .. 1e16 — outside it engines
switch to scientific notation and the extraction is undefined);
filter first.  The expected probabilities inline as integer ppm
literals (computed once in Python), so the only float arithmetic is
one per-row chi-square expression — no cross-row float summation, so
results are deterministic and engine-exact under the repo's 4 dp
rounding.

Scale shape: one scan-fused digit projection + one 9-row groupBy.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BENFORD_PPM = {
    d: round(math.log10(1.0 + 1.0 / d) * 1_000_000) for d in range(1, 10)
}


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """(digit, obs, total, exp_ppm, chi2) per leading digit 1-9 —
    digits with zero observations still appear (their expected mass is
    exactly what the chi-square must count)."""
    digit = F.regexp_extract(
        F.col(value_col).cast("string"), "([1-9])", 1
    ).cast("int")
    obs = (
        df.where(F.col(value_col).isNotNull() & (F.col(value_col) > 0))
        .select(digit.alias("digit"))
        .where(F.col("digit").isNotNull() & (F.col("digit") >= 1))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    spark = df.sparkSession
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    exp_map = F.create_map(
        *[x for d, p in BENFORD_PPM.items() for x in (F.lit(d), F.lit(p))]
    )
    total = obs.agg(F.sum("obs").alias("total"))
    out = (
        digits.join(obs, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("obs", F.lit(0).cast("long")).alias("obs"),
            F.col("total").cast("long").alias("total"),
            exp_map[F.col("digit")].cast("long").alias("exp_ppm"),
        )
    )
    # per-row expression only — no float aggregation anywhere
    expected = F.col("total") * F.col("exp_ppm") / F.lit(1_000_000.0)
    chi2 = (F.col("obs") - expected) * (F.col("obs") - expected) / expected
    return out.withColumn("chi2", F.round(chi2, 4))
