"""Poisson bootstrap: confidence intervals for corpus statistics at scale.

A corpus metric (mean document length, dedup rate, quality-score mean)
is a point estimate; shipping it without an uncertainty band invites
over-reading week-over-week wiggles.  The classical bootstrap resamples
n-out-of-n — impossible to coordinate across partitions — but the POISSON
bootstrap (Hanley & MacGibbon 2006; the standard large-scale variant,
e.g. bag-of-little-bootstraps literature) replaces multinomial resampling
with an independent Poisson(1) weight per (row, replica): no global n
needed, every weight computable scan-side, replicas aggregated in ONE
grouped pass.

Determinism: the weight is the inverse-CDF of Poisson(1) evaluated at a
uniform derived from the repo's cross-engine md5 hash — the CDF steps are
precomputed as INTEGER thresholds against the raw 60-bit hash, and each
replica mean is a ratio of exact integer sums, so every replica statistic
(and therefore the CI itself) replays bit-identically in any SQL engine:
no RNG state, no float-summation-order flake.

Scale shape: replicas explode B-fold scan-side and collapse immediately
into B partial-aggregated rows; the CI walk runs over those B rows with a
join-based rank (no window).  Cost = B x one aggregation pass; B = 64
gives ±1 rank granularity at the 2.5 % tails.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO60 = 1 << 60


def poisson1_thresholds(max_k: int = 6) -> list[int]:
    """Integer CDF steps of Poisson(λ=1) scaled to the 60-bit hash space:
    a hash h gets weight = #{k : h >= T_k} (weights capped at ``max_k``;
    P(X > 6) ≈ 8e-5 — negligible and documented)."""
    cdf = 0.0
    out = []
    for k in range(max_k):
        cdf += math.exp(-1.0) / math.factorial(k)
        out.append(min(_TWO60 - 1, int(cdf * _TWO60)))
    return out


def replica_weight(id_col: Column, rep: Column, seed: int = 7) -> Column:
    """Poisson(1) weight for (row, replica): exact integer comparisons of
    the md5 hash against precomputed CDF thresholds."""
    from ..functions.textstats import md5_hash60

    h = md5_hash60(
        F.concat(
            id_col.cast("string"), F.lit(f":bs{seed}:"), rep.cast("string")
        )
    )
    terms = [
        F.when(h >= F.lit(t), 1).otherwise(0) for t in poisson1_thresholds()
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("int")


def bootstrap_means(
    df: DataFrame,
    id_col: str,
    value_col: str,
    b: int = 64,
    seed: int = 7,
) -> DataFrame:
    """One weighted mean per replica: ``(rep INT, mean DOUBLE)`` where
    ``mean = Σ(w·x) / Σ(w)`` over EXACT integer sums (value must be
    integral; cast upstream or scale to fixed-point first), rounded to
    4 dp.  Empty replicas (all-zero weights — vanishing probability for
    any real corpus) yield NULL and are dropped."""
    if b < 2:
        raise ValueError("b must be >= 2")
    rep = F.explode(F.array([F.lit(i) for i in range(b)])).alias("rep")
    w = replica_weight(F.col(id_col), F.col("rep"), seed)
    return (
        df.select(F.col(id_col), F.col(value_col).cast("long").alias("_x"), rep)
        .withColumn("_w", w)
        .groupBy("rep")
        .agg(
            F.sum(F.col("_w").cast("long") * F.col("_x")).alias("_wx"),
            F.sum("_w").alias("_sw"),
        )
        .where(F.col("_sw") > 0)
        .select(
            "rep",
            F.round(F.col("_wx").cast("double") / F.col("_sw"), 4).alias("mean"),
        )
    )


def bootstrap_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    b: int = 64,
    qs: tuple[float, ...] = (0.025, 0.5, 0.975),
    seed: int = 7,
) -> DataFrame:
    """Percentile-bootstrap quantiles of the mean: ``(q DOUBLE, value
    DOUBLE)`` — the q-th order statistic (0-based rank floor(q·(B−1)),
    ties broken by replica id) of the B replica means.  Join-based rank
    over the B-row frame; no window, no collect."""
    means = bootstrap_means(df, id_col, value_col, b, seed)
    other = means.select(
        F.col("rep").alias("_rep2"), F.col("mean").alias("_mean2")
    )
    ranked = (
        means.join(
            F.broadcast(other),
            (F.col("_mean2") < F.col("mean"))
            | ((F.col("_mean2") == F.col("mean")) & (F.col("_rep2") < F.col("rep"))),
            "left",
        )
        .groupBy("rep", "mean")
        .agg(F.count("_rep2").alias("_rank"))
    )
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(float(q), int(math.floor(q * (b - 1)))) for q in qs],
        "q double, _target long",
    )
    return (
        ranked.join(F.broadcast(qdf), F.col("_rank") == F.col("_target"))
        .select("q", F.col("mean").alias("value"))
    )
