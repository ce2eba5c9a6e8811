"""Poisson bootstrap: weight distribution, determinism, CI sanity and
n-scaling of interval width."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.bootstrap import (
    bootstrap_ci,
    bootstrap_means,
    poisson1_thresholds,
    replica_weight,
)

_TWO60 = 1 << 60


def test_thresholds_are_poisson1_cdf_steps():
    ts = poisson1_thresholds()
    assert ts == sorted(ts) and len(ts) == 6
    import math

    e = math.exp(-1)
    assert abs(ts[0] / _TWO60 - e) < 1e-12  # P(0)
    assert abs(ts[1] / _TWO60 - 2 * e) < 1e-12  # P(<=1)


def test_weights_distribute_like_poisson1(spark):
    df = spark.range(20_000).select(F.col("id"), F.lit(0).alias("rep"))
    w = df.select(
        replica_weight(F.col("id"), F.col("rep")).alias("w")
    ).groupBy("w").count().collect()
    counts = {r.w: r["count"] for r in w}
    n = sum(counts.values())
    assert abs(counts.get(0, 0) / n - 0.3679) < 0.02
    assert abs(counts.get(1, 0) / n - 0.3679) < 0.02
    mean = sum(k * v for k, v in counts.items()) / n
    assert abs(mean - 1.0) < 0.02


def test_replica_means_deterministic_and_complete(spark):
    df = spark.range(500).select(F.col("id"), (F.col("id") % 97).alias("x"))
    a = sorted(map(tuple, bootstrap_means(df, "id", "x", b=16).collect()))
    b = sorted(map(tuple, bootstrap_means(df, "id", "x", b=16).collect()))
    assert a == b and len(a) == 16
    with pytest.raises(ValueError):
        bootstrap_means(df, "id", "x", b=1)


def test_ci_brackets_truth_and_narrows_with_n(spark):
    def ci(n):
        df = spark.range(n).select(F.col("id"), (F.col("id") % 101).alias("x"))
        rows = {r.q: r.value for r in bootstrap_ci(df, "id", "x", b=64).collect()}
        return rows

    small, big = ci(300), ci(8000)
    for rows in (small, big):
        assert rows[0.025] <= rows[0.5] <= rows[0.975]
    # true mean of x = id % 101 is ~50 for n >> 101
    assert small[0.025] < 50.5 < small[0.975]
    assert big[0.025] < 50.1 < big[0.975]
    # interval width shrinks roughly like 1/sqrt(n)
    assert (big[0.975] - big[0.025]) < 0.5 * (small[0.975] - small[0.025])


def test_plan_is_jvm_only(spark):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("x"))
    plan = (
        bootstrap_ci(df, "id", "x", b=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
