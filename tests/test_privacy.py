"""Privacy operators: suppression exactness, diversity filter, DP noise
distribution and determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.privacy import (
    dp_counts,
    generalize_num,
    k_anonymize,
    k_anonymous_groups,
    l_diverse_groups,
    laplace_noise,
)


def _people(spark):
    rows = (
        [("nyc", 30, "flu")] * 5
        + [("nyc", 30, "cold")] * 3
        + [("sf", 40, "flu")] * 2  # small group -> suppressed at k=3
        + [("la", 50, "flu")] * 4  # k-anonymous but sensitive-constant
    )
    return spark.createDataFrame(rows, "city string, age int, dx string")


def test_k_anonymize_suppresses_small_groups(spark):
    df = _people(spark)
    kept = k_anonymize(df, ["city", "age"], 3)
    got = {(r.city, r.age) for r in kept.collect()}
    assert got == {("nyc", 30), ("la", 50)}
    assert kept.count() == 12  # sf rows suppressed, others intact
    groups = {
        (r.city, r.n) for r in k_anonymous_groups(df, ["city"], 3).collect()
    }
    assert groups == {("nyc", 8), ("la", 4)}
    with pytest.raises(ValueError):
        k_anonymize(df, ["city"], 1)


def test_l_diversity_drops_constant_sensitive_groups(spark):
    df = _people(spark)
    ok = l_diverse_groups(df, ["city", "age"], "dx", 2).collect()
    assert [(r.city, r.sensitive_distinct) for r in ok] == [("nyc", 2)]
    with pytest.raises(ValueError):
        l_diverse_groups(df, ["city"], "dx", 1)


def test_generalize_num_labels(spark):
    df = spark.createDataFrame([(0,), (24,), (25,), (99,)], "v int")
    got = [r.g for r in df.select(generalize_num(F.col("v"), 25).alias("g")).collect()]
    assert got == ["[0,25)", "[0,25)", "[25,50)", "[75,100)"]
    with pytest.raises(ValueError):
        generalize_num(F.col("v"), 0)


def test_laplace_noise_distribution_and_determinism(spark):
    df = spark.range(20_000).select(F.col("id").cast("string").alias("k"))
    b = 2.0
    noise = df.select(laplace_noise(F.col("k"), b).alias("x"))
    stats = noise.agg(
        F.avg("x").alias("mean"),
        F.avg(F.abs("x")).alias("mad"),
        F.max(F.abs("x")).alias("mx"),
    ).collect()[0]
    assert abs(stats.mean) < 0.1  # symmetric around 0
    assert abs(stats.mad - b) < 0.1  # E|Laplace(b)| = b
    assert stats.mx > 4 * b  # heavy tails actually occur
    # deterministic: same seed -> identical draws; different seed -> not
    a = noise.collect()
    c = df.select(laplace_noise(F.col("k"), b).alias("x")).collect()
    d = df.select(laplace_noise(F.col("k"), b, seed=8).alias("x")).collect()
    assert a == c and a != d


def test_dp_counts_clamped_rounded_and_close(spark):
    df = spark.createDataFrame(
        [(f"g{i % 4}",) for i in range(4000)], "g string"
    )
    out = {r.g: r.dp_n for r in dp_counts(df, ["g"], epsilon=0.5).collect()}
    for g, v in out.items():
        assert v >= 0 and abs(v - 1000) < 50  # eps=0.5 -> b=2, tight at n=1000
        assert round(v, 4) == v
    with pytest.raises(ValueError):
        dp_counts(df, ["g"], epsilon=0)


def test_plans_are_jvm_only(spark):
    df = _people(spark)
    for frame in (
        k_anonymize(df, ["city", "age"], 3),
        dp_counts(df, ["city"], epsilon=1.0),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
