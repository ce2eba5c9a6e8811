"""Experiment analysis: assignment determinism/proportions, SRM alarm on
a broken split, lift arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.experiment import (
    assign_variant,
    srm_check,
    variant_metrics,
)

W = {"A": 50, "B": 30, "C": 20}


def test_assignment_deterministic_and_proportional(spark):
    df = spark.range(20_000).select(F.col("id"))
    a = df.select("id", assign_variant(F.col("id"), "exp1", W).alias("v"))
    b = df.select("id", assign_variant(F.col("id"), "exp1", W).alias("v"))
    assert a.collect() == b.collect()
    counts = {r.v: r["count"] for r in a.groupBy("v").count().collect()}
    assert abs(counts["A"] - 10_000) < 500
    assert abs(counts["B"] - 6_000) < 500
    assert abs(counts["C"] - 4_000) < 400
    # different experiment name -> independent assignment
    c = df.select(assign_variant(F.col("id"), "exp2", W).alias("v2"))
    both = a.withColumn("v2", assign_variant(F.col("id"), "exp2", W))
    same = both.where(F.col("v") == F.col("v2")).count()
    frac = same / 20_000  # P(same) = 0.5^2+0.3^2+0.2^2 = 0.38
    assert abs(frac - 0.38) < 0.03
    with pytest.raises(ValueError):
        assign_variant(F.col("id"), "exp1", {"A": 0})


def test_srm_quiet_on_healthy_and_alarms_on_broken_split(spark):
    df = spark.range(20_000).select(
        F.col("id"), assign_variant(F.col("id"), "exp1", W).alias("v")
    )
    ok = srm_check(df, "id", "v", W).collect()[0]
    assert not ok.srm and ok.n_units == 20_000
    # drop 30% of variant A's units (a logging bug) -> SRM must fire
    broken = df.where((F.col("v") != "A") | (F.col("id") % 10 < 7))
    bad = srm_check(broken, "id", "v", W).collect()[0]
    assert bad.srm and bad.chi2 > 100
    with pytest.raises(ValueError):
        srm_check(df, "id", "v", {f"v{i}": 1 for i in range(9)})


def test_variant_metrics_lift(spark):
    rows = [(i, "A", 10.0) for i in range(100)] + [
        (i, "B", 12.0) for i in range(100, 180)
    ]
    df = spark.createDataFrame(rows, "u long, v string, x double")
    got = {
        r.variant: r for r in variant_metrics(df, "u", "v", "x", "A").collect()
    }
    assert got["A"].lift_pct == 0.0 and got["A"].value_mean == 10.0
    assert got["B"].lift_pct == 20.0 and got["B"].n_units == 80


def test_plans_are_jvm_only(spark):
    df = spark.range(100).select(
        F.col("id"), assign_variant(F.col("id"), "e", W).alias("v"),
        (F.col("id") % 7).cast("double").alias("x"),
    )
    for frame in (
        srm_check(df, "id", "v", W),
        variant_metrics(df, "id", "v", "x", "A"),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
