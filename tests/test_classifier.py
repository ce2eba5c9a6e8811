from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.classifier import (
    MICRO,
    score_logreg_quantized,
    train_logreg_quantized,
    weights_table,
)


def _separable(spark, n=400):
    """y = 1 iff x1 > 0 with x1 centered in [-49, 50]: linearly separable
    through the origin, so full-batch GD must push w[x1] positive and the
    residuals saturate toward zero instead of oscillating."""
    return spark.range(n).select(
        (F.col("id") % 100 + 1 - 50).cast("int").alias("x1"),
        F.lit(1).alias("bias"),
        ((F.col("id") % 100 + 1 - 50) > 0).cast("int").alias("y"),
    )


def test_train_moves_weights_toward_separator(spark):
    df = _separable(spark)
    w = train_logreg_quantized(df, "y", ["bias", "x1"], iterations=4, lr_inv=200)
    # positive class has larger x1 -> its weight must turn positive
    assert w["x1"] > 0
    scored = score_logreg_quantized(df, w, ["y"])
    # accuracy must beat the majority-class baseline on separable data
    acc = (
        scored.where(F.col("predicted") == F.col("y")).count() / df.count()
    )
    assert acc > 0.9


def test_train_partition_invariant(spark):
    """Integer gradients are exactly associative: identical weights out
    of 1-partition and 8-partition layouts, bit for bit."""
    df = _separable(spark)
    w1 = train_logreg_quantized(df.repartition(1), "y", ["bias", "x1"], 3, 100)
    w8 = train_logreg_quantized(df.repartition(8), "y", ["bias", "x1"], 3, 100)
    assert w1 == w8


def test_score_shapes_and_threshold(spark):
    df = _separable(spark, n=50)
    w = {"bias": -1_000_000, "x1": 0}
    out = score_logreg_quantized(df, w, ["y"]).collect()
    for r in out:
        assert r["score_micro"] == -1_000_000
        # sigmoid(-1) ~ 0.26894 -> floored micro units
        assert r["prob_micro"] == 268941
        assert r["predicted"] == 0
    wt = weights_table(df, w)
    assert {r["feature"]: r["weight_micro"] for r in wt.collect()} == w


def test_train_validations(spark):
    df = _separable(spark, n=10)
    with pytest.raises(ValueError):
        train_logreg_quantized(df, "y", [], 3, 100)
    with pytest.raises(ValueError):
        train_logreg_quantized(df, "y", ["x1"], 0, 100)
    with pytest.raises(ValueError):
        train_logreg_quantized(df.where(F.lit(False)), "y", ["x1"], 1, 100)
    # NULL label/feature rows would silently vanish from the gradient sum
    # while counting in n — must raise, not shrink the step
    nulled = df.withColumn(
        "x1", F.when(F.col("x1") == -49, F.lit(None)).otherwise(F.col("x1"))
    )
    with pytest.raises(ValueError, match="NULL"):
        train_logreg_quantized(nulled, "y", ["bias", "x1"], 1, 100)
    assert MICRO == 1_000_000


def test_train_plan_stays_jvm(spark):
    """The per-iteration aggregation must be pure JVM (no Python eval in
    the plan) and must partial-aggregate before the reduce."""
    df = _separable(spark)
    z = F.lit(7) * F.col("x1").cast("long")
    explained = df.agg(F.sum(z).alias("g"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in explained
    assert "partial" in explained.lower() or "HashAggregate" in explained
