"""Mergeable HLL sketch columns: build/merge/estimate round trips,
merge-equals-rebuild, JVM-only plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.sketches import (
    estimate,
    merge_sketches,
    sketch_distinct,
)


def _events(spark):
    # 3 days x overlapping user sets; per-day and global distincts known
    rows = [
        ("d1", u) for u in range(0, 40)
    ] + [
        ("d2", u) for u in range(20, 70)
    ] + [
        ("d3", u) for u in range(60, 80)
    ]
    return spark.createDataFrame(rows * 3, "day string, user long")  # dup rows


def test_estimates_match_exact_at_small_cardinality(spark):
    ev = _events(spark)
    daily = sketch_distinct(ev, ["day"], "user")
    got = {
        r.day: r.est
        for r in daily.select("day", estimate("hll_sketch").alias("est")).collect()
    }
    assert got == {"d1": 40, "d2": 50, "d3": 20}


def test_merge_equals_rebuild_on_union(spark):
    ev = _events(spark)
    daily = sketch_distinct(ev, ["day"], "user")
    merged = merge_sketches(daily, [])
    est = merged.select(estimate("hll_sketch").alias("e")).collect()[0].e
    assert est == 80  # distinct over all days, via sketch merge only
    # merging a subset: d1+d2 overlap 20..39
    sub = merge_sketches(daily.where(F.col("day") != "d3"), [])
    assert sub.select(estimate("hll_sketch").alias("e")).collect()[0].e == 70


def test_lgk_bounds_and_plan(spark):
    ev = _events(spark)
    with pytest.raises(ValueError):
        sketch_distinct(ev, ["day"], "user", lgk=3)
    plan = (
        sketch_distinct(ev, ["day"], "user")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_estimate_within_tolerance_at_high_cardinality(spark):
    # 200k distinct values: well past the sparse-exact regime, so this
    # exercises the real HLL estimator; lgK=12 -> ~1.6% RSE, assert the
    # 5% bound the hll_distinct_users gate claims
    df = spark.range(200_000).select((F.col("id") % 5).alias("k"), "id")
    est = {
        r.k: r.est
        for r in sketch_distinct(df, ["k"], "id")
        .select("k", estimate("hll_sketch").alias("est"))
        .collect()
    }
    for k, e in est.items():
        assert abs(e - 40_000) <= 2_000, (k, e)
    merged = merge_sketches(sketch_distinct(df, ["k"], "id"), [])
    total = merged.select(estimate("hll_sketch").alias("e")).collect()[0].e
    assert abs(total - 200_000) <= 10_000
