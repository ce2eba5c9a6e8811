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
