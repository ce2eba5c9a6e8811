"""KMV bottom-k distinct sketch: exact-below-k, estimator arithmetic,
merge-equals-rebuild, set algebra on planted overlaps, validation, and
JVM-only plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.kmv import (
    _HASH_SPACE,
    kmv_build,
    kmv_estimate,
    kmv_merge,
    kmv_set_stats,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def test_exact_below_k_and_null_excluded(spark):
    df = spark.createDataFrame(
        [("a", v) for v in range(10)] * 3 + [("a", None)], "g string, v: long"
    )
    sk = kmv_build(df, ["g"], "v", 64)
    row = sk.select(F.size("sig").alias("n"), kmv_estimate("sig", 64).alias("e")).collect()[0]
    assert row.n == 10 and row.e == 10  # exact when the sketch never fills


def test_estimator_formula_replay(spark):
    # force a full sketch, then recompute (k-1)*2^60 // h_k in Python
    df = _df(spark, [("a", v) for v in range(5000)])
    k = 32
    sk = kmv_build(df, ["g"], "v", k)
    row = sk.select("sig", kmv_estimate("sig", k).alias("e")).collect()[0]
    assert len(row.sig) == k and row.sig == sorted(row.sig)
    assert row.e == ((k - 1) * _HASH_SPACE) // row.sig[k - 1]
    # accuracy envelope: 1/sqrt(k) ~ 18%; allow 3 sigma
    assert abs(row.e - 5000) / 5000 < 0.55


def test_merge_equals_rebuild(spark):
    df = _df(spark, [("a", v) for v in range(2000)] + [("b", v) for v in range(500)])
    whole = kmv_build(df.drop("g").withColumn("g", F.lit("all")), ["g"], "v", 64)
    parts = kmv_build(df, ["g"], "v", 64).withColumn("g", F.lit("all"))
    merged = kmv_merge(parts, ["g"], 64)
    assert (
        merged.join(whole.withColumnRenamed("sig", "s2"), "g")
        .where(F.expr("sig <> s2"))
        .count()
        == 0
    )


def test_set_stats_planted_overlap(spark):
    # identical sets -> jaccard 1, disjoint small sets -> exact everything
    a = kmv_build(_df(spark, [("same", v) for v in range(30)] + [("disj", v) for v in range(10)]), ["g"], "v", 64)
    b = kmv_build(_df(spark, [("same", v) for v in range(30)] + [("disj", v) for v in range(100, 110)]), ["g"], "v", 64)
    got = {r.g: r for r in kmv_set_stats(a, b, ["g"], 64).collect()}
    s = got["same"]
    assert (s.union_est, s.sketch_size, s.inter_hits) == (30, 30, 30)
    assert s.jaccard_micro == 1_000_000 and s.inter_est == 30
    d = got["disj"]
    assert (d.union_est, d.inter_hits, d.jaccard_micro, d.inter_est) == (20, 0, 0, 0)


def test_set_stats_half_overlap_exact_region(spark):
    # below k everything is exact: |A|=40, |B|=40, |A∩B|=20 -> J = 20/60
    a = kmv_build(_df(spark, [("g", v) for v in range(40)]), ["g"], "v", 128)
    b = kmv_build(_df(spark, [("g", v) for v in range(20, 60)]), ["g"], "v", 128)
    r = kmv_set_stats(a, b, ["g"], 128).collect()[0]
    assert (r.union_est, r.sketch_size, r.inter_hits) == (60, 60, 20)
    assert r.jaccard_micro == 20 * 1_000_000 // 60 and r.inter_est == 20


def test_validation(spark):
    df = _df(spark, [("a", 1)])
    with pytest.raises(ValueError, match="k must be"):
        kmv_build(df, ["g"], "v", 1)
    with pytest.raises(ValueError, match="group_cols"):
        kmv_build(df, [], "v", 8)
    with pytest.raises(ValueError, match="k must be"):
        kmv_set_stats(df, df, ["g"], 1)


def test_jvm_only_plans(spark):
    df = _df(spark, [("a", v) for v in range(100)])
    sk = kmv_build(df, ["g"], "v", 16)
    plan = kmv_set_stats(sk, sk, ["g"], 16)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
