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


# ---------------------------------------------------------------------------
# DDSketch
# ---------------------------------------------------------------------------
def _values(spark):
    # deterministic positive long-tail-ish values over 2 keys x 3 days
    rows = [
        (k, f"d{1 + i % 3}", float(1 + (i * 37 + k * 11) % 997) ** 1.5)
        for k in range(2)
        for i in range(600)
    ]
    return spark.createDataFrame(rows, "k int, day string, v double")


def test_ddsketch_relative_error_bound(spark):
    from opentelemetry_collector_components_spark.operators.sketches import (
        ddsketch_build,
        ddsketch_merge,
        ddsketch_quantiles,
    )

    df = _values(spark)
    alpha = 0.01
    sk = ddsketch_merge(ddsketch_build(df, ["k", "day"], "v", alpha), ["k"])
    got = {
        (r.k, r.q): r.est
        for r in ddsketch_quantiles(sk, ["k"], [0.5, 0.9, 0.99], alpha).collect()
    }
    rows = df.collect()
    for k in range(2):
        vals = sorted(r.v for r in rows if r.k == k)
        for q in (0.5, 0.9, 0.99):
            true = vals[int(1 + q * (len(vals) - 1)) - 1]  # rank floor(1+q(n-1))
            est = got[(k, q)]
            assert abs(est - true) <= alpha * true * 1.0001, (k, q, est, true)


def test_ddsketch_merge_equals_rebuild(spark):
    from opentelemetry_collector_components_spark.operators.sketches import (
        ddsketch_build,
        ddsketch_merge,
    )

    df = _values(spark)
    merged = ddsketch_merge(ddsketch_build(df, ["k", "day"], "v"), ["k"])
    rebuilt = ddsketch_build(df, ["k"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_ddsketch_ignores_nonpositive_and_validates_alpha(spark):
    from opentelemetry_collector_components_spark.operators.sketches import (
        ddsketch_build,
    )

    df = spark.createDataFrame(
        [(1, -5.0), (1, 0.0), (1, None), (1, 10.0)], "k int, v double"
    )
    assert ddsketch_build(df, ["k"], "v").agg(F.sum("n")).collect()[0][0] == 1
    with pytest.raises(ValueError):
        ddsketch_build(df, ["k"], "v", alpha=1.5)


def test_ddsketch_plan_is_jvm_only(spark):
    from opentelemetry_collector_components_spark.operators.sketches import (
        ddsketch_build,
        ddsketch_quantiles,
    )

    df = _values(spark)
    plan = (
        ddsketch_quantiles(ddsketch_build(df, ["k"], "v"), ["k"], [0.5])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------
def test_cm_estimate_never_underestimates_and_is_tight_when_wide(spark):
    from opentelemetry_collector_components_spark.operators.sketches import (
        cm_estimate,
        cm_merge,
        cm_sketch_build,
    )

    # zipf-ish: item i appears (40 - i) times
    rows = [(f"d{1 + i % 2}", f"item{i}") for i in range(40) for _ in range(40 - i)]
    df = spark.createDataFrame(rows, "day string, item string")
    exact = df.groupBy("item").agg(F.count(F.lit(1)).alias("exact_n"))

    merged = cm_merge(cm_sketch_build(df, ["day"], "item", width=64, depth=4), [])
    est = cm_estimate(merged, exact, "item", width=64, depth=4).collect()
    assert all(r.cm_n >= r.exact_n for r in est)  # CM never underestimates

    wide = cm_merge(cm_sketch_build(df, ["day"], "item", width=4096, depth=4), [])
    est_w = cm_estimate(wide, exact, "item", width=4096, depth=4).collect()
    assert all(r.cm_n == r.exact_n for r in est_w)  # no collisions when wide


def test_cm_merge_equals_rebuild_and_unseen_is_zero(spark):
    from opentelemetry_collector_components_spark.operators.sketches import (
        cm_estimate,
        cm_merge,
        cm_sketch_build,
    )

    rows = [(f"d{i % 3}", f"u{i % 7}") for i in range(210)]
    df = spark.createDataFrame(rows, "day string, item string")
    merged = cm_merge(cm_sketch_build(df, ["day"], "item", width=512), [])
    rebuilt = cm_sketch_build(df.withColumn("g", F.lit(1)), ["g"], "item", width=512)
    assert sorted((r.r, r.c, r.n) for r in merged.collect()) == sorted(
        (r.r, r.c, r.n) for r in rebuilt.collect()
    )
    probe = spark.createDataFrame([("never-seen-item-xyz",)], "item string")
    got = cm_estimate(merged, probe, "item", width=512).collect()
    assert got[0].cm_n == 0

    with pytest.raises(ValueError):
        cm_sketch_build(df, ["day"], "item", width=0)


def test_cm_plan_is_jvm_only_and_broadcasts_probes(spark):
    from opentelemetry_collector_components_spark.operators.sketches import (
        cm_estimate,
        cm_merge,
        cm_sketch_build,
    )

    rows = [("d", f"u{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "day string, item string")
    merged = cm_merge(cm_sketch_build(df, ["day"], "item"), [])
    probe = df.select("item").distinct().limit(5)
    plan = (
        cm_estimate(merged, probe, "item")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# HLL intersection
# ---------------------------------------------------------------------------
def test_hll_intersection_inclusion_exclusion(spark):
    from opentelemetry_collector_components_spark.operators.sketches import (
        hll_intersection_estimate,
        sketch_distinct,
    )

    ev = _events(spark)
    per_day = sketch_distinct(ev, ["day"], "user")
    a = per_day.where("day = 'd1'").select(F.col("hll_sketch").alias("ha"))
    b = per_day.where("day = 'd2'").select(F.col("hll_sketch").alias("hb"))
    got = (
        a.crossJoin(b)
        .select(hll_intersection_estimate("ha", "hb").alias("e"))
        .collect()[0]
        .e
    )
    assert got == 20  # d1 ∩ d2 = users 20..39, exact at this cardinality


# ---------------------------------------------------------------------------
# CountSketch: join-size / F2 estimation
# ---------------------------------------------------------------------------
def _two_sides(spark):
    # f_A: item i appears (i+1) times for i in 0..19; f_B: 2 per even item
    a = spark.createDataFrame(
        [(f"k{i}",) for i in range(20) for _ in range(i + 1)], "item string"
    )
    b = spark.createDataFrame(
        [(f"k{i}",) for i in range(0, 20, 2) for _ in range(2)], "item string"
    )
    true_join = sum((i + 1) * 2 for i in range(0, 20, 2))
    return a, b, true_join


def test_cs_inner_product_exact_when_wide(spark):
    from opentelemetry_collector_components_spark.operators.sketches import (
        cs_inner_product,
        cs_sketch_build,
    )

    a, b, true_join = _two_sides(spark)
    # width >> items: no collisions, signs cancel pairwise -> EXACT
    sa = cs_sketch_build(a, [], "item", width=65536, depth=5)
    sb = cs_sketch_build(b, [], "item", width=65536, depth=5)
    est = cs_inner_product(sa, sb).collect()[0].join_size_est
    assert est == true_join
    # F2 (self-join size) likewise exact when wide
    f2 = cs_inner_product(sa, sa).collect()[0].join_size_est
    assert f2 == sum((i + 1) ** 2 for i in range(20))


def test_cs_estimate_close_when_narrow_and_merge_rebuild(spark):
    from opentelemetry_collector_components_spark.operators.sketches import (
        cs_inner_product,
        cs_merge,
        cs_sketch_build,
    )

    import pytest as _pytest

    a, b, true_join = _two_sides(spark)
    sa = cs_sketch_build(a, [], "item", width=32, depth=5)
    sb = cs_sketch_build(b, [], "item", width=32, depth=5)
    est = cs_inner_product(sa, sb).collect()[0].join_size_est
    assert abs(est - true_join) <= 0.5 * true_join  # collisions bounded

    # linearity: per-item sketches merge (cell-wise add) to the whole
    whole = cs_sketch_build(a, [], "item", width=64, depth=3)
    merged = cs_merge(
        cs_sketch_build(a, ["item"], "item", width=64, depth=3), []
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    with _pytest.raises(ValueError):
        cs_sketch_build(a, [], "item", width=32, depth=4)  # even depth
