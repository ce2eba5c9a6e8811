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


def test_cuped_reduces_variance_and_preserves_global_mean(spark):
    import statistics

    from opentelemetry_collector_components_spark.operators.experiment import (
        cuped_adjust,
    )

    # y strongly correlated with pre-metric x; variant effect +2 on B
    rows = []
    for u in range(400):
        x = (u * 7) % 40
        v = "A" if u % 2 == 0 else "B"
        y = x * 2 + (u * 13) % 5 + (2 if v == "B" else 0)
        rows.append((u, v, y, x))
    df = spark.createDataFrame(rows, "u long, v string, y long, x long")
    got = {r.variant: r for r in cuped_adjust(df, "v", "y", "x").collect()}
    # adjusted difference still shows the true ~+2 effect
    diff = got["B"].mean_cuped - got["A"].mean_cuped
    assert abs(diff - 2.0) < 0.5
    # and the adjustment removed most covariate-driven spread: the raw
    # between-variant gap includes x imbalance, the adjusted one must be
    # at least as close to the true effect
    raw_diff = got["B"].mean_raw - got["A"].mean_raw
    assert abs(diff - 2.0) <= abs(raw_diff - 2.0) + 1e-9
    # theta ~ 2 (the true slope)
    assert abs(got["A"].theta - 2.0) < 0.2

    # per-unit adjusted values have lower variance than raw y
    t = got["A"].theta
    xs = [r[3] for r in rows]
    xbar = sum(xs) / len(xs)
    raw_var = statistics.pvariance([r[2] for r in rows])
    adj_var = statistics.pvariance([r[2] - t * (r[3] - xbar) for r in rows])
    assert adj_var < 0.2 * raw_var


def test_cuped_degenerate_covariate_is_noop(spark):
    from opentelemetry_collector_components_spark.operators.experiment import (
        cuped_adjust,
    )

    df = spark.createDataFrame(
        [(1, "A", 5, 3), (2, "A", 7, 3), (3, "B", 6, 3)],
        "u long, v string, y long, x long",
    )
    got = {r.variant: r for r in cuped_adjust(df, "v", "y", "x").collect()}
    assert got["A"].theta == 0.0
    assert got["A"].mean_cuped == got["A"].mean_raw == 6.0


def test_lift_ci_brackets_a_real_effect_and_zero_effect(spark):
    from opentelemetry_collector_components_spark.operators.experiment import (
        lift_ci,
    )

    # treatment lifts y by ~25% on 2000 units per arm
    rows = []
    for u in range(4000):
        v = "A" if u % 2 == 0 else "B"
        base = 4 + (u * 13) % 5  # 4..8
        y = base + (1 if v == "B" else 0)  # ~+16-20% lift
        rows.append((u, v, y))
    df = spark.createDataFrame(rows, "u long, v string, y long")
    ci = {r.q: r.lift_pct for r in lift_ci(df, "u", "v", "y", "A", "B").collect()}
    assert ci[0.025] < ci[0.5] < ci[0.975]
    assert ci[0.025] > 5 and ci[0.975] < 35  # excludes zero, brackets truth

    # zero-effect experiment: interval must bracket 0
    null_rows = [(u, "A" if u % 2 == 0 else "B", 4 + (u * 13) % 5) for u in range(4000)]
    df0 = spark.createDataFrame(null_rows, "u long, v string, y long")
    ci0 = {r.q: r.lift_pct for r in lift_ci(df0, "u", "v", "y", "A", "B").collect()}
    assert ci0[0.025] < 0 < ci0[0.975]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        lift_ci(df, "u", "v", "y", "A", "B", b=1)


def test_did_hand_computed(spark):
    """treat pre mean 10, post 14 (+4); control pre 20, post 21 (+1):
    did = +3 exactly."""
    from opentelemetry_collector_components_spark.operators.experiment import (
        diff_in_diff,
    )

    rows = (
        [("t", "pre", 9), ("t", "pre", 11), ("t", "post", 13), ("t", "post", 15)]
        + [("c", "pre", 19), ("c", "pre", 21), ("c", "post", 20), ("c", "post", 22)]
    )
    df = spark.createDataFrame(rows, "v string, p string, y long")
    r = diff_in_diff(df, "v", "p", "y", "t", "c", "pre", "post").collect()[0]
    assert (r["n_tpre"], r["n_tpost"], r["n_cpre"], r["n_cpost"]) == (2, 2, 2, 2)
    assert r["did_ppm"] == 3_000_000
    assert r["se_ppm"] > 0 and r["z_ppm"] > 0


def test_did_shared_trend_nets_out(spark):
    """Both arms +5 pre->post: did = 0 even though post-only lift is
    huge — the whole point of the estimator."""
    from opentelemetry_collector_components_spark.operators.experiment import (
        diff_in_diff,
    )

    rows = []
    for i in range(20):
        rows += [("t", "pre", 10 + i % 3), ("t", "post", 15 + i % 3),
                 ("c", "pre", 30 + i % 3), ("c", "post", 35 + i % 3)]
    df = spark.createDataFrame(rows, "v string, p string, y long")
    r = diff_in_diff(df, "v", "p", "y", "t", "c", "pre", "post").collect()[0]
    # floor-of-float quantization: a true zero effect may land at -1 ppm
    assert r["did_ppm"] in (-1, 0)


def test_did_degenerate_cells_null(spark):
    from opentelemetry_collector_components_spark.operators.experiment import (
        diff_in_diff,
    )

    rows = [("t", "pre", 1), ("t", "post", 2), ("t", "post", 3),
            ("c", "pre", 4), ("c", "pre", 5), ("c", "post", 6), ("c", "post", 7)]
    # t/pre has a single row -> all readouts NULL
    df = spark.createDataFrame(rows, "v string, p string, y long")
    r = diff_in_diff(df, "v", "p", "y", "t", "c", "pre", "post").collect()[0]
    assert r["did_ppm"] is None and r["se_ppm"] is None and r["z_ppm"] is None


def test_did_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.experiment import (
        diff_in_diff,
        diff_in_diff_oracle_sql,
    )

    rows = []
    for i in range(60):
        rows.append((f"k{i % 2}", "t" if i % 2 else "c",
                     "post" if i % 3 else "pre", (i * 7) % 13))
    df = spark.createDataFrame(rows, "k string, v string, p string, y long")
    got = sorted(map(tuple, diff_in_diff(
        df, "v", "p", "y", "t", "c", "pre", "post", ["k"]).collect()))
    values = ", ".join(f"('{k}', '{v}', '{p}', {y})" for k, v, p, y in rows)
    sql = diff_in_diff_oracle_sql(
        f"SELECT * FROM (VALUES {values}) v(k, v, p, y)",
        "CASE WHEN v = 't' THEN 1 WHEN v = 'c' THEN 0 END",
        "CASE WHEN p = 'post' THEN 1 WHEN p = 'pre' THEN 0 END",
        "y",
        ["k"],
    )
    def norm(row):
        return tuple(
            int(x) if x is not None and not isinstance(x, str) else x
            for x in row
        )

    want = sorted(norm(row) for row in duckdb.connect().execute(sql).fetchall())
    got_n = [norm(r) for r in got]
    assert got_n == want


def test_bh_fdr_hand_computed(spark):
    """Classic BH walk at q=0.05 with m=5: p = (0.001, 0.012, 0.03,
    0.04, 0.9) -> thresholds k*q/m = (0.01, 0.02, 0.03, 0.04, 0.05):
    ranks 1..4 satisfy, k*=4, reject the four small p's (note rank 2's
    0.012 < 0.02 and rank 3 exactly at 0.03).  Bonferroni only rejects
    p <= 0.01."""
    from opentelemetry_collector_components_spark.operators.experiment import (
        bh_fdr,
    )

    ps = [1000, 12000, 30000, 40000, 900000]
    df = spark.createDataFrame([(f"h{i}", p) for i, p in enumerate(ps)],
                               "h string, p long")
    out = {r["h"]: r for r in bh_fdr(df, "p", 50_000).collect()}
    assert [out[f"h{i}"]["rejected"] for i in range(5)] == [
        True, True, True, True, False
    ]
    assert [out[f"h{i}"]["bonferroni"] for i in range(5)] == [
        True, False, False, False, False
    ]


def test_bh_fdr_ties_share_verdict_and_keys_partition(spark):
    from opentelemetry_collector_components_spark.operators.experiment import (
        bh_fdr,
    )

    rows = [("a", "h1", 20000), ("a", "h2", 20000), ("a", "h3", 900000),
            ("b", "h4", 20000)]
    df = spark.createDataFrame(rows, "fam string, h string, p long")
    out = {(r["fam"], r["h"]): r["rejected"]
           for r in bh_fdr(df, "p", 50_000, ["fam"]).collect()}
    # family a: m=3, tied p=0.02: rank-2 threshold 2*0.05/3=0.0333 holds,
    # so BOTH ties reject (tie-safe p-threshold form)
    assert out[("a", "h1")] and out[("a", "h2")] and not out[("a", "h3")]
    # family b: m=1, p=0.02 <= 0.05
    assert out[("b", "h4")]
    import pytest as _pytest

    with _pytest.raises(Exception):
        bh_fdr(df, "p", 0)
    bad = spark.createDataFrame([("x", 2_000_000)], "h string, p long")
    with _pytest.raises(Exception):
        bh_fdr(bad, "p").collect()


def test_bh_fdr_matches_reference(spark):
    """Against a direct Python replay of the BH procedure."""
    from opentelemetry_collector_components_spark.operators.experiment import (
        bh_fdr,
    )

    ps = [((i * 7919) % 997) * 1000 for i in range(60)]  # spread, some dups
    df = spark.createDataFrame([(f"h{i}", p) for i, p in enumerate(ps)],
                               "h string, p long")
    out = {r["h"]: r["rejected"] for r in bh_fdr(df, "p", 100_000).collect()}
    m = len(ps)
    s = sorted(ps)
    pstar = max((p for k, p in enumerate(s, 1) if p * m <= k * 100_000),
                default=None)
    for i, p in enumerate(ps):
        assert out[f"h{i}"] == (pstar is not None and p <= pstar), (i, p, pstar)


def test_bh_fdr_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.experiment import (
        bh_fdr,
        bh_fdr_oracle_sql,
    )

    rows = [(f"f{i % 2}", f"h{i}", ((i * 37) % 29) * 30000) for i in range(30)]
    df = spark.createDataFrame(rows, "fam string, h string, p long")
    got = sorted(map(tuple, bh_fdr(df, "p", 80_000, ["fam"]).collect()))
    values = ", ".join(f"('{f}', '{h}', {p})" for f, h, p in rows)
    sql = bh_fdr_oracle_sql(
        f"SELECT * FROM (VALUES {values}) v(fam, h, p)", "p", 80_000, ["fam"]
    )
    want = sorted(
        tuple(int(x) if isinstance(x, int) and not isinstance(x, bool) else x
              for x in row)
        for row in duckdb.connect().execute(sql).fetchall()
    )
    assert got == want


def test_did_value_cap_and_cell_headroom_guard(spark):
    import pytest as _pytest

    from opentelemetry_collector_components_spark.operators.experiment import (
        diff_in_diff,
    )

    big = spark.createDataFrame(
        [("t", "pre", 2_000_000), ("t", "post", 1), ("c", "pre", 1),
         ("c", "post", 1)],
        "v string, p string, y long",
    )
    with _pytest.raises(Exception, match="y_cap"):
        diff_in_diff(big, "v", "p", "y", "t", "c", "pre", "post").collect()
    with _pytest.raises(ValueError):
        diff_in_diff(big, "v", "p", "y", "t", "c", "pre", "post", y_cap=0)


def test_bh_fdr_reserved_name_collision_raises(spark):
    import pytest as _pytest

    from opentelemetry_collector_components_spark.operators.experiment import (
        bh_fdr,
    )

    df = spark.createDataFrame([("h", 1000, 5)], "h string, p long, m long")
    with _pytest.raises(ValueError, match="collide"):
        bh_fdr(df, "p")
