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


def test_t_close_categorical_hand_computed(spark):
    """Global: x=4, y=4 (p=1/2 each).  Group A all-x: D = 1/2*(|1-1/2| +
    |0-1/2|) = 1/2.  Group B balanced: D = 0."""
    from opentelemetry_collector_components_spark.operators.privacy import (
        t_close_groups,
    )

    rows = [("A", "x")] * 4 + [("B", "x")] * 0 + [("B", "y")] * 4
    # rebalance: A all-x (4), B all-y (4) -> both distance 1/2
    df = spark.createDataFrame(rows, "qi string, s string")
    out = {r["qi"]: r for r in t_close_groups(df, ["qi"], "s", 400_000).collect()}
    assert out["A"]["d_ppm"] == 500_000 and not out["A"]["t_close"]
    rows2 = [("A", "x"), ("A", "y"), ("B", "x"), ("B", "y")]
    df2 = spark.createDataFrame(rows2, "qi string, s string")
    out2 = {r["qi"]: r for r in t_close_groups(df2, ["qi"], "s", 0).collect()}
    assert out2["A"]["d_ppm"] == 0 and out2["A"]["t_close"]
    assert out2["B"]["d_ppm"] == 0 and out2["B"]["t_close"]


def test_t_close_absent_value_mass_counted(spark):
    """A group missing a sensitive value entirely must still pay that
    value's global mass: global x:2 y:1 z:1, group A = {x,x} ->
    D = 1/2*(|1-1/2| + 1/4 + 1/4) = 1/2."""
    from opentelemetry_collector_components_spark.operators.privacy import (
        t_close_groups,
    )

    rows = [("A", "x"), ("A", "x"), ("B", "y"), ("B", "z")]
    df = spark.createDataFrame(rows, "qi string, s string")
    out = {r["qi"]: r for r in t_close_groups(df, ["qi"], "s", 500_000).collect()}
    assert out["A"]["d_ppm"] == 500_000 and out["A"]["t_close"]


def test_t_close_null_is_a_category(spark):
    from opentelemetry_collector_components_spark.operators.privacy import (
        t_close_groups,
    )

    rows = [("A", None), ("A", None), ("B", "y"), ("B", "y")]
    df = spark.createDataFrame(rows, "qi string, s string")
    out = {r["qi"]: r for r in t_close_groups(df, ["qi"], "s", 999_999).collect()}
    assert out["A"]["d_ppm"] == 500_000


def test_t_close_ordered_emd(spark):
    """Ordered domain {1,2,3} uniform globally; group A = {1,1}:
    cum diffs (per-unit p_g - p): (2/3... exact: c*N - C*ng with N=6,
    ng=2, C=2 each: cum1 = 2*6-2*2 = 8, cum2 = 8 + (0-4) = 4, cum3 = 0;
    num = 12, den = (3-1)*2*6 = 24 -> D = 1/2."""
    from opentelemetry_collector_components_spark.operators.privacy import (
        t_close_groups,
    )

    rows = [("A", 1), ("A", 1), ("B", 2), ("B", 3), ("C", 2), ("C", 3)]
    df = spark.createDataFrame(rows, "qi string, s long")
    out = {r["qi"]: r for r in t_close_groups(
        df, ["qi"], "s", 500_000, ordered=True).collect()}
    assert out["A"]["d_ppm"] == 500_000 and out["A"]["t_close"]
    # single-value global domain degenerates to 0
    one = spark.createDataFrame([("A", 5), ("B", 5)], "qi string, s long")
    o1 = t_close_groups(one, ["qi"], "s", 0, ordered=True).collect()
    assert all(r["d_ppm"] == 0 and r["t_close"] for r in o1)


def test_t_close_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.privacy import (
        t_close_groups,
        t_close_oracle_sql,
    )

    rows = [(f"g{i % 5}", f"v{(i * 7) % 4}") for i in range(60)]
    df = spark.createDataFrame(rows, "qi string, s string")
    got = sorted(map(tuple, t_close_groups(df, ["qi"], "s", 150_000).collect()))
    values = ", ".join(f"('{q}', '{v}')" for q, v in rows)
    sql = t_close_oracle_sql(
        f"SELECT * FROM (VALUES {values}) v(qi, s)", ["qi"], "s", 150_000
    )
    want = sorted(
        (q, int(n), int(d), bool(t))
        for q, n, d, t in duckdb.connect().execute(sql).fetchall()
    )
    assert got == want
    # ordered variant parity
    rows_o = [(f"g{i % 4}", (i * 3) % 5) for i in range(40)]
    dfo = spark.createDataFrame(rows_o, "qi string, s long")
    got_o = sorted(map(tuple, t_close_groups(
        dfo, ["qi"], "s", 200_000, ordered=True).collect()))
    values_o = ", ".join(f"('{q}', {v})" for q, v in rows_o)
    sql_o = t_close_oracle_sql(
        f"SELECT * FROM (VALUES {values_o}) v(qi, s)", ["qi"], "s",
        200_000, ordered=True,
    )
    want_o = sorted(
        (q, int(n), int(d), bool(t))
        for q, n, d, t in duckdb.connect().execute(sql_o).fetchall()
    )
    assert got_o == want_o
