"""Single-scan table profiler: stats exactness, approx mode, NULL-only
columns, validation."""

from __future__ import annotations

import pytest

from opentelemetry_collector_components_spark.operators.profile import (
    profile_table,
)


def _frame(spark):
    rows = [
        (1, "a", 2.5),
        (2, "b", None),
        (3, "a", -1.25),
        (4, None, 0.0),
        (5, "c", 2.5),
    ]
    return spark.createDataFrame(rows, "id long, s string, x double")


def test_exact_profile_values(spark):
    got = {r.column: r for r in profile_table(_frame(spark), exact=True).collect()}
    assert set(got) == {"id", "s", "x"}
    i = got["id"]
    assert (i.n, i.nulls, i.distinct_n, i.min_num, i.max_num) == (5, 0, 5, 1.0, 5.0)
    assert i.min_str is None and i.max_str is None
    s = got["s"]
    assert (s.n, s.nulls, s.distinct_n, s.min_str, s.max_str) == (5, 1, 3, "a", "c")
    assert s.min_num is None
    x = got["x"]
    assert (x.nulls, x.distinct_n, x.min_num, x.max_num) == (1, 3, -1.25, 2.5)


def test_approx_mode_close_and_single_aggregate(spark):
    df = spark.range(50_000).selectExpr("id", "id % 1000 AS k")
    got = {r.column: r for r in profile_table(df, ["id", "k"]).collect()}
    assert abs(got["id"].distinct_n - 50_000) <= 2_500  # ~2% HLL RSE
    assert got["k"].distinct_n == pytest.approx(1000, rel=0.05)
    # default mode must not plan an Expand (the exact multi-DISTINCT shape)
    from pyspark.sql import functions as F

    aggs = [F.approx_count_distinct(c).alias(c) for c in ("id", "k")]
    plan = df.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_null_only_column_and_validation(spark):
    df = spark.createDataFrame([(None,), (None,)], "v string")
    r = profile_table(df, exact=True).collect()[0]
    assert (r.n, r.nulls, r.distinct_n, r.min_str, r.max_str) == (2, 2, 0, None, None)
    with pytest.raises(ValueError):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError):
        profile_table(df, [])
