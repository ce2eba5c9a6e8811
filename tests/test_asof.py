"""As-of join semantics: both implementations, tie handling, left-join."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.asof import (
    asof_join_range,
    asof_join_union,
)


@pytest.fixture(scope="module")
def tables(spark):
    events = spark.createDataFrame(
        [
            (1, "u1", 100),
            (2, "u1", 150),   # between versions
            (3, "u1", 200),   # exactly at version 2's instant (tie)
            (4, "u1", 50),    # before any version
            (5, "u2", 500),   # key with no versions at all
        ],
        "event_id long, user_id string, ts long",
    ).select("event_id", "user_id", F.timestamp_seconds("ts").alias("ts"))
    dims = spark.createDataFrame(
        [("u1", 100, "a"), ("u1", 200, "b")],
        "user_id string, dim_ts long, tier string",
    ).select("user_id", F.timestamp_seconds("dim_ts").alias("dim_ts"), "tier")
    return events, dims


EXPECTED = {1: "a", 2: "a", 3: "b", 4: None, 5: None}


@pytest.mark.parametrize("impl", [asof_join_range, asof_join_union])
def test_asof_semantics(spark, tables, impl):
    events, dims = tables
    got = {
        r["event_id"]: r["tier"]
        for r in impl(events, dims, ["user_id"], ts_col="ts").collect()
    }
    assert got == EXPECTED


def test_both_forms_agree_on_random_data(spark):
    ev = spark.range(500).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("u"), F.pmod("id", F.lit(7))).alias("user_id"),
        F.timestamp_seconds(F.pmod(F.col("id") * 131, F.lit(10000))).alias("ts"),
    )
    dims = spark.range(40).select(
        F.concat(F.lit("u"), F.pmod("id", F.lit(7))).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 251 % 10000).alias("dim_ts"),
        F.concat(F.lit("v"), F.col("id")).alias("tier"),
    ).groupBy("user_id", "dim_ts").agg(F.min("tier").alias("tier"))
    a = sorted(
        (r["event_id"], r["tier"])
        for r in asof_join_range(ev, dims, ["user_id"], ts_col="ts").collect()
    )
    b = sorted(
        (r["event_id"], r["tier"])
        for r in asof_join_union(ev, dims, ["user_id"], ts_col="ts").collect()
    )
    assert a == b


def test_no_python_in_plan(spark, tables):
    events, dims = tables
    for impl in (asof_join_range, asof_join_union):
        plan = (
            impl(events, dims, ["user_id"], ts_col="ts")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan


def test_null_attribute_version_propagates(spark):
    """Review r4: a version that legitimately sets an attribute to NULL
    must yield NULL (not a stale older value) in BOTH forms, and versions
    stay atomic across multiple attributes."""
    events = spark.createDataFrame(
        [(1, "u1", 250)], "event_id long, user_id string, ts long"
    ).select("event_id", "user_id", F.timestamp_seconds("ts").alias("ts"))
    dims = spark.createDataFrame(
        [("u1", 100, "a", "x"), ("u1", 200, None, "y")],
        "user_id string, dim_ts long, tier string, plan string",
    ).select(
        "user_id", F.timestamp_seconds("dim_ts").alias("dim_ts"), "tier", "plan"
    )
    for impl in (asof_join_range, asof_join_union):
        r = impl(events, dims, ["user_id"], ts_col="ts").collect()[0]
        assert (r["tier"], r["plan"]) == (None, "y"), impl.__name__
