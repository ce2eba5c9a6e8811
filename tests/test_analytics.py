from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.analytics import (
    cohort_retention,
    funnel_stages,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id int, ts string, event_type string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")


def test_funnel_first_touch_ordering(spark):
    df = _events(
        spark,
        [
            # u1 completes the funnel in order
            (1, "2024-01-01 10:00:00", "a"),
            (1, "2024-01-01 11:00:00", "b"),
            (1, "2024-01-01 12:00:00", "c"),
            # u2: b BEFORE a -> never reaches stage 2 (first-touch anchors
            # at the earliest a; the only b precedes it)
            (2, "2024-01-01 11:00:00", "b"),
            (2, "2024-01-01 12:00:00", "a"),
            # u3: a then b, but c at exactly b's time -> strict > excludes
            (3, "2024-01-01 10:00:00", "a"),
            (3, "2024-01-01 11:00:00", "b"),
            (3, "2024-01-01 11:00:00", "c"),
            # u4: only stage 1
            (4, "2024-01-01 10:00:00", "a"),
        ],
    )
    out = {r["stage_name"]: r["users"] for r in funnel_stages(df, "user_id", "ts", "event_type", ["a", "b", "c"]).collect()}
    assert out == {"a": 4, "b": 2, "c": 1}


def test_funnel_earliest_anchor_maximizes_later_stages(spark):
    """u1 has two 'a' events; the SECOND 'a' is after the only 'b', but
    first-touch anchors at the first 'a', so 'b' still qualifies."""
    df = _events(
        spark,
        [
            (1, "2024-01-01 10:00:00", "a"),
            (1, "2024-01-01 11:00:00", "b"),
            (1, "2024-01-01 12:00:00", "a"),
        ],
    )
    out = {r["stage_name"]: r["users"] for r in funnel_stages(df, "user_id", "ts", "event_type", ["a", "b"]).collect()}
    assert out == {"a": 1, "b": 1}


def test_funnel_validations(spark):
    df = _events(spark, [(1, "2024-01-01 10:00:00", "a")])
    with pytest.raises(ValueError):
        funnel_stages(df, "user_id", "ts", "event_type", ["a"])
    with pytest.raises(ValueError):
        funnel_stages(df, "user_id", "ts", "event_type", ["a", "a"])


def test_cohort_retention_grid(spark):
    df = _events(
        spark,
        [
            # u1 first active week of Jan 1 (Mon), returns week +1 and +3
            (1, "2024-01-02 10:00:00", "x"),
            (1, "2024-01-09 10:00:00", "x"),
            (1, "2024-01-23 10:00:00", "x"),
            # u2 same cohort, never returns
            (2, "2024-01-03 10:00:00", "x"),
            # u3 cohort week of Jan 8, returns week +1
            (3, "2024-01-10 10:00:00", "x"),
            (3, "2024-01-15 10:00:00", "x"),
        ],
    )
    out = {
        (str(r["cohort_week"]), r["week_offset"]): r["users"]
        for r in cohort_retention(df, "user_id", "ts").collect()
    }
    assert out == {
        ("2024-01-01 00:00:00", 0): 2,
        ("2024-01-01 00:00:00", 1): 1,
        ("2024-01-01 00:00:00", 3): 1,
        ("2024-01-08 00:00:00", 0): 1,
        ("2024-01-08 00:00:00", 1): 1,
    }
