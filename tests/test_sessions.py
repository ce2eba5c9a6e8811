"""Sessionization: gap splitting, numbering, tie handling, stats."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.sessions import (
    _gap_micros,
    session_stats,
    sessionize,
)


@pytest.fixture(scope="module")
def events(spark):
    #       u1: 0s, 10s | (gap) | 100s, 105s   u2: 0s only
    rows = [
        (1, "u1", 0), (2, "u1", 10), (3, "u1", 100), (4, "u1", 105),
        (5, "u2", 0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id string, ts long"
    ).select("event_id", "user_id", F.timestamp_seconds("ts").alias("ts"))


def test_gap_splits_sessions(spark, events):
    out = {
        r["event_id"]: (r["session_id"], r["is_session_start"])
        for r in sessionize(
            events, ["user_id"], gap="1 minute", order_col="event_id"
        ).collect()
    }
    assert out == {
        1: (0, True), 2: (0, False), 3: (1, True), 4: (1, False),
        5: (0, True),
    }


def test_gap_boundary_is_strict_greater_than(spark, events):
    """u1's largest gap is exactly 90s (10s -> 100s): a 90s threshold does
    NOT split (strict >), an 89s threshold does."""
    at_threshold = {
        r["event_id"]: r["session_id"]
        for r in sessionize(
            events, ["user_id"], gap="90 seconds", order_col="event_id"
        ).collect()
    }
    assert at_threshold == {1: 0, 2: 0, 3: 0, 4: 0, 5: 0}
    below = {
        r["event_id"]: r["session_id"]
        for r in sessionize(
            events, ["user_id"], gap="89 seconds", order_col="event_id"
        ).collect()
    }
    assert below == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_session_stats(spark, events):
    stats = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["duration_us"])
        for r in session_stats(
            events, ["user_id"], gap="1 minute", order_col="event_id"
        ).collect()
    }
    assert stats == {
        ("u1", 0): (2, 10_000_000),
        ("u1", 1): (2, 5_000_000),
        ("u2", 0): (1, 0),
    }


def test_gap_parse():
    assert _gap_micros("30 minutes") == 1_800_000_000
    assert _gap_micros("1 hour") == 3_600_000_000
    with pytest.raises(ValueError, match="unsupported"):
        _gap_micros("3 fortnights")


def test_no_python_in_plan(spark, events):
    plan = (
        sessionize(events, ["user_id"], gap="1 minute")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_exact_gap_boundary_agrees_with_native_session_window(spark):
    """Review r4: the boundary claim must be EXERCISED, not assumed — and
    measurement showed the first documented claim was WRONG: Spark's
    native session_window also splits strictly on delta > gap (an event
    at exactly last + gap EXTENDS the session), agreeing with the
    lag-based sessionizer at the boundary and splitting one second
    past it."""

    def native_sessions(delta):
        ev = spark.createDataFrame(
            [(1, "u", 0), (2, "u", delta)],
            "event_id long, user_id string, t long",
        ).select("event_id", "user_id", F.timestamp_seconds("t").alias("ts"))
        return (
            ev.groupBy(F.session_window("ts", "10 minutes"), "user_id")
            .count()
            .count()
        )

    assert native_sessions(600) == 1   # delta == gap -> same session
    assert native_sessions(601) == 2   # strictly past the gap -> split

    ev = spark.createDataFrame(
        [(1, "u", 0), (2, "u", 600)], "event_id long, user_id string, t long"
    ).select("event_id", "user_id", F.timestamp_seconds("t").alias("ts"))
    ours = sessionize(ev, ["user_id"], gap="10 minutes", order_col="event_id")
    assert {r["session_id"] for r in ours.collect()} == {0}
