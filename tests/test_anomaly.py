"""Seasonal hour-of-day anomaly: same-clock-hour baselines flag the
planted spike, not the ordinary diurnal swing."""

from __future__ import annotations


# ---------------------------------------------------------------------------
# seasonal hour-of-day anomaly
# ---------------------------------------------------------------------------
def test_seasonal_anomaly_flags_only_the_planted_spike(spark):
    from datetime import datetime, timedelta

    from opentelemetry_collector_components_spark.operators.anomaly import (
        seasonal_hour_anomaly,
    )

    t0 = datetime(2024, 6, 1, 0, 0, 0)
    rows = []
    # 7 days: 3 AM always has 2 rows, 15:00 always has 10 rows (diurnal
    # swing a global detector would flag) ... except day 5's 3 AM has 12
    # rows (6x its OWN baseline -> the real anomaly)
    for d in range(7):
        n3 = 12 if d == 5 else 2
        for i in range(n3):
            rows.append(("svc", t0 + timedelta(days=d, hours=3, minutes=i)))
        for i in range(10):
            rows.append(("svc", t0 + timedelta(days=d, hours=15, minutes=i)))
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = seasonal_hour_anomaly(df, ["k"], "ts", threshold_pct=300).collect()
    flagged = [(r.hour_ts, r.hod, r.n) for r in out if r.anomalous]
    assert flagged == [(t0 + timedelta(days=5, hours=3), 3, 12)]
    # the busy-but-normal 15:00 hours never flag (baseline is their own)
    assert all(not r.anomalous for r in out if r.hod == 15)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        seasonal_hour_anomaly(df, ["k"], "ts", threshold_pct=0)


def test_seasonal_anomaly_plan_is_jvm_only(spark):
    from datetime import datetime

    from opentelemetry_collector_components_spark.operators.anomaly import (
        seasonal_hour_anomaly,
    )

    df = spark.createDataFrame(
        [("k", datetime(2024, 6, 1, 1, 0))], "k string, ts timestamp"
    )
    plan = (
        seasonal_hour_anomaly(df, ["k"], "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# changepoint_locate
# ---------------------------------------------------------------------------
def test_changepoint_planted_step(spark):
    from opentelemetry_collector_components_spark.operators.anomaly import (
        changepoint_locate,
    )

    # level 10 for 6 points, then level 30 for 6: split after index 6
    rows = [("a", i, 10 if i <= 6 else 30) for i in range(1, 13)]
    df = spark.createDataFrame(rows, ["k", "w", "v"])
    got = changepoint_locate(df, ["k"], "w", "v").collect()[0]
    assert (got["split_at"], got["split_idx"]) == (6, 6)
    assert got["mean_before"] == 10.0 and got["mean_after"] == 30.0
    assert got["shift"] == 20.0
    # c_max = |n*S(t) - t*S| at t=6: |12*60 - 6*240| = 720
    assert got["c_max"] == 720


def test_changepoint_python_reference_and_tie_break(spark):
    import random

    from opentelemetry_collector_components_spark.operators.anomaly import (
        changepoint_locate,
    )

    rng = random.Random(3)
    rows = [("x", i, rng.randint(0, 40)) for i in range(1, 40)]
    df = spark.createDataFrame(rows, ["k", "w", "v"])
    got = changepoint_locate(df, ["k"], "w", "v").collect()[0]

    vals = [v for _, _, v in rows]
    n, s = len(vals), sum(vals)
    best = max(
        ((abs(n * sum(vals[:t]) - t * s), -t) for t in range(1, n)),
    )
    assert got["c_max"] == best[0] and got["split_idx"] == -best[1]

    # constant series: every C(t) = 0 -> earliest split wins, shift 0
    const = spark.createDataFrame([("c", i, 5) for i in range(1, 6)], ["k", "w", "v"])
    row = changepoint_locate(const, ["k"], "w", "v").collect()[0]
    assert (row["split_idx"], row["c_max"], row["shift"]) == (1, 0, 0.0)


def test_changepoint_single_point_key_absent(spark):
    from opentelemetry_collector_components_spark.operators.anomaly import (
        changepoint_locate,
    )

    df = spark.createDataFrame(
        [("one", 1, 7), ("two", 1, 3), ("two", 2, 9)], ["k", "w", "v"]
    )
    out = {r["k"]: r for r in changepoint_locate(df, ["k"], "w", "v").collect()}
    assert set(out) == {"two"}  # single-point key emits no row


def test_changepoint_partitioned_plan(spark):
    from opentelemetry_collector_components_spark.operators.anomaly import (
        changepoint_locate,
    )

    df = spark.createDataFrame([("a", 1, 1), ("a", 2, 2)], ["k", "w", "v"])
    out = changepoint_locate(df, ["k"], "w", "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # every Window must be key-partitioned (no global sort at scale)
    def walk(node, bad):
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            bad.append(node.simpleStringWithNodeId())
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), bad)

    bad = []
    walk(out._jdf.queryExecution().optimizedPlan(), bad)
    assert bad == []
