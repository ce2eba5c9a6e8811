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
