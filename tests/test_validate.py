

# ---------------------------------------------------------------------------
# interval gap detection
# ---------------------------------------------------------------------------
def test_gap_detection_finds_exactly_the_holes(spark):
    from datetime import datetime, timedelta

    from opentelemetry_collector_components_spark.operators.validate import (
        detect_interval_gaps,
    )

    t0 = datetime(2024, 5, 1, 0, 0, 0)
    rows = []
    # key A: hours 0..9 present except 3 and 7 (two gaps)
    for h in range(10):
        if h not in (3, 7):
            rows.append(("A", t0 + timedelta(hours=h, minutes=17)))
    # key B: dense hours 0..4 (no gaps)
    for h in range(5):
        rows.append(("B", t0 + timedelta(hours=h)))
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    gaps = sorted(
        (r.k, r.gap_start.hour)
        for r in detect_interval_gaps(df, ["k"], "ts", 3600).collect()
    )
    assert gaps == [("A", 3), ("A", 7)]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        detect_interval_gaps(df, ["k"], "ts", 0)


def test_gap_detection_dense_is_empty_and_plan_clean(spark):
    from datetime import datetime, timedelta

    from opentelemetry_collector_components_spark.operators.validate import (
        detect_interval_gaps,
    )

    t0 = datetime(2024, 5, 1)
    df = spark.createDataFrame(
        [("A", t0 + timedelta(minutes=m)) for m in range(120)],
        "k string, ts timestamp",
    )
    out = detect_interval_gaps(df, ["k"], "ts", 3600)
    assert out.count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
