"""Counter rate with reset detection + histogram_quantile interpolation."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.counters import (
    counter_rate,
    histogram_quantile,
)


def test_counter_rate_and_resets(spark):
    rows = [
        ("k", 1, 0, 10.0),    # first sample -> NULL
        ("k", 2, 10, 30.0),   # +20 over 10s -> 2/s
        ("k", 3, 20, 5.0),    # RESET: increase = 5
        ("k", 4, 25, 5.0),    # flat -> 0
    ]
    df = spark.createDataFrame(
        rows, "key string, event_id long, t long, value double"
    ).select("key", "event_id", F.timestamp_seconds("t").alias("ts"), "value")
    out = {
        r["event_id"]: (r["increase"], r["rate"])
        for r in counter_rate(df, ["key"], order_col="event_id").collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (20.0, 2.0)
    assert out[3] == (5.0, 0.5)
    assert out[4] == (0.0, 0.0)


def _hq(spark, q, counts, bounds):
    df = spark.createDataFrame([(counts,)], "c array<long>")
    return df.select(histogram_quantile(q, F.col("c"), bounds).alias("v")).head()["v"]


def test_histogram_quantile_interpolation(spark):
    bounds = [5.0, 10.0, 20.0, 50.0]
    # 10 in first bucket, 10 in second: p50 target = 10 -> exactly the top
    # of bucket 1 -> 5.0; p75 target = 15 -> halfway through bucket 2 -> 7.5
    assert _hq(spark, 0.5, [10, 10, 0, 0, 0], bounds) == 5.0
    assert _hq(spark, 0.75, [10, 10, 0, 0, 0], bounds) == 7.5
    # quantile in overflow -> highest finite bound
    assert _hq(spark, 0.9, [0, 0, 0, 0, 100], bounds) == 50.0
    # empty histogram -> NULL
    assert _hq(spark, 0.5, [0, 0, 0, 0, 0], bounds) is None
    # everything in one inner bucket: p50 interpolates inside [10, 20)
    assert _hq(spark, 0.5, [0, 0, 10, 0, 0], bounds) == 15.0


def test_histogram_quantile_rejects_bad_q(spark):
    with pytest.raises(ValueError, match="q must be"):
        histogram_quantile(0.0, F.lit(None), [1.0])
    with pytest.raises(ValueError, match="q must be"):
        histogram_quantile(1.5, F.lit(None), [1.0])


def test_no_python_in_plans(spark):
    df = spark.createDataFrame(
        [("k", 1, 0, 1.0)], "key string, event_id long, t long, value double"
    ).select("key", "event_id", F.timestamp_seconds("t").alias("ts"), "value")
    plan = (
        counter_rate(df, ["key"], order_col="event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_histogram_quantile_guards(spark):
    """Review r4: empty bounds raise at build time; a mis-sized counts
    array fails the job loudly instead of yielding silent NULLs."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    with pytest.raises(ValueError, match="bounds"):
        histogram_quantile(0.5, F.lit(None), [])
    df = spark.createDataFrame([([1, 2, 3],)], "c array<long>")
    bad = df.select(histogram_quantile(0.5, F.col("c"), [5.0, 10.0, 20.0, 50.0]).alias("v"))
    with pytest.raises(SparkRuntimeException, match="counts must have 5"):
        bad.collect()
