"""Parity with the reference's OWN golden fixtures.

Inputs and expected outputs transcribed from
processor/lsmintervalprocessor/testdata/{exphistogram_delta,histogram_delta}
/{input,output}.yaml (values only — behavior check, not code).  The
exp-histogram check runs the pure-Python merge kernel directly (it is the
same function the Spark UDAF applies per group)."""

import pandas as pd
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.exphist import merge_exphist_group
from opentelemetry_collector_components_spark.operators.merge import merge_delta_histogram


def test_exphistogram_delta_golden():
    """testdata/exphistogram_delta: 3 scale-4 delta dps -> one merged dp."""
    dps = [
        dict(scale=4, zero_count=5, zero_threshold=0.0, pos_offset=2,
             pos_counts=[4, 7, 9, 6, 25], neg_offset=6, neg_counts=[2, 13, 7, 12, 4],
             count=94, sum=2.5, min=None, max=None),
        dict(scale=4, zero_count=2, zero_threshold=0.0, pos_offset=2,
             pos_counts=[2, 3, 7, 4, 20], neg_offset=7, neg_counts=[8, 3, 9, 1],
             count=59, sum=-1.5, min=None, max=None),
        dict(scale=4, zero_count=5, zero_threshold=0.0, pos_offset=2,
             pos_counts=[9, 12, 17, 8, 34], neg_offset=6, neg_counts=[6, 21, 9, 19, 7],
             count=147, sum=2.1, min=None, max=None),
    ]
    m = merge_exphist_group(pd.DataFrame(dps))
    # expected from output.yaml
    assert m["scale"] == 4
    assert m["count"] == 300
    assert m["zero_count"] == 12
    assert abs(m["sum"] - 3.1) < 1e-9
    assert m["pos_offset"] == 2 and m["pos_counts"] == [15, 22, 33, 18, 79]
    assert m["neg_offset"] == 6 and m["neg_counts"] == [8, 42, 19, 40, 12]


def test_histogram_delta_golden(spark):
    """testdata/histogram_delta: 3 same-bounds delta dps -> vector add."""
    from datetime import datetime

    bounds = [0.01, 0.1, 1.0, 10.0, 100.0]
    rows = [
        ("m", datetime.fromtimestamp(0.005), 1, bounds, [9, 4, 7, 9, 6, 25], 60, 2670.0, None, None),
        ("m", datetime.fromtimestamp(0.002), 2, bounds, [5, 2, 3, 7, 4, 20], 41, 2110.0, None, None),
        ("m", datetime.fromtimestamp(0.008), 3, bounds, [11, 9, 12, 17, 8, 34], 91, 3600.0, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "metric string, ts timestamp, seq long, bounds array<double>,"
        " bucket_counts array<long>, count long, sum double, min double, max double",
    )
    out = merge_delta_histogram(df, ["metric"]).collect()[0]
    # expected from output.yaml
    assert out["bucket_counts"] == [25, 15, 22, 33, 18, 79]
    assert out["count"] == 192
    assert out["sum"] == 8380.0
    assert out["bounds"] == bounds


def test_sum_delta_overflow_golden(spark):
    """testdata/sum_delta_overflow: metric limit 1 + datapoint limit 1.

    Input (input.yaml): metric sum.1 with dps (aaa=bbb, 333@7ms),
    (aaa=bbb, 222@8ms), (aaa=ccc, 143@8ms); metric sum.2 with (aaa=bbb,
    444@9ms).  Expected (output.yaml): surviving series (sum.1, aaa=bbb)
    merged to 555; `_overflow_metric` = 1 (sum.2 hit the metric limit);
    `_overflow_datapoints` = 1 (aaa=ccc hit the datapoint limit); the
    overflowed series' values are counted, not summed into survivors."""
    from datetime import datetime

    from opentelemetry_collector_components_spark.operators.merge import overflow_remap

    rows = [
        ("res", "delta.monotonic.sum.1", "aaa=bbb", datetime.fromtimestamp(0.007), 1, 333.0),
        ("res", "delta.monotonic.sum.1", "aaa=bbb", datetime.fromtimestamp(0.008), 2, 222.0),
        ("res", "delta.monotonic.sum.1", "aaa=ccc", datetime.fromtimestamp(0.008), 3, 143.0),
        ("res", "delta.monotonic.sum.2", "aaa=bbb", datetime.fromtimestamp(0.009), 4, 444.0),
    ]
    df = spark.createDataFrame(
        rows, "resource string, metric string, dp_attrs string, ts timestamp, seq long, value double"
    )

    # level 1: metric admission per resource (tracker.go:40-98)
    m = overflow_remap(df, ["resource"], "metric", limit=1)
    overflow_metrics = (
        m.filter("overflow").select("metric").distinct().count()
    )
    assert overflow_metrics == 1  # _overflow_metric asInt 1

    admitted = m.filter(~m.overflow).drop("overflow", "metric_merged")
    # level 2: datapoint admission per admitted metric
    d = overflow_remap(admitted, ["resource", "metric"], "dp_attrs", limit=1)
    overflow_dps = d.filter("overflow").select("dp_attrs").distinct().count()
    assert overflow_dps == 1  # _overflow_datapoints asInt 1

    survivors = (
        d.filter(~d.overflow)
        .groupBy("metric", "dp_attrs")
        .agg(F.sum("value").alias("value"))
        .collect()
    )
    assert len(survivors) == 1
    s = survivors[0]
    assert s["metric"] == "delta.monotonic.sum.1"
    assert s["dp_attrs"] == "aaa=bbb"
    assert s["value"] == 555.0  # 333 + 222 (output.yaml asDouble: 555)


def test_expo_downscale_golden():
    """internal/data/expo/scale_test.go TestDownscale — all 10 table cases.

    Bucket-string notation from the Go test: "ø" = offset+1, "-" = offset-1,
    numbers = counts.  The Go assertion tolerates trailing zero padding, so
    we compare after trimming."""
    import numpy as np

    from opentelemetry_collector_components_spark.operators.exphist import (
        _downscale,
        _trim,
    )

    #  (from_scale, offset, counts, to_scale, want_offset, want_counts)
    cases = [
        (2, 0, [1] * 12, 1, 0, [2] * 6),
        (1, 0, [2] * 6, 0, 0, [4, 4, 4]),
        (2, 1, [1] * 11, 1, 0, [1, 2, 2, 2, 2, 2]),
        (1, 0, [1, 2, 2, 2, 2, 2], 0, 0, [3, 4, 4]),
        (2, 2, [1] * 10, 1, 1, [2] * 5),
        (1, 1, [2] * 5, 0, 0, [2, 4, 4]),
        (2, 4, [1] * 8, 1, 2, [2, 2, 2, 2]),
        (1, 2, [2, 2, 2, 2], 0, 1, [4, 4]),
        (2, 0, [1] * 9, 1, 0, [2, 2, 2, 2, 1]),
        (1, 0, [2, 2, 2, 2, 1], 0, 0, [4, 4, 1]),
        (2, 0, [1] * 12, 0, 0, [4, 4, 4]),          # two-level jump d=2
        (1, 1, [1, 1, 0], 0, 0, [1, 1]),
        (1, 1, [1, 1], 0, 0, [1, 1]),
        (1, -1, [1, 1], 0, -1, [1, 1]),
        (5, -1, [4, 0, 3, 0, 3, 0, 0, 8], 4, -1, [4, 3, 3, 0, 8]),
    ]
    for from_scale, off, counts, to_scale, want_off, want_counts in cases:
        d = from_scale - to_scale
        got_off, got_counts = _downscale(off, np.array(counts, dtype=np.int64), d)
        got_off, got_counts = _trim(got_off, got_counts)
        want_off2, want_counts2 = _trim(want_off, np.array(want_counts, dtype=np.int64))
        assert got_off == want_off2, (from_scale, off, counts, to_scale)
        assert list(got_counts) == list(want_counts2), (from_scale, off, counts, to_scale)


def test_sum_delta_golden(spark):
    """testdata/sum_delta: delta sums fold by addition regardless of
    timestamp order (input dps 333, 222 out-of-order, 444 -> output 999
    at the max timestamp 8000000)."""
    from datetime import datetime

    from opentelemetry_collector_components_spark.operators.merge import merge_delta_sum

    rows = [
        ("delta.monotonic.sum", datetime.fromtimestamp(0.005), 1, 333.0),
        ("delta.monotonic.sum", datetime.fromtimestamp(0.002), 2, 222.0),
        ("delta.monotonic.sum", datetime.fromtimestamp(0.008), 3, 444.0),
    ]
    df = spark.createDataFrame(rows, "metric string, ts timestamp, seq long, value_double double")
    out = merge_delta_sum(df, ["metric"]).collect()[0]
    assert out["value"] == 999.0  # output.yaml asDouble: 999
    assert out["merged_count"] == 3


def test_sum_cumulative_golden(spark):
    """testdata/sum_cumulative: cumulative = replace-by-newest; the
    out-of-order dp (ts 2000000, value 222) is ignored (input comment),
    output = 444 at 8000000."""
    from datetime import datetime

    from opentelemetry_collector_components_spark.operators.merge import merge_cumulative

    rows = [
        ("cumulative.sum", datetime.fromtimestamp(0.005), 1, 333.0),
        ("cumulative.sum", datetime.fromtimestamp(0.002), 2, 222.0),
        ("cumulative.sum", datetime.fromtimestamp(0.008), 3, 444.0),
    ]
    df = spark.createDataFrame(rows, "metric string, ts timestamp, seq long, value_double double")
    out = merge_cumulative(df, ["metric"]).collect()[0]
    assert out["value"] == 444.0  # output.yaml asDouble: 444
    assert out["ts"] == datetime.fromtimestamp(0.008)  # timeUnixNano 8000000


def test_summary_enabled_golden(spark):
    """testdata/summary_enabled: summaries are cumulative -> newest dp wins
    wholesale (count=25, sum=310 at ts 8000000; the 2000000 dp ignored)."""
    from datetime import datetime

    from opentelemetry_collector_components_spark.operators.merge import merge_summary

    rows = [
        ("summary.test", datetime.fromtimestamp(0.005), 1, 20, 199.0),
        ("summary.test", datetime.fromtimestamp(0.002), 2, 5, 95.0),
        ("summary.test", datetime.fromtimestamp(0.008), 3, 25, 310.0),
    ]
    df = spark.createDataFrame(
        rows, "metric string, ts timestamp, seq long, count long, sum double"
    )
    out = merge_summary(df, ["metric"]).collect()[0]
    assert out["count"] == 25 and out["sum"] == 310.0  # output.yaml
    assert out["ts"] == datetime.fromtimestamp(0.008)


def test_exphistogram_cumulative_golden(spark):
    """testdata/exphistogram_cumulative: cumulative exp-histograms replace
    wholesale by the newest dp (out-of-order ts 2000000 ignored): output =
    the ts-8000000 dp (count 147, sum 2.1, zero 5, pos [9,12,17,8,34])."""
    from datetime import datetime

    from opentelemetry_collector_components_spark.operators.merge import (
        merge_cumulative_struct,
    )

    cols = ("metric string, ts timestamp, seq long, scale int, zero_count long,"
            " pos_offset int, pos_counts array<long>, neg_offset int,"
            " neg_counts array<long>, count long, sum double")
    rows = [
        ("m", datetime.fromtimestamp(0.005), 1, 4, 5, 2, [4, 7, 9, 6, 25], 6, [2, 13, 7, 12, 4], 94, 2.5),
        ("m", datetime.fromtimestamp(0.002), 2, 4, 2, 2, [2, 3, 7, 4, 20], 7, [8, 3, 9, 1], 59, -1.5),
        ("m", datetime.fromtimestamp(0.008), 3, 4, 5, 2, [9, 12, 17, 8, 34], 6, [6, 21, 9, 19, 7], 147, 2.1),
    ]
    df = spark.createDataFrame(rows, cols)
    out = merge_cumulative_struct(
        df, ["metric"],
        ["scale", "zero_count", "pos_offset", "pos_counts", "neg_offset",
         "neg_counts", "count", "sum"],
    ).collect()[0]
    assert out["count"] == 147 and out["sum"] == 2.1 and out["zero_count"] == 5
    assert out["pos_offset"] == 2 and out["pos_counts"] == [9, 12, 17, 8, 34]
    assert out["neg_offset"] == 6 and out["neg_counts"] == [6, 21, 9, 19, 7]
    assert out["ts"] == datetime.fromtimestamp(0.008)


def test_histogram_cumulative_golden(spark):
    """testdata/histogram_cumulative: cumulative histograms replace
    wholesale by the newest dp — out-of-order ts 2000000 ignored; output =
    the ts-8000000 dp (count 91, sum 3600, buckets [11,9,12,17,8,34])."""
    from datetime import datetime

    from opentelemetry_collector_components_spark.operators.merge import (
        merge_cumulative_struct,
    )

    cols = ("metric string, ts timestamp, seq long, bounds array<double>,"
            " bucket_counts array<long>, count long, sum double")
    b = [0.01, 0.1, 1.0, 10.0, 100.0]
    rows = [
        ("m", datetime.fromtimestamp(0.005), 1, b, [9, 4, 7, 9, 6, 25], 60, 2670.0),
        ("m", datetime.fromtimestamp(0.002), 2, b, [5, 2, 3, 7, 4, 20], 41, 2110.0),
        ("m", datetime.fromtimestamp(0.008), 3, b, [11, 9, 12, 17, 8, 34], 91, 3600.0),
    ]
    df = spark.createDataFrame(rows, cols)
    out = merge_cumulative_struct(
        df, ["metric"], ["bounds", "bucket_counts", "count", "sum"]
    ).collect()[0]
    assert out["count"] == 91 and out["sum"] == 3600.0
    assert out["bucket_counts"] == [11, 9, 12, 17, 8, 34]
    assert out["ts"] == datetime.fromtimestamp(0.008)
