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
