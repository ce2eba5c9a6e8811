"""lsminterval end-to-end: mixed metric_events fixture through the
type-dispatch merge (FIXTURES.md §4 golden expectations, computed by hand).

Mirrors the reference's testdata/{sum,histogram,exphistogram}_{delta,
cumulative} + summary + overflow fixture families in one table."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.exphist import values_to_exphist
from opentelemetry_collector_components_spark.operators.lsminterval import (
    lsminterval_merge,
    lsminterval_overflow_input,
)

T0 = "2026-01-01T00:00:"


def ts(sec):
    return datetime.fromisoformat(f"{T0}{sec:02d}")


EH_COLS = ["scale", "zero_count", "zero_threshold", "pos_offset", "pos_counts",
           "neg_offset", "neg_counts", "count", "sum", "min", "max"]


def _row(metric, mtype, temp, t, seq, attr="a", value=None, bounds=None,
         bucket_counts=None, count=None, ssum=None, mn=None, mx=None, eh=None):
    e = eh or {}
    return (
        metric, mtype, temp, ts(t), seq, attr, value,
        bounds, bucket_counts,
        count if count is not None else e.get("count"),
        ssum if ssum is not None else e.get("sum"),
        mn if mn is not None else e.get("min"),
        mx if mx is not None else e.get("max"),
        e.get("scale"), e.get("zero_count"), e.get("zero_threshold"),
        e.get("pos_offset"), e.get("pos_counts"), e.get("neg_offset"), e.get("neg_counts"),
    )


SCHEMA = (
    "metric_name string, metric_type string, temporality string, ts timestamp,"
    " seq long, attr_id string, value_double double,"
    " bounds array<double>, bucket_counts array<long>, count long, sum double,"
    " min double, max double, scale int, zero_count long, zero_threshold double,"
    " pos_offset int, pos_counts array<long>, neg_offset int, neg_counts array<long>"
)


@pytest.fixture(scope="module")
def merged(spark):
    eh_a = values_to_exphist([1.5, 3.0, 12.0], scale=2)
    eh_b = values_to_exphist([2.5, 0.7], scale=0)
    rows = [
        # gauge: passes through (2 rows stay 2 rows)
        _row("g1", "gauge", "delta", 1, 1, value=5.0),
        _row("g1", "gauge", "delta", 2, 2, value=7.0),
        # delta sum: 1+2+4=7 in one window
        _row("s1", "sum", "delta", 1, 3, value=1.0),
        _row("s1", "sum", "delta", 2, 4, value=2.0),
        _row("s1", "sum", "delta", 3, 5, value=4.0),
        # cumulative sum out-of-order: newest ts (t=30,v=100) wins over
        # later-arriving older (t=10,v=50)
        _row("c1", "sum", "cumulative", 30, 6, value=100.0),
        _row("c1", "sum", "cumulative", 10, 7, value=50.0),
        # histogram same bounds: vector add
        _row("h1", "histogram", "delta", 1, 8, bounds=[1.0, 5.0], bucket_counts=[1, 2, 3],
             count=6, ssum=10.0, mn=0.5, mx=9.0),
        _row("h1", "histogram", "delta", 2, 9, bounds=[1.0, 5.0], bucket_counts=[4, 0, 1],
             count=5, ssum=7.0, mn=0.2, mx=6.0),
        # histogram bounds mismatch: newest (t=9) resets state
        _row("h2", "histogram", "delta", 1, 10, bounds=[1.0, 5.0], bucket_counts=[1, 2, 3],
             count=6, ssum=10.0, mn=0.5, mx=9.0),
        _row("h2", "histogram", "delta", 9, 11, bounds=[2.0, 4.0], bucket_counts=[1, 1, 1],
             count=3, ssum=8.0, mn=1.0, mx=7.0),
        # exp histogram at scales 2 and 0 -> aligned to 0
        _row("e1", "exp_histogram", "delta", 1, 12, eh=eh_a),
        _row("e1", "exp_histogram", "delta", 2, 13, eh=eh_b),
        # summary: newest wins
        _row("sm1", "summary", "cumulative", 1, 14, count=10, ssum=100.0),
        _row("sm1", "summary", "cumulative", 5, 15, count=20, ssum=250.0),
        # cumulative histogram out-of-order: the whole newest dp (t=8) wins;
        # the later-arriving older dp (t=3, seq 17) is ignored
        _row("hc1", "histogram", "cumulative", 8, 16, bounds=[1.0, 5.0],
             bucket_counts=[11, 9, 12], count=91, ssum=3600.0, mn=0.1, mx=99.0),
        _row("hc1", "histogram", "cumulative", 3, 17, bounds=[1.0, 5.0],
             bucket_counts=[5, 2, 3], count=41, ssum=2110.0, mn=0.2, mx=50.0),
        # cumulative exp-histogram: newest wins wholesale
        _row("ec1", "exp_histogram", "cumulative", 2, 18, eh=eh_a),
        _row("ec1", "exp_histogram", "cumulative", 7, 19, eh=eh_b),
    ]
    # overflow family: metric o1, limit 2, attrs a,b admitted; c,d overflow
    for i, (attr, t) in enumerate([("a", 1), ("b", 2), ("c", 3), ("d", 4), ("c", 5)]):
        rows.append(_row("o1", "sum", "delta", t, 100 + i, attr=attr, value=1.0))

    df = lsminterval_overflow_input(spark.createDataFrame(rows, SCHEMA))
    return lsminterval_merge(df, "1m", datapoint_limit=2)


def test_gauge_passthrough(merged):
    assert merged["gauge"].count() == 2


def test_delta_sum(merged):
    out = {r["metric_name"]: r["value"] for r in merged["sum_delta"].collect()}
    assert out["s1"] == 7.0


def test_cumulative_out_of_order(merged):
    row = merged["sum_cumulative"].filter("metric_name='c1'").collect()[0]
    assert row["value"] == 100.0


def test_histogram_merge_and_reset(merged):
    h = {r["metric_name"]: r for r in merged["histogram"].collect()}
    assert h["h1"]["bucket_counts"] == [5, 2, 4]
    assert h["h1"]["count"] == 11
    assert h["h2"]["bounds"] == [2.0, 4.0]
    assert h["h2"]["bucket_counts"] == [1, 1, 1]


def test_exphist_alignment(merged):
    both = values_to_exphist([1.5, 3.0, 12.0, 2.5, 0.7], scale=0)
    row = merged["exp_histogram"].filter("metric_name='e1'").collect()[0]
    assert row["scale"] == 0
    assert row["pos_offset"] == both["pos_offset"]
    assert row["pos_counts"] == both["pos_counts"]
    assert row["count"] == 5


def test_summary_newest(merged):
    row = merged["summary"].collect()[0]
    assert row["count"] == 20 and row["sum"] == 250.0


def test_overflow_bucket_and_estimate(merged):
    sums = {r["attr_id"]: r["value"] for r in merged["sum_delta"].filter("metric_name='o1'").collect()}
    assert sums == {"a": 1.0, "b": 1.0, "_overflow": 3.0}  # c(x2)+d
    ov = merged["overflow_datapoints"].filter("metric_name='o1'").collect()[0]
    assert ov["_overflow_datapoints"] == 2  # distinct overflowed attr ids: c,d


def test_histogram_cumulative_newest_wins(merged):
    """Mirrors testdata/histogram_cumulative: replace-by-newest wholesale
    (output.yaml keeps count=91, sum=3600, buckets [11,9,12,...])."""
    row = merged["histogram_cumulative"].filter("metric_name='hc1'").collect()[0]
    assert row["count"] == 91 and row["sum"] == 3600.0
    assert row["bucket_counts"] == [11, 9, 12]
    assert row["ts"] == ts(8)


def test_exphistogram_cumulative_newest_wins(merged):
    eh_b = values_to_exphist([2.5, 0.7], scale=0)
    row = merged["exp_histogram_cumulative"].filter("metric_name='ec1'").collect()[0]
    assert row["scale"] == 0
    assert row["pos_counts"] == eh_b["pos_counts"]
    assert row["count"] == 2


def test_summary_passthrough(spark):
    """Mirrors testdata/summary_passthrough: with pass_through.summary the
    datapoints are forwarded unaggregated (2 rows stay 2 rows)."""
    rows = [
        _row("sm1", "summary", "cumulative", 1, 1, count=10, ssum=100.0),
        _row("sm1", "summary", "cumulative", 5, 2, count=20, ssum=250.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = lsminterval_merge(df, "1m", summary_passthrough=True)
    got = sorted((r["count"], r["sum"]) for r in out["summary"].collect())
    assert got == [(10, 100.0), (20, 250.0)]
