"""signaltometrics: counter/sum/histogram derivation with conditions."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.signalmetrics import (
    signal_to_metrics,
)


def _spans(spark):
    rows = [
        # (id, dur, status, attributes, resource)
        (1, 10.0, 200, {"route": "/a"}, {"svc": "x"}),
        (2, 120.0, 500, {"route": "/a"}, {"svc": "x"}),
        (3, 5.0, 200, {"route": "/b"}, {"svc": "y"}),
        (4, 900.0, 503, {}, {"svc": "y"}),
    ]
    return spark.createDataFrame(
        rows,
        "id long, dur double, status long, "
        "attributes map<string,string>, resource map<string,string>",
    )


def test_counter_with_conditions_and_dims(spark):
    out = signal_to_metrics(
        _spans(spark),
        [
            {
                "name": "errors",
                "conditions": ["status >= 500"],
                "attributes": {"svc": 'resource.attributes["svc"]'},
                "type": "counter",
            }
        ],
    ).collect()
    got = {tuple(sorted(r["dims"].items())): r["n"] for r in out}
    assert got == {(("svc", "x"),): 1, (("svc", "y"),): 1}
    assert all(r["sum_milli"] is None and r["bucket_counts"] is None for r in out)


def test_sum_and_null_dimension_dropped(spark):
    out = signal_to_metrics(
        _spans(spark),
        [
            {
                "name": "latency_total",
                "attributes": {"route": 'attributes["route"]'},
                "type": "sum",
                "value": "dur",
            }
        ],
    ).collect()
    by_dims = {tuple(sorted(r["dims"].items())): r for r in out}
    assert by_dims[(("route", "/a"),)]["sum_milli"] == 130000
    assert by_dims[(("route", "/b"),)]["sum_milli"] == 5000
    # row 4 has no route: NULL dim entry dropped -> empty map group
    assert by_dims[()]["sum_milli"] == 900000 and by_dims[()]["n"] == 1


def test_histogram_buckets(spark):
    out = signal_to_metrics(
        _spans(spark),
        [
            {
                "name": "latency_hist",
                "type": "histogram",
                "value": "dur",
                "bounds": [10, 100],
            }
        ],
    ).collect()
    assert len(out) == 1
    r = out[0]
    # durations 10, 120, 5, 900 -> (<=10): 2, (10,100]: 0, >100: 2
    assert r["bucket_counts"] == [2, 0, 2]
    assert r["n"] == 4 and r["sum_milli"] == 1035000


def test_multiple_specs_union_and_validation(spark):
    out = signal_to_metrics(
        _spans(spark),
        [
            {"name": "all", "type": "counter"},
            {"name": "slow", "conditions": ["dur > 100.0"], "type": "counter"},
        ],
    )
    got = {r["metric_name"]: r["n"] for r in out.collect()}
    assert got == {"all": 4, "slow": 2}
    with pytest.raises(ValueError):
        signal_to_metrics(_spans(spark), [])


def test_exponential_histogram_body(spark):
    import math

    rows = [(1, 0.5, {"r": "a"}), (2, 3.0, {"r": "a"}), (3, 4.0, {"r": "a"}),
            (4, 0.0, {"r": "a"}), (5, 6.0, {"r": "b"})]
    df = spark.createDataFrame(rows, "id long, v double, attributes map<string,string>")
    out = signal_to_metrics(
        df,
        [{"name": "eh", "type": "exponential_histogram", "value": "v",
          "attributes": {"r": 'attributes["r"]'}, "scale": 2}],
    ).collect()
    by = {r["dims"]["r"]: r for r in out}
    def idx(v):
        return math.ceil(math.log2(v) * 4) - 1
    a = by["a"]
    # values 0.5, 3.0, 4.0 -> indexes; 0.0 -> zero bucket
    want = {}
    for v in (0.5, 3.0, 4.0):
        want[idx(v)] = want.get(idx(v), 0) + 1
    assert a["exp_buckets"] == ",".join(
        f"{i}:{c}" for i, c in sorted(want.items())
    )
    assert a["zero_count"] == 1 and a["n"] == 4 and a["sum_milli"] == 7500
    assert by["b"]["exp_buckets"] == f"{idx(6.0)}:1"
    assert by["b"]["zero_count"] == 0
