"""Prometheus text exposition decode: grammar, metadata join, suffixes."""

from opentelemetry_collector_components_spark.sources.promtext import (
    decode_prom_text,
    generate_prom_text,
)

PAGE = [
    "# HELP http_requests_total Total HTTP requests.",
    "# TYPE http_requests_total counter",
    "# TYPE request_duration_seconds histogram",
    'http_requests_total{method="post",code="200"} 1027 1395066363000',
    "http_requests_total 3",
    'request_duration_seconds_bucket{le="0.5"} 24054',
    'request_duration_seconds_bucket{le="+Inf"} 144320',
    "request_duration_seconds_sum 53423",
    "request_duration_seconds_count 144320",
    'untyped_metric{a="b"} NaN',
    "  ",
    "garbage % line",
]


def _decode(spark):
    df = spark.createDataFrame([(ln,) for ln in PAGE], "line string")
    return decode_prom_text(df).toPandas().set_index("line")


def test_sample_grammar_and_metadata(spark):
    out = _decode(spark)
    assert len(out) == 8  # comments + blank line excluded
    r = out.loc['http_requests_total{method="post",code="200"} 1027 1395066363000']
    assert r["family"] == "http_requests_total" and r["mtype"] == "counter"
    assert r["suffix"] == "" and r["value"] == 1027.0
    assert r["ts_ms"] == 1395066363000
    assert r["labels"] == {"method": "post", "code": "200"}
    assert r["help"] == "Total HTTP requests."
    bare = out.loc["http_requests_total 3"]
    import pandas as pd

    assert bare["labels"] is None and bare["value"] == 3.0
    assert pd.isna(bare["ts_ms"])


def test_histogram_suffix_fallback(spark):
    out = _decode(spark)
    b = out.loc['request_duration_seconds_bucket{le="+Inf"} 144320']
    assert b["family"] == "request_duration_seconds"
    assert b["mtype"] == "histogram" and b["suffix"] == "bucket"
    assert b["labels"]["le"] == "+Inf" and b["value"] == 144320.0
    s = out.loc["request_duration_seconds_sum 53423"]
    assert s["suffix"] == "sum" and s["mtype"] == "histogram"
    c = out.loc["request_duration_seconds_count 144320"]
    assert c["suffix"] == "count" and c["family"] == "request_duration_seconds"


def test_untyped_nan_and_invalid(spark):
    out = _decode(spark)
    u = out.loc['untyped_metric{a="b"} NaN']
    assert u["mtype"] is None and u["family"] == "untyped_metric"
    assert u["value"] != u["value"]  # NaN
    g = out.loc["garbage % line"]
    assert not g["valid"] and g["family"] is None and g["name"] is None


def test_generator_roundtrip(spark):
    from opentelemetry_collector_components_spark.queries import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    dec = decode_prom_text(generate_prom_text(ev)).cache()
    assert dec.where(~dec.valid).count() == 1
    fams = {
        r["family"]: r["mtype"]
        for r in dec.where(dec.valid).select("family", "mtype").distinct().collect()
    }
    assert fams == {
        "http_requests_total": "counter",
        "node_memory_bytes": "gauge",
        "request_duration_seconds": "histogram",
    }
    # counter rows = events with id % 3 == 0; histogram = 5 lines x routes
    n0 = ev.where(ev.event_id % 3 == 0).count()
    assert dec.where(dec.family == "http_requests_total").count() == n0
    assert dec.where(dec.suffix == "bucket").count() == 3 * 4
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    dec.unpersist()


def test_review_regressions(spark):
    """Blank/tab runs between tokens and negative timestamps are legal."""
    df = spark.createDataFrame(
        [("metric_a  5",), ("metric_b\t7 -1",), ("metric_c 1 2 3",)],
        "line string",
    )
    out = decode_prom_text(df).toPandas().set_index("line")
    a = out.loc["metric_a  5"]
    assert a["valid"] and a["value"] == 5.0
    b = out.loc["metric_b\t7 -1"]
    assert b["valid"] and b["ts_ms"] == -1
    assert not out.loc["metric_c 1 2 3"]["valid"]  # too many tokens
