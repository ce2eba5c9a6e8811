"""Zipkin v2 JSON decode: grammar, kind map, padding, invalid bodies."""

import json

from opentelemetry_collector_components_spark.sources.zipkin import (
    decode_zipkin_json,
    generate_zipkin_bodies,
)

BODY = json.dumps(
    [
        {
            "traceId": "48485A3953BB6124",  # 16-hex, uppercase
            "id": "b26412d1ac16767d",
            "parentId": "6b221d5bc9e6496c",
            "name": "get /api",
            "kind": "SERVER",
            "timestamp": 1472470996199000,
            "duration": 207000,
            "shared": True,
            "localEndpoint": {"serviceName": "frontend"},
            "remoteEndpoint": {"serviceName": "backend"},
            "tags": {"http.method": "GET", "http.path": "/api"},
            "annotations": [{"timestamp": 1472470996238000, "value": "ws"}],
        },
        {
            "traceId": "4bf92f3577b34da6a3ce929d0e0e4736",
            "id": "00f067aa0ba902b7",
            "name": "fire-and-forget",
            "timestamp": 1472470996199000,
        },
    ]
)


def test_decode_fields(spark):
    df = spark.createDataFrame([(BODY,), ("not json",)], "body string")
    out = decode_zipkin_json(df).toPandas()
    assert len(out) == 3
    a = out.iloc[0]
    assert a["trace_id"] == "000000000000000048485a3953bb6124"
    assert a["span_id"] == "b26412d1ac16767d"
    assert a["parent_span_id"] == "6b221d5bc9e6496c"
    assert a["kind"] == "server" and a["shared"]
    assert a["start_us"] == 1472470996199000
    assert a["end_us"] == 1472470996199000 + 207000
    assert a["service"] == "frontend" and a["peer_service"] == "backend"
    assert a["tags"]["http.path"] == "/api"
    assert a["events"][0]["value"] == "ws"
    b = out.iloc[1]
    assert b["trace_id"] == "4bf92f3577b34da6a3ce929d0e0e4736"
    assert b["kind"] == "internal"  # absent kind
    assert b["parent_span_id"] is None and not b["shared"]
    assert b["end_us"] == b["start_us"]  # absent duration
    bad = out.iloc[2]
    assert not bad["valid"] and bad["trace_id"] is None and bad["kind"] is None


def test_generator_roundtrip(spark):
    from opentelemetry_collector_components_spark.queries import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    dec = decode_zipkin_json(generate_zipkin_bodies(ev)).cache()
    assert dec.count() == ev.count()
    assert dec.where(~dec.valid).count() == 0
    row = ev.orderBy("event_id").first()
    got = dec.where(dec.span_id == f"{row['event_id'] + 1:016x}").first()
    assert got["service"] == "svc-" + row["event_type"]
    assert len(got["trace_id"]) == 32
    assert got["end_us"] - got["start_us"] == round(row["value"] * 1000) + 1
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    dec.unpersist()
