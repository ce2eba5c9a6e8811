"""OTLP/JSON logs wire: encode/decode round trip, proto3 JSON details,
decoder leniency, JVM-only plans."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.sources.otlp import (
    decode_otlp_logs,
    encode_otlp_logs,
)


def _flat_rows(spark, n=12):
    return spark.range(n).select(
        (F.lit(1_700_000_000_000_000_000) + F.col("id") * 1000).alias(
            "time_unix_nano"
        ),
        (F.lit(1_700_000_000_000_000_500) + F.col("id") * 1000).alias(
            "observed_unix_nano"
        ),
        (F.col("id") % 5 * 4 + 1).cast("int").alias("severity_number"),
        F.concat(F.lit("SEV"), (F.col("id") % 5).cast("string")).alias(
            "severity_text"
        ),
        F.concat(F.lit("msg "), F.col("id").cast("string")).alias("body"),
        F.lpad(F.hex(F.col("id")), 32, "0").alias("trace_id"),
        F.lpad(F.hex(F.col("id") * 7), 16, "0").alias("span_id"),
        F.create_map(
            F.lit("env"),
            F.when(F.col("id") % 2 == 0, "prod").otherwise("dev"),
            F.lit("k"),
            (F.col("id") % 3).cast("string"),
        ).alias("attributes"),
        F.concat(F.lit("svc-"), (F.col("id") % 2).cast("string")).alias(
            "service_name"
        ),
        F.lit("my-lib").alias("scope_name"),
        F.lit("1.2.3").alias("scope_version"),
    )


def test_otlp_round_trip_exact(spark):
    flat = _flat_rows(spark)
    enc = encode_otlp_logs(flat, ["service_name"])
    assert enc.count() == 2  # one payload per (resource, scope)
    dec = decode_otlp_logs(enc)
    got = sorted(
        (r["time_unix_nano"], r["observed_unix_nano"], r["severity_number"],
         r["severity_text"], r["body"], r["trace_id"], r["span_id"],
         dict(r["resource_attrs"]), r["scope_name"], r["scope_version"],
         dict(r["attributes"]), r["dropped_attributes_count"])
        for r in dec.collect()
    )
    want = sorted(
        (r["time_unix_nano"], r["observed_unix_nano"], r["severity_number"],
         r["severity_text"], r["body"], r["trace_id"], r["span_id"],
         {"service_name": r["service_name"]}, r["scope_name"],
         r["scope_version"], dict(r["attributes"]), 0)
        for r in _flat_rows(spark).collect()
    )
    assert got == want


def test_otlp_proto3_json_shapes(spark):
    """int64 on the wire as STRING; typed AnyValues decode; dropped
    count surfaces; kvlist/array values -> NULL (documented subset)."""
    payload = json.dumps({
        "resourceLogs": [{
            "resource": {"attributes": [
                {"key": "host", "value": {"stringValue": "h1"}},
                {"key": "pid", "value": {"intValue": "42"}},
            ], "droppedAttributesCount": 1},
            "scopeLogs": [{
                "scope": {"name": "s", "version": "v"},
                "logRecords": [{
                    "timeUnixNano": "1700000000000000001",
                    "observedTimeUnixNano": "1700000000000000002",
                    "severityNumber": 17,
                    "severityText": "ERROR",
                    "body": {"doubleValue": 2.5},
                    "attributes": [
                        {"key": "ok", "value": {"boolValue": True}},
                        {"key": "deep", "value": {"kvlistValue": {"values": []}}},
                    ],
                    "droppedAttributesCount": 3,
                    "traceId": "0" * 32,
                    "spanId": "f" * 16,
                }],
            }],
        }]
    })
    df = spark.createDataFrame([(payload,)], "payload string")
    r = decode_otlp_logs(df).collect()[0]
    assert r["time_unix_nano"] == 1700000000000000001
    assert r["observed_unix_nano"] == 1700000000000000002
    assert r["severity_number"] == 17 and r["severity_text"] == "ERROR"
    assert r["body"] == "2.5"
    assert dict(r["resource_attrs"]) == {"host": "h1", "pid": "42"}
    assert dict(r["attributes"]) == {"ok": "true", "deep": None}
    assert r["dropped_attributes_count"] == 3


def test_otlp_malformed_payload_drops(spark):
    df = spark.createDataFrame(
        [("not json",), ('{"resourceLogs": "nope"}',)], "payload string"
    )
    assert decode_otlp_logs(df).count() == 0


def test_otlp_plans_are_jvm_only(spark):
    flat = _flat_rows(spark)
    enc = encode_otlp_logs(flat, ["service_name"])
    dec = decode_otlp_logs(enc)
    for frame in (enc, dec):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
