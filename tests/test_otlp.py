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


def _metric_rows(spark):
    """One datapoint of each of the five types, plus a second gauge."""
    rows = [
        # type, name, t0, t1, vd, vl, count, sum, min, max, bounds, bcnt,
        # scale, zc, po, pb, no, nb, qq, qv, temporality, mono, attrs
        ("gauge", "g1", 1, 2, 2.5, None, None, None, None, None, None, None,
         None, None, None, None, None, None, None, None, None, None,
         {"a": "1"}),
        ("gauge", "g1", 1, 3, None, 7, None, None, None, None, None, None,
         None, None, None, None, None, None, None, None, None, None,
         {"a": "2"}),
        ("sum", "s1", 1, 2, None, 41, None, None, None, None, None, None,
         None, None, None, None, None, None, None, None, 2, True,
         {"b": "x"}),
        ("histogram", "h1", 1, 2, None, None, 6, 12.5, 0.5, 4.0,
         [1.0, 2.0], [1, 2, 3], None, None, None, None, None, None,
         None, None, 1, None, {}),
        ("exponential_histogram", "e1", 1, 2, None, None, 5, 9.0, None,
         None, None, None, 2, 1, 0, [2, 2], 1, [1], None, None, 1, None,
         {"c": "y"}),
        ("summary", "q1", 1, 2, None, None, 9, 99.0, None, None, None,
         None, None, None, None, None, None, None, [0.5, 0.99],
         [1.5, 7.25], None, None, {}),
    ]
    schema = (
        "metric_type string, metric_name string, start_time_unix_nano long,"
        "time_unix_nano long, value_double double, value_long long,"
        "count long, sum double, min double, max double,"
        "bounds array<double>, bucket_counts array<long>, scale int,"
        "zero_count long, pos_offset int, pos_bucket_counts array<long>,"
        "neg_offset int, neg_bucket_counts array<long>,"
        "q_quantiles array<double>, q_values array<double>,"
        "temporality int, is_monotonic boolean,"
        "attributes map<string,string>"
    )
    return spark.createDataFrame(rows, schema).withColumn(
        "service", F.lit("svc")
    ).withColumn("scope_name", F.lit("lib"))


def test_otlp_metrics_round_trip_all_five_types(spark):
    from opentelemetry_collector_components_spark.sources.otlp import (
        decode_otlp_metrics,
        encode_otlp_metrics,
    )

    flat = _metric_rows(spark)
    enc = encode_otlp_metrics(flat, ["service"])
    assert enc.count() == 1
    dec = decode_otlp_metrics(enc)

    def norm(rows):
        out = []
        for r in rows:
            d = r.asDict()
            d.pop("resource_attrs", None)
            d.pop("service", None)
            d["attributes"] = tuple(sorted((d["attributes"] or {}).items()))
            for k in list(d):
                if isinstance(d[k], list):
                    d[k] = tuple(d[k])
            out.append(tuple(sorted(d.items(), key=lambda kv: kv[0])))
        return sorted(out, key=repr)

    got = norm(dec.collect())
    want_src = flat.collect()
    want = []
    for r in want_src:
        d = r.asDict()
        d.pop("service")
        d["attributes"] = tuple(sorted((d["attributes"] or {}).items()))
        for k in list(d):
            if isinstance(d[k], list):
                d[k] = tuple(d[k])
        want.append(tuple(sorted(d.items(), key=lambda kv: kv[0])))
    assert got == sorted(want, key=repr)
    # resource attrs carried
    svc = {dict(r["resource_attrs"])["service"] for r in dec.collect()}
    assert svc == {"svc"}


def test_otlp_metrics_wire_is_proto3_json(spark):
    """int64 fields ride as strings; only the right type subtree is
    present per metric."""
    from opentelemetry_collector_components_spark.sources.otlp import (
        encode_otlp_metrics,
    )

    enc = encode_otlp_metrics(_metric_rows(spark), ["service"]).collect()[0]
    req = json.loads(enc["payload"])
    metrics = req["resourceMetrics"][0]["scopeMetrics"][0]["metrics"]
    by_name = {m["name"]: m for m in metrics}
    assert set(by_name) == {"g1", "s1", "h1", "e1", "q1"}
    g = by_name["g1"]["gauge"]["dataPoints"]
    assert {dp.get("asInt", dp.get("asDouble")) for dp in g} == {"7", 2.5}
    assert "sum" not in by_name["g1"] and "histogram" not in by_name["g1"]
    h = by_name["h1"]["histogram"]["dataPoints"][0]
    assert h["count"] == "6" and h["bucketCounts"] == ["1", "2", "3"]
    e = by_name["e1"]["exponentialHistogram"]["dataPoints"][0]
    assert e["zeroCount"] == "1" and e["positive"]["bucketCounts"] == ["2", "2"]
    s = by_name["s1"]["sum"]
    assert s["aggregationTemporality"] == 2 and s["isMonotonic"] is True


def test_otlp_traces_round_trip(spark):
    from opentelemetry_collector_components_spark.sources.otlp import (
        decode_otlp_traces,
        encode_otlp_traces,
    )

    flat = spark.range(10).select(
        F.lower(F.lpad(F.hex(F.col("id") % 3), 32, "0")).alias("trace_id"),
        F.lower(F.lpad(F.hex(F.col("id") + 1), 16, "0")).alias("span_id"),
        F.when(
            F.col("id") % 3 != 0, F.lower(F.lpad(F.hex(F.col("id")), 16, "0"))
        ).alias("parent_span_id"),
        F.concat(F.lit("op-"), (F.col("id") % 4).cast("string")).alias("name"),
        (F.col("id") % 5 + 1).cast("int").alias("kind"),
        (F.lit(1_700_000_000_000_000_000) + F.col("id") * 10).alias(
            "start_time_unix_nano"
        ),
        (F.lit(1_700_000_000_000_000_000) + F.col("id") * 10 + 7).alias(
            "end_time_unix_nano"
        ),
        F.when(F.col("id") % 2 == 0, F.lit(2)).cast("int").alias("status_code"),
        F.when(F.col("id") % 2 == 0, F.lit("boom")).alias("status_message"),
        F.create_map(F.lit("http.status"), (200 + F.col("id") % 3).cast("string")).alias(
            "attributes"
        ),
        F.concat(F.lit("svc"), (F.col("id") % 2).cast("string")).alias("service"),
        F.lit("tracer").alias("scope_name"),
    )
    enc = encode_otlp_traces(flat, ["service"])
    assert enc.count() == 2
    dec = decode_otlp_traces(enc)
    got = sorted(
        (r["trace_id"], r["span_id"], r["parent_span_id"], r["name"],
         r["kind"], r["start_time_unix_nano"], r["end_time_unix_nano"],
         r["status_code"], r["status_message"],
         dict(r["resource_attrs"])["service"], r["scope_name"],
         tuple(sorted(dict(r["attributes"]).items())))
        for r in dec.collect()
    )
    want = sorted(
        (r["trace_id"], r["span_id"], r["parent_span_id"], r["name"],
         r["kind"], r["start_time_unix_nano"], r["end_time_unix_nano"],
         r["status_code"] if r["status_code"] is not None else 0,
         r["status_message"], r["service"], r["scope_name"],
         tuple(sorted(dict(r["attributes"]).items())))
        for r in flat.collect()
    )
    assert got == want


def test_otlp_protobuf_round_trip_matches_json_flat_model(spark):
    """The protobuf wire must land on the SAME flat rows as the JSON
    wire for the same input — transport-agnostic downstream."""
    from opentelemetry_collector_components_spark.sources.otlp import (
        decode_otlp_logs_protobuf,
        encode_otlp_logs_protobuf,
    )

    flat = _flat_rows(spark).withColumnRenamed("service_name", "_svc")
    flat = flat.withColumn("service_name", F.col("_svc")).drop("_svc")
    enc = encode_otlp_logs_protobuf(flat)
    assert enc.count() == 12
    dec = decode_otlp_logs_protobuf(enc)
    got = sorted(
        (r["time_unix_nano"], r["observed_unix_nano"], r["severity_number"],
         r["severity_text"], r["body"], r["trace_id"], r["span_id"],
         dict(r["resource_attrs"]), r["scope_name"],
         tuple(sorted(dict(r["attributes"]).items())))
        for r in dec.collect()
    )
    want = sorted(
        (r["time_unix_nano"], r["observed_unix_nano"], r["severity_number"],
         r["severity_text"], r["body"],
         r["trace_id"].lower(), r["span_id"].lower(),
         {"service_name": r["service_name"]}, r["scope_name"],
         tuple(sorted(dict(r["attributes"]).items())))
        for r in _flat_rows(spark).collect()
    )
    assert got == want


def test_otlp_protobuf_wire_details():
    """Codec-level: negative int64 AnyValue, bool/double variants,
    empty request."""
    from opentelemetry_collector_components_spark.functions.protowire import (
        _any_string,
        _ld,
        _vint,
        decode_otlp_logs_request,
        encode_otlp_logs_request,
    )

    assert decode_otlp_logs_request(b"") == []
    # negative int64 AnyValue: build a KV by hand (int_value field 3)
    import struct

    neg = (-5) & (2**64 - 1)
    from opentelemetry_collector_components_spark.functions.protowire import (
        encode_varint,
    )
    any_int = encode_varint(3 << 3 | 0) + encode_varint(neg)
    kv = _ld(1, b"n") + _ld(2, any_int)
    rec = struct.pack("<B", 1 << 3 | 1) + struct.pack("<Q", 7) + _ld(6, kv)
    sl = _ld(1, _ld(1, b"s")) + _ld(2, rec)
    req = _ld(1, _ld(1, b"") + _ld(2, sl))
    out = decode_otlp_logs_request(req)
    assert out[0]["attributes"] == {"n": "-5"}
    assert out[0]["time_unix_nano"] == 7


def test_otlp_protobuf_gzip_transport(spark):
    """Content-Encoding: gzip round trip — compress driver-side with the
    shared codec, decode with compression='gzip'."""
    import pytest as _pytest

    from opentelemetry_collector_components_spark.functions.gzip_codec import (
        gzip_compress,
        gzip_decompress,
    )
    from opentelemetry_collector_components_spark.functions.protowire import (
        encode_otlp_logs_request,
    )
    from opentelemetry_collector_components_spark.sources.otlp import (
        decode_otlp_logs_protobuf,
    )

    raw = encode_otlp_logs_request(
        {"service_name": "s"}, "lib",
        [{"time_unix_nano": 5, "severity_number": 9, "severity_text": "INFO",
          "body": "hi", "attributes": {"a": "b"}}],
    )
    assert gzip_decompress(gzip_compress(raw)) == raw
    # pinned mtime=0: identical payloads -> identical bytes
    assert gzip_compress(raw) == gzip_compress(raw)
    df = spark.createDataFrame([(gzip_compress(raw),)], "body binary")
    r = decode_otlp_logs_protobuf(df, compression="gzip").collect()[0]
    assert r["body"] == "hi" and r["severity_number"] == 9
    assert dict(r["resource_attrs"]) == {"service_name": "s"}
    with _pytest.raises(ValueError):
        decode_otlp_logs_protobuf(df, compression="br")
