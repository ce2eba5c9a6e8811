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

def test_otlp_traces_protobuf_codec_round_trip():
    """Codec-level traces wire: bytes ids, fixed64 times, varint kind,
    nested Status — plus the proto3-default span (no parent, no status,
    kind 0)."""
    from opentelemetry_collector_components_spark.functions.protowire import (
        decode_otlp_traces_request,
        encode_otlp_traces_request,
    )

    full = {
        "trace_id": "0" * 30 + "ab", "span_id": "0" * 14 + "cd",
        "parent_span_id": "0" * 14 + "ef", "name": "op", "kind": 3,
        "start_time_unix_nano": 1_700_000_000_000_000_000,
        "end_time_unix_nano": 1_700_000_000_000_000_777,
        "status_code": 2, "status_message": "boom",
        "attributes": {"a": "1", "b": "x"},
    }
    bare = {
        "trace_id": "1" * 32, "span_id": "2" * 16,
        "parent_span_id": None, "name": "root", "kind": 0,
        "start_time_unix_nano": 5, "end_time_unix_nano": 6,
        "status_code": 0, "status_message": None, "attributes": {},
    }
    buf = encode_otlp_traces_request({"service_name": "s"}, "tracer",
                                     [full, bare])
    out = decode_otlp_traces_request(buf)
    assert len(out) == 2
    got_full = next(s for s in out if s["name"] == "op")
    for k, v in full.items():
        assert got_full[k] == v, k
    assert got_full["resource_attrs"] == {"service_name": "s"}
    assert got_full["scope_name"] == "tracer"
    got_bare = next(s for s in out if s["name"] == "root")
    assert got_bare["parent_span_id"] is None
    assert got_bare["kind"] == 0 and got_bare["status_code"] == 0
    assert got_bare["status_message"] is None
    assert decode_otlp_traces_request(b"") == []


def test_otlp_metrics_protobuf_codec_round_trip():
    """Codec-level metrics wire, all five types: sfixed64 as_int (incl.
    negative), packed fixed64/double/uint64, zigzag sint32 scale and
    offsets, ValueAtQuantile, temporality/monotonic on the typed data."""
    import pytest as _pytest

    from opentelemetry_collector_components_spark.functions.protowire import (
        decode_otlp_metrics_request,
        encode_otlp_metrics_request,
    )

    pts = [
        {"metric_type": "gauge", "metric_name": "g",
         "time_unix_nano": 10, "value_double": -2.5,
         "attributes": {"k": "v"}},
        {"metric_type": "sum", "metric_name": "s",
         "time_unix_nano": 11, "start_time_unix_nano": 1,
         "value_long": -7, "temporality": 2, "is_monotonic": True},
        {"metric_type": "histogram", "metric_name": "h",
         "time_unix_nano": 12, "count": 6, "sum": 9.5,
         "bounds": [1.0, 2.5], "bucket_counts": [1, 2, 3],
         "min": 0.5, "max": 9.0, "temporality": 1},
        {"metric_type": "exponential_histogram", "metric_name": "e",
         "time_unix_nano": 13, "count": 4, "sum": 3.0, "scale": -2,
         "zero_count": 1, "pos_offset": -3, "pos_bucket_counts": [2, 1],
         "neg_offset": 0, "neg_bucket_counts": [1], "temporality": 2},
        {"metric_type": "summary", "metric_name": "q",
         "time_unix_nano": 14, "count": 9, "sum": 4.5,
         "q_quantiles": [0.5, 0.99], "q_values": [1.0, 8.0]},
    ]
    out = decode_otlp_metrics_request(
        encode_otlp_metrics_request({"service_name": "s"}, "lib", pts)
    )
    by_name = {p["metric_name"]: p for p in out}
    assert len(out) == 5
    assert by_name["g"]["value_double"] == -2.5
    assert by_name["g"]["attributes"] == {"k": "v"}
    assert by_name["g"]["temporality"] is None
    assert by_name["s"]["value_long"] == -7
    assert by_name["s"]["temporality"] == 2
    assert by_name["s"]["is_monotonic"] is True
    h = by_name["h"]
    assert (h["count"], h["sum"], h["min"], h["max"]) == (6, 9.5, 0.5, 9.0)
    assert h["bounds"] == [1.0, 2.5] and h["bucket_counts"] == [1, 2, 3]
    e = by_name["e"]
    assert (e["scale"], e["zero_count"]) == (-2, 1)
    assert (e["pos_offset"], e["pos_bucket_counts"]) == (-3, [2, 1])
    assert (e["neg_offset"], e["neg_bucket_counts"]) == (0, [1])
    q = by_name["q"]
    assert q["q_quantiles"] == [0.5, 0.99] and q["q_values"] == [1.0, 8.0]
    for p in out:
        assert p["resource_attrs"] == {"service_name": "s"}
        assert p["scope_name"] == "lib"
    with _pytest.raises(ValueError):
        encode_otlp_metrics_request({}, "lib", [{"metric_type": "nope"}])
    assert decode_otlp_metrics_request(b"") == []


def test_otlp_metrics_protobuf_proto3_defaults():
    """An exponential-histogram datapoint encoded with scale=0/offset=0/
    zero_count=0 omits those fields on the wire (proto3); the decoder
    must restore the defaults, not None."""
    from opentelemetry_collector_components_spark.functions.protowire import (
        decode_otlp_metrics_request,
        encode_otlp_metrics_request,
    )

    p = {"metric_type": "exponential_histogram", "metric_name": "e0",
         "time_unix_nano": 1, "count": 2, "scale": 0, "zero_count": 0,
         "pos_offset": 0, "pos_bucket_counts": [1, 1]}
    out = decode_otlp_metrics_request(
        encode_otlp_metrics_request({}, "lib", [p])
    )[0]
    assert out["scale"] == 0 and out["zero_count"] == 0
    assert out["pos_offset"] == 0 and out["pos_bucket_counts"] == [1, 1]
    assert out["neg_bucket_counts"] is None


def test_otlp_traces_protobuf_spark_round_trip(spark):
    """Spark-level traces wire: encode_otlp_traces_protobuf ->
    decode_otlp_traces_protobuf lands on the flat span model."""
    from opentelemetry_collector_components_spark.sources.otlp import (
        decode_otlp_traces_protobuf,
        encode_otlp_traces_protobuf,
    )

    rows = [
        ("a" * 32, "b" * 16, "c" * 16, "op-a", 2, 100, 200, 2, "failed",
         {"x": "1"}, "svc-0", "tr"),
        ("d" * 32, "e" * 16, None, "op-b", 1, 300, 400, 0, None,
         {}, "svc-1", "tr"),
    ]
    df = spark.createDataFrame(
        rows,
        "trace_id string, span_id string, parent_span_id string, "
        "name string, kind int, start_time_unix_nano long, "
        "end_time_unix_nano long, status_code int, status_message string, "
        "attributes map<string,string>, service_name string, "
        "scope_name string",
    )
    dec = decode_otlp_traces_protobuf(encode_otlp_traces_protobuf(df))
    got = {r["span_id"]: r for r in dec.collect()}
    assert len(got) == 2
    a = got["b" * 16]
    assert a["parent_span_id"] == "c" * 16 and a["status_code"] == 2
    assert a["status_message"] == "failed" and a["kind"] == 2
    assert dict(a["attributes"]) == {"x": "1"}
    assert dict(a["resource_attrs"]) == {"service_name": "svc-0"}
    b = got["e" * 16]
    assert b["parent_span_id"] is None and b["status_message"] is None
    assert b["status_code"] == 0

def test_otlp_metrics_protobuf_int64_exact_with_nulls(spark):
    """Arrow transport regression: a nullable long column (gauge rows
    have no start_time) must NOT corrupt int64 nanoseconds >2^53 via
    pandas float64 coercion — the encoders run mapInArrow."""
    from opentelemetry_collector_components_spark.sources.otlp import (
        decode_otlp_metrics_protobuf,
        encode_otlp_metrics_protobuf,
    )

    big = 1_700_000_000_000_000_777  # not representable in float64
    rows = [
        ("gauge", "g", big, None, 1.5, None, "s", "lib"),
        ("sum", "c", big + 1, big, None, 2**53 + 1, "s", "lib"),
    ]
    df = spark.createDataFrame(
        rows,
        "metric_type string, metric_name string, time_unix_nano long, "
        "start_time_unix_nano long, value_double double, value_long long, "
        "service_name string, scope_name string",
    ).coalesce(1)  # one Arrow batch mixing null and huge start times
    got = {
        r["metric_name"]: r
        for r in decode_otlp_metrics_protobuf(
            encode_otlp_metrics_protobuf(df)
        ).collect()
    }
    assert got["g"]["time_unix_nano"] == big
    assert got["g"]["start_time_unix_nano"] is None
    assert got["c"]["start_time_unix_nano"] == big
    assert got["c"]["value_long"] == 2**53 + 1


def test_otlp_traces_protobuf_null_names_and_times(spark):
    """NULL service_name/scope_name must not become the string 'None'
    (resource attr omitted, scope name proto3-default empty); NULL
    start/end times round-trip as NULL, not a crash."""
    from opentelemetry_collector_components_spark.sources.otlp import (
        decode_otlp_traces_protobuf,
        encode_otlp_traces_protobuf,
    )

    df = spark.createDataFrame(
        [("f" * 32, "a" * 16, "x", None, None, None, None)],
        "trace_id string, span_id string, name string, "
        "start_time_unix_nano long, end_time_unix_nano long, "
        "service_name string, scope_name string",
    )
    r = decode_otlp_traces_protobuf(encode_otlp_traces_protobuf(df)).collect()[0]
    assert dict(r["resource_attrs"]) == {}
    assert r["scope_name"] == ""
    assert r["start_time_unix_nano"] is None
    assert r["end_time_unix_nano"] is None


def test_otlp_metrics_protobuf_negative_bucket_count_terminates():
    """A corrupted negative bucket count must encode (uint64 wrap, the
    _fixed64 masking convention) instead of hanging encode_varint."""
    from opentelemetry_collector_components_spark.functions.protowire import (
        decode_otlp_metrics_request,
        encode_otlp_metrics_request,
    )

    p = {"metric_type": "exponential_histogram", "metric_name": "e",
         "time_unix_nano": 1, "count": 1, "pos_bucket_counts": [-1]}
    out = decode_otlp_metrics_request(
        encode_otlp_metrics_request({}, "lib", [p])
    )[0]
    assert out["pos_bucket_counts"] == [2**64 - 1]


def test_otlp_metrics_protobuf_implicit_presence_decode():
    """A conformant third-party sender omits proto3 zero scalars:
    count=0 and ValueAtQuantile quantile/value=0.0 must decode as the
    defaults, not None.  Wire built by hand to bypass our encoder."""
    from opentelemetry_collector_components_spark.functions.protowire import (
        _double,
        _fixed64,
        _ld,
        decode_otlp_metrics_request,
    )

    # SummaryDataPoint with time only + one ValueAtQuantile{value=3.0}
    # (quantile omitted = 0.0 = the min quantile); count omitted = 0
    dp = _fixed64(3, 9) + _ld(6, _double(2, 3.0))
    metric = _ld(1, b"q") + _ld(11, _ld(1, dp))
    scope = _ld(1, _ld(1, b"lib")) + _ld(2, metric)
    req = _ld(1, _ld(1, _ld(1, b"")) + _ld(2, scope))
    out = decode_otlp_metrics_request(req)[0]
    assert out["count"] == 0
    assert out["q_quantiles"] == [0.0] and out["q_values"] == [3.0]


def test_otlp_metrics_protobuf_ragged_quantiles_raise():
    import pytest as _pytest

    from opentelemetry_collector_components_spark.functions.protowire import (
        encode_otlp_metrics_request,
    )

    p = {"metric_type": "summary", "metric_name": "q",
         "time_unix_nano": 1, "count": 1,
         "q_quantiles": [0.5, 0.9, 0.99], "q_values": [1.0, 8.0]}
    with _pytest.raises(ValueError, match="length mismatch"):
        encode_otlp_metrics_request({}, "lib", [p])

def test_otlp_protobuf_batched_exporter_shape(spark):
    """batched=True packs each (service, scope) run per partition into
    ONE request — fewer bodies than rows — and decode re-flattens to
    the same rows as the per-row wire."""
    from opentelemetry_collector_components_spark.sources.otlp import (
        decode_otlp_logs_protobuf,
        encode_otlp_logs_protobuf,
    )

    flat = _flat_rows(spark).coalesce(1)
    enc = encode_otlp_logs_protobuf(flat, batched=True)
    n_rows = flat.count()
    n_bodies = enc.count()
    n_groups = flat.select("service_name", "scope_name").distinct().count()
    assert n_bodies == n_groups < n_rows
    per_row = decode_otlp_logs_protobuf(encode_otlp_logs_protobuf(flat))
    batched = decode_otlp_logs_protobuf(enc)
    key = lambda r: (r["time_unix_nano"], r["body"],  # noqa: E731
                     tuple(sorted(dict(r["resource_attrs"]).items())),
                     r["scope_name"],
                     tuple(sorted(dict(r["attributes"]).items())))
    assert sorted(map(key, batched.collect())) == sorted(
        map(key, per_row.collect())
    )

def test_otlp_metrics_protobuf_exemplars_codec():
    """Exemplar wire shapes: as_double with trace/span ids, NEGATIVE
    as_int without ids, per-type field numbers (NumberDataPoint=5,
    Histogram=8, ExpHistogram=11); summary rejects exemplars."""
    import pytest as _pytest

    from opentelemetry_collector_components_spark.functions.protowire import (
        decode_otlp_metrics_request,
        encode_otlp_metrics_request,
    )

    exs = [
        {"time_unix_nano": 9, "value_double": 1.4,
         "trace_id": "a" * 32, "span_id": "b" * 16},
        {"time_unix_nano": 10, "value_long": -4},
    ]
    pts = [
        {"metric_type": "gauge", "metric_name": "g", "time_unix_nano": 10,
         "value_double": 1.5, "exemplars": exs},
        {"metric_type": "histogram", "metric_name": "h",
         "time_unix_nano": 12, "count": 3, "exemplars": exs},
        {"metric_type": "exponential_histogram", "metric_name": "e",
         "time_unix_nano": 13, "count": 1, "exemplars": exs},
        {"metric_type": "sum", "metric_name": "s", "time_unix_nano": 14,
         "value_long": 5},
    ]
    out = decode_otlp_metrics_request(
        encode_otlp_metrics_request({}, "lib", pts)
    )
    by_name = {p["metric_name"]: p for p in out}
    for name in ("g", "h", "e"):
        got = by_name[name]["exemplars"]
        assert len(got) == 2
        assert got[0]["value_double"] == 1.4
        assert got[0]["trace_id"] == "a" * 32
        assert got[0]["span_id"] == "b" * 16
        assert got[1]["value_long"] == -4
        assert got[1]["trace_id"] is None
    assert by_name["s"]["exemplars"] is None
    with _pytest.raises(ValueError, match="no exemplars"):
        encode_otlp_metrics_request({}, "lib", [
            {"metric_type": "summary", "metric_name": "q",
             "time_unix_nano": 1, "count": 1,
             "exemplars": [{"value_double": 1.0}]}
        ])

def test_otlp_traces_protobuf_events_links_codec():
    """Span.events (field 11) / Span.links (field 13) round trip:
    nested attrs, multiple entries, absent -> None (not [])."""
    from opentelemetry_collector_components_spark.functions.protowire import (
        decode_otlp_traces_request,
        encode_otlp_traces_request,
    )

    span = {
        "trace_id": "1" * 32, "span_id": "2" * 16, "name": "op",
        "start_time_unix_nano": 5, "end_time_unix_nano": 9,
        "events": [
            {"time_unix_nano": 6, "name": "exception",
             "attributes": {"msg": "boom"}},
            {"time_unix_nano": 7, "name": "retry", "attributes": {}},
        ],
        "links": [
            {"trace_id": "3" * 32, "span_id": "4" * 16,
             "attributes": {"kind": "follows"}},
        ],
    }
    bare = {"trace_id": "5" * 32, "span_id": "6" * 16, "name": "leaf",
            "start_time_unix_nano": 1, "end_time_unix_nano": 2}
    out = decode_otlp_traces_request(
        encode_otlp_traces_request({}, "tr", [span, bare])
    )
    got = {s["name"]: s for s in out}
    evs = got["op"]["events"]
    assert [e["name"] for e in evs] == ["exception", "retry"]
    assert evs[0]["time_unix_nano"] == 6
    assert evs[0]["attributes"] == {"msg": "boom"}
    lks = got["op"]["links"]
    assert lks[0]["trace_id"] == "3" * 32
    assert lks[0]["span_id"] == "4" * 16
    assert lks[0]["attributes"] == {"kind": "follows"}
    assert got["leaf"]["events"] is None and got["leaf"]["links"] is None
