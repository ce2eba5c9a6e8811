"""Per-type intake payload decode (S1/S2 full form) — golden parity against
the reference's own testdata (receiver/elasticapmintakereceiver/testdata/
errors.ndjson + errors_expected.yaml; values transcribed below)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.functions.xxh64 import xxh64_hex
from opentelemetry_collector_components_spark.sources.decoders import decode_ndjson_intake
from opentelemetry_collector_components_spark.sources.intake import (
    decode_errors,
    decode_logs,
    decode_metricsets,
    decode_spans,
    decode_transactions,
    error_grouping_key,
    flatten_exception_tree,
    metadata_resource_attrs,
)

_REF_ERRORS = "/root/reference/receiver/elasticapmintakereceiver/testdata/errors.ndjson"


def test_xxh64_matches_reference_pinned_constant():
    # ecsLogErrorGroupingKey, logs.go:227 — xxhash64 of empty input
    assert xxh64_hex(b"") == "ef46db3751d8e999"


@pytest.mark.skipif(not os.path.exists(_REF_ERRORS), reason="reference testdata absent")
def test_error_decode_golden_parity(spark):
    """errors_expected.yaml transcription: id, culprit, timestamp.us,
    grouping key, parent.id, log level, transaction passthrough."""
    lines = spark.read.text(_REF_ERRORS)
    errs = decode_errors(decode_ndjson_intake(lines))
    by_id = {r["error_id"]: r for r in errs.collect()}
    assert len(by_id) == 5

    r = by_id["0123456789012345"]
    assert r["error_grouping_key"] == "487f6c7468d018d4"
    assert r["error_culprit"] == "my.module.function_name"
    assert r["timestamp_us"] == 1494342245999999
    assert r["error_log_level"] == "warning"
    assert r["error_log_message"] == "My service could not talk to the database named foobar"

    assert by_id["xFoaabb123FFFFFF"]["error_grouping_key"] == "256d70df2f0019ed"
    # log present without level -> defaults to "error" (logs.go:405-410)
    assert by_id["xFoaabb123FFFFFF"]["error_log_level"] == "error"
    assert by_id["cdefab0123456789"]["error_grouping_key"] == "89f9636ef3381842"
    r4 = by_id["cdefab0123456780"]
    assert r4["error_grouping_key"] == "60b29d2f9dafe754"
    assert r4["parent_id"] == "9632587410abcdef"
    assert r4["trace_id"] == "0123456789abcdeffedcba0123456789"
    r5 = by_id["abcdef0123456789"]
    assert r5["error_grouping_key"] == "5be7ecce1b964f32"
    assert r5["transaction_name"] == "mytx"
    assert r5["transaction_sampled"] is True
    assert r5["error_log_level"] == "custom log level"


@pytest.mark.skipif(not os.path.exists(_REF_ERRORS), reason="reference testdata absent")
def test_exception_flatten_golden_parity(spark):
    """DFS flatten with implicit-parent rule: DbError, InternalDbError,
    VeryInternalDbError (no parent key — immediate successor), ConnectionError
    (parent=1 — not immediate successor)."""
    lines = spark.read.text(_REF_ERRORS)
    errs = decode_errors(decode_ndjson_intake(lines))
    raw = errs.filter(F.col("error_id") == "0123456789012345").first()["error_exception_json"]
    flat = json.loads(raw)
    assert [e.get("type") for e in flat] == [
        "DbError", "InternalDbError", "VeryInternalDbError", "ConnectionError",
    ]
    assert flat[0]["code"] == "42"  # numeric code stringified
    assert flat[0]["handled"] is False
    assert "parent" not in flat[1]  # follows its parent (idx 0)
    assert "parent" not in flat[2]  # follows its parent (idx 1)
    assert flat[3]["parent"] == 1  # not immediate successor of parent idx 1
    assert flat[3]["code"] == "CONN_ERR"


def test_grouping_key_priority_order():
    # types win over messages; param_message participates
    k_types = error_grouping_key({"type": "A", "cause": [{"type": "B"}]}, None)
    assert k_types == xxh64_hex(b"AB")
    k_param = error_grouping_key(None, {"param_message": "p %s", "message": "m"})
    assert k_param == xxh64_hex(b"p %s")
    # no exception stacktrace -> log stacktrace frames hash (module>filename>classname, then function)
    k_logstack = error_grouping_key(
        None,
        {"message": "m", "stacktrace": [{"filename": "f.py", "function": "fn"}]},
    )
    assert k_logstack == xxh64_hex(b"f.pyfn")
    # fallback: log message only
    assert error_grouping_key(None, {"message": "m"}) == xxh64_hex(b"m")


def test_flatten_none():
    assert flatten_exception_tree(None) is None
    assert flatten_exception_tree({}) is None


def _mk_lines(spark, objs):
    return spark.createDataFrame([(json.dumps(o),) for o in objs], ["value"])


def test_transaction_decode_derived_fields(spark):
    tx = {
        "transaction": {
            "id": "tx1", "trace_id": "t" * 32, "name": "GET /x",
            "type": "", "duration": 32.592, "timestamp": 1535655207154000,
            "outcome": "SuCcEsS", "span_count": {"started": 14, "dropped": 2},
            "context": {"service": {"target": {"type": "db", "name": "main"}},
                        "response": {"status_code": 200}},
        }
    }
    tx2 = {
        "transaction": {
            "id": "tx2", "trace_id": "u" * 32, "type": "request",
            "duration": 13.98, "timestamp": 1535655207154001,
            "sampled": False, "result": "HTTP 2xx",
        }
    }
    out = {
        r["transaction_id"]: r
        for r in decode_transactions(decode_ndjson_intake(_mk_lines(spark, [tx, tx2]))).collect()
    }
    r1 = out["tx1"]
    assert r1["transaction_type"] == "unknown"  # empty -> default
    assert r1["transaction_duration_us"] == 32592
    assert r1["event_outcome"] == "success"  # case-insensitive
    assert r1["transaction_sampled"] is True  # unset -> true
    assert r1["service_target_type"] == "db" and r1["service_target_name"] == "main"
    assert r1["span_count_started"] == 14 and r1["span_count_dropped"] == 2
    assert r1["http_response_status_code"] == 200
    r2 = out["tx2"]
    assert r2["transaction_sampled"] is False
    assert r2["transaction_result"] == "HTTP 2xx"
    assert r2["event_outcome"] == "unknown"  # absent outcome


def test_span_decode_type_split_and_target_derivation(spark):
    sps = [
        {"span": {"id": "s1", "type": "db.mysql.query", "duration": 3.781,
                  "timestamp": 1535655207154000, "outcome": "failure",
                  "context": {"destination": {"service": {"resource": "mysql/users"}}}}},
        {"span": {"id": "s2", "type": "external", "subtype": "http",
                  "duration": 1.0, "timestamp": 1535655207154001,
                  "context": {"destination": {"service": {"resource": "no match!"}},
                              "http": {"status_code": 503}}}},
        {"span": {"id": "s3", "type": "db.postgres.query", "subtype": "explicit",
                  "duration": 2.0, "timestamp": 1535655207154002,
                  "context": {"service": {"target": {"type": "tt", "name": "nn"}},
                              "http": {"status_code": 500,
                                       "response": {"status_code": 200}}}}},
    ]
    out = {r["span_id"]: r for r in decode_spans(decode_ndjson_intake(_mk_lines(spark, sps))).collect()}
    s1 = out["s1"]
    assert (s1["span_type"], s1["span_subtype"], s1["span_action"]) == ("db", "mysql", "query")
    assert s1["span_duration_us"] == 3781
    assert s1["service_target_type"] == "mysql" and s1["service_target_name"] == "users"
    s2 = out["s2"]
    # subtype set -> NO dot split; non-matching resource -> ('', resource)
    assert (s2["span_type"], s2["span_subtype"]) == ("external", "http")
    assert s2["service_target_type"] == "" and s2["service_target_name"] == "no match!"
    assert s2["http_response_status_code"] == 503  # deprecated top-level fallback
    s3 = out["s3"]
    assert s3["span_subtype"] == "explicit"  # explicit subtype blocks split
    assert s3["span_type"] == "db.postgres.query"
    assert s3["service_target_type"] == "tt"  # explicit target wins
    assert s3["http_response_status_code"] == 200  # response wins over top-level


def test_metricset_decode_explodes_samples(spark):
    ms = {
        "metricset": {
            "timestamp": 1496170422281000,
            "samples": {
                "a.counter": {"value": 612.0},
                "latency_distribution": {"values": [1.0, 2.0], "counts": [3, 4],
                                          "type": "histogram", "unit": "s"},
            },
            "transaction": {"name": "GET /", "type": "request"},
            "tags": {"code": "200"},
        }
    }
    rows = {r["metric_name"]: r for r in decode_metricsets(decode_ndjson_intake(_mk_lines(spark, [ms]))).collect()}
    assert rows["a.counter"]["value"] == 612.0
    h = rows["latency_distribution"]
    assert h["histogram_values"] == [1.0, 2.0] and h["histogram_counts"] == [3, 4]
    assert h["metric_type"] == "histogram" and h["metric_unit"] == "s"
    assert h["transaction_name"] == "GET /"


def test_log_decode(spark):
    lg = {"log": {"timestamp": 1680000000000000, "message": "boom",
                   "level": "warn", "logger_name": "app",
                   "labels": {"env": "prod"}}}
    r = decode_logs(decode_ndjson_intake(_mk_lines(spark, [lg]))).first()
    assert r["message"] == "boom" and r["log_level"] == "warn"
    assert r["labels"] == {"env": "prod"}


@pytest.mark.skipif(not os.path.exists(_REF_ERRORS), reason="reference testdata absent")
def test_metadata_resource_attrs_golden(spark):
    """Resource attrs from the errors.ndjson metadata line (values from
    errors_expected.yaml resource section)."""
    lines = spark.read.text(_REF_ERRORS)
    dec = decode_ndjson_intake(lines).filter(F.col("metadata").isNotNull()).limit(1)
    r = metadata_resource_attrs(dec).first()
    assert r["service_name"] == "1234_service-12a3"
    assert r["host_name"] == "prod.example"  # configured over detected
    assert r["host_hostname"] == "myhostname"
    assert r["host_arch"] == "x64"
    assert r["os_type"] == "darwin"
    assert r["container_id"] == "container-id"
    assert r["k8s_namespace_name"] == "namespace1"
    assert r["k8s_pod_uid"] == "pod-uid"
    assert r["cloud_platform"] == "lambda"
    assert r["cloud_account_id"] == "account_id"
    assert r["deployment_environment"] == "staging"
    assert r["service_instance_id"] == "node-abc"
    assert r["telemetry_sdk_name"] == "ElasticAPM"
    assert r["process_pid"] == 1234 and r["process_parent_pid"] == 6789


def test_no_per_row_python_in_txn_span_decode(spark):
    """Transaction/span/metricset/log decode stays fully JVM-side; only the
    error path uses (Arrow-batched) Python for the grouping key."""
    objs = [{"transaction": {"id": "t", "duration": 1.0, "timestamp": 1}},
            {"span": {"id": "s", "type": "db", "duration": 1.0, "timestamp": 1}}]
    dec = decode_ndjson_intake(_mk_lines(spark, objs))
    for fn in (decode_transactions, decode_spans, decode_metricsets, decode_logs):
        plan = fn(dec)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, fn.__name__
    err_plan = decode_errors(dec)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in err_plan and "BatchEvalPython" not in err_plan


_REF_HOSTDATA = "/root/reference/receiver/elasticapmintakereceiver/testdata/hostdata.ndjson"


@pytest.mark.skipif(not os.path.exists(_REF_HOSTDATA), reason="reference testdata absent")
def test_hostdata_golden_parity(spark):
    """hostdata_expected.yaml: host.name is NOT set when configured_hostname
    is absent; host.hostname = detected_hostname over the deprecated
    hostname; transaction.duration.us TRUNCATES (32.592981ms -> 32592)."""
    lines = spark.read.text(_REF_HOSTDATA)
    dec = decode_ndjson_intake(lines)
    md = metadata_resource_attrs(dec.filter(F.col("metadata").isNotNull()).limit(1)).first()
    assert md["host_name"] is None
    assert md["host_hostname"] == "gregs-mbp-2"
    assert md["service_name"] == "SampleAspNetCoreApp"
    assert md["process_pid"] == 63039
    tx = decode_transactions(dec).first()
    assert tx["transaction_id"] == "945254c567a5417e"
    assert tx["timestamp_us"] == 1496170407154000
    assert tx["transaction_duration_us"] == 32592  # int64 truncation, not round
    assert tx["span_count_started"] == 43


def test_span_type_two_segments_ansi_safe(spark):
    """A 2-segment span type ("db.mysql", no subtype/action) must split to
    (db, mysql, NULL) — a bare parts[2] throws INVALID_ARRAY_INDEX under
    the session's ANSI mode."""
    import json

    from opentelemetry_collector_components_spark.sources.intake import decode_spans

    payload = json.dumps(
        {"id": "s1", "trace_id": "t", "type": "db.mysql",
         "duration": 1.5, "timestamp": 1}
    )
    df = spark.createDataFrame(
        [("span", payload, "{}")], "event_type string, payload string, metadata string"
    )
    row = decode_spans(df).select("span_type", "span_subtype", "span_action").first()
    assert (row.span_type, row.span_subtype, row.span_action) == ("db", "mysql", None)
