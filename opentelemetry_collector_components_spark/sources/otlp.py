"""OTLP/JSON logs wire format: encode + decode, all JVM expressions.

The OpenTelemetry Protocol's JSON mapping (ExportLogsServiceRequest;
opentelemetry-proto logs.proto + proto3 JSON rules) is the lingua
franca the reference's receivers ultimately speak — pdata IS this tree
(resourceLogs[] -> scopeLogs[] -> logRecords[]), and the repo's flat
row model (SURVEY.md §1.3) is its relational projection.  This module
closes the wire loop beside the Elastic intake NDJSON
(``sources/intake.py``), syslog, logfmt, beats json/csv and
prometheusremotewrite decoders:

- ``encode_otlp_logs``: flat rows -> one ExportLogsServiceRequest JSON
  per (resource, scope) group, built with ``F.struct``/``to_json`` —
  the exporter side.
- ``decode_otlp_logs``: payload JSON -> flat rows via ``from_json`` +
  three ``explode``s and ``map_from_entries`` attribute folding — the
  receiver side.  Exact inverse of the encoder (round-trip pinned in
  tests and the oracle gate).

proto3 JSON details honored: int64 fields (timeUnixNano,
observedTimeUnixNano, intValue) are STRINGS on the wire; severityNumber
is a plain int; trace/span ids are lowercase hex.  AnyValue support:
stringValue / intValue / doubleValue / boolValue (arrayValue/kvlistValue
out of scope — documented, rejected as NULL attribute values, the flat
row model carries string maps).  Attribute VALUES land stringified in
``map<string,string>`` — the repo-wide open-attribute convention.

Scale shape: both directions are pure column expressions (from_json /
to_json / transform / map_from_entries / explode) — whole-stage
codegen, no Python, scan-side prunable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: from_json schema for ExportLogsServiceRequest (subset: scalar AnyValue)
OTLP_LOGS_DDL = (
    "resourceLogs ARRAY<STRUCT<"
    "resource: STRUCT<"
    "attributes: ARRAY<STRUCT<key: STRING, value: STRUCT<"
    "stringValue: STRING, intValue: STRING, doubleValue: DOUBLE,"
    "boolValue: BOOLEAN>>>, droppedAttributesCount: INT>,"
    "scopeLogs: ARRAY<STRUCT<"
    "scope: STRUCT<name: STRING, version: STRING>,"
    "logRecords: ARRAY<STRUCT<"
    "timeUnixNano: STRING, observedTimeUnixNano: STRING,"
    "severityNumber: INT, severityText: STRING,"
    "body: STRUCT<stringValue: STRING, intValue: STRING,"
    "doubleValue: DOUBLE, boolValue: BOOLEAN>,"
    "attributes: ARRAY<STRUCT<key: STRING, value: STRUCT<"
    "stringValue: STRING, intValue: STRING, doubleValue: DOUBLE,"
    "boolValue: BOOLEAN>>>,"
    "droppedAttributesCount: INT,"
    "traceId: STRING, spanId: STRING>>>>>>"
)


def _any_value_to_string(v: Column) -> Column:
    """Scalar AnyValue -> string (proto3 JSON: intValue is a string
    already; double/bool stringified; kvlist/array unsupported -> NULL)."""
    return F.coalesce(
        v["stringValue"],
        v["intValue"],
        v["doubleValue"].cast("string"),
        v["boolValue"].cast("string"),
    )


def _attrs_to_map(attrs: Column) -> Column:
    return F.map_from_entries(
        F.transform(
            attrs,
            lambda a: F.struct(
                a["key"].alias("key"),
                _any_value_to_string(a["value"]).alias("value"),
            ),
        )
    )


def decode_otlp_logs(df: DataFrame, json_col: str = "payload") -> DataFrame:
    """ExportLogsServiceRequest JSON -> one flat row per logRecord:
    (time_unix_nano LONG, observed_unix_nano LONG, severity_number INT,
    severity_text, body STRING, trace_id, span_id,
    resource_attrs MAP<STRING,STRING>, scope_name, scope_version,
    attributes MAP<STRING,STRING>, dropped_attributes_count INT).

    Malformed JSON yields zero rows for that payload (from_json NULL ->
    explode of NULL drops it), the standard decoder-leniency contract
    (``sources/decoders.py``); count upstream if loss must alarm."""
    parsed = df.select(
        F.from_json(F.col(json_col), OTLP_LOGS_DDL).alias("_req")
    )
    rl = parsed.select(F.explode("_req.resourceLogs").alias("_rl"))
    sl = rl.select(
        _attrs_to_map(F.col("_rl.resource.attributes")).alias("resource_attrs"),
        F.explode("_rl.scopeLogs").alias("_sl"),
    )
    lr = sl.select(
        "resource_attrs",
        F.col("_sl.scope.name").alias("scope_name"),
        F.col("_sl.scope.version").alias("scope_version"),
        F.explode("_sl.logRecords").alias("_lr"),
    )
    return lr.select(
        F.col("_lr.timeUnixNano").cast("long").alias("time_unix_nano"),
        F.col("_lr.observedTimeUnixNano").cast("long").alias(
            "observed_unix_nano"
        ),
        F.col("_lr.severityNumber").alias("severity_number"),
        F.col("_lr.severityText").alias("severity_text"),
        _any_value_to_string(F.col("_lr.body")).alias("body"),
        F.col("_lr.traceId").alias("trace_id"),
        F.col("_lr.spanId").alias("span_id"),
        "resource_attrs",
        "scope_name",
        "scope_version",
        _attrs_to_map(F.col("_lr.attributes")).alias("attributes"),
        F.coalesce(F.col("_lr.droppedAttributesCount"), F.lit(0)).alias(
            "dropped_attributes_count"
        ),
    )


def _string_any(value: Column) -> Column:
    return F.struct(value.cast("string").alias("stringValue"))


def _kv_array(m: Column) -> Column:
    """map<string,string> -> sorted OTLP attribute array (sorted keys
    keep the wire bytes deterministic for tests/oracles)."""
    return F.transform(
        F.array_sort(F.map_keys(m)),
        lambda k: F.struct(
            k.alias("key"), _string_any(m[k]).alias("value")
        ),
    )


def encode_otlp_logs(
    df: DataFrame,
    resource_cols: list[str],
    scope_name_col: str = "scope_name",
    scope_version_col: str = "scope_version",
) -> DataFrame:
    """Flat rows -> (group keys..., payload STRING): one
    ExportLogsServiceRequest per (resource identity, scope) group with
    all the group's records in ONE resourceLogs/scopeLogs entry —
    the exporter-side batching shape (reference:
    exporter/elasticsearchexporter groups by resource the same way).
    Record order inside a payload is (time_unix_nano, body) — a total,
    engine-independent order.  String-typed attribute values only (the
    flat model's convention; typed re-encode is the caller's lookup).

    Input columns: time_unix_nano, observed_unix_nano, severity_number,
    severity_text, body, trace_id, span_id,
    attributes MAP<STRING,STRING>, plus ``resource_cols`` (scalar
    resource attributes) and the scope columns."""
    rec = F.struct(
        F.col("time_unix_nano").cast("string").alias("timeUnixNano"),
        F.col("observed_unix_nano").cast("string").alias(
            "observedTimeUnixNano"
        ),
        F.col("severity_number").cast("int").alias("severityNumber"),
        F.col("severity_text").alias("severityText"),
        _string_any(F.col("body")).alias("body"),
        _kv_array(F.col("attributes")).alias("attributes"),
        F.col("trace_id").alias("traceId"),
        F.col("span_id").alias("spanId"),
    )
    grouped = (
        df.withColumn("_rec", rec)
        .groupBy(*resource_cols, scope_name_col, scope_version_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_rec.timeUnixNano").cast("long").alias("_t"),
                        F.col("_rec.body.stringValue").alias("_b"),
                        F.col("_rec").alias("r"),
                    )
                )
            ).alias("_recs")
        )
    )
    res_attrs = F.array(
        *[
            F.struct(
                F.lit(c).alias("key"),
                _string_any(F.col(c)).alias("value"),
            )
            for c in sorted(resource_cols)
        ]
    )
    payload = F.to_json(
        F.struct(
            F.array(
                F.struct(
                    F.struct(res_attrs.alias("attributes")).alias("resource"),
                    F.array(
                        F.struct(
                            F.struct(
                                F.col(scope_name_col).alias("name"),
                                F.col(scope_version_col).alias("version"),
                            ).alias("scope"),
                            F.transform(
                                F.col("_recs"), lambda x: x["r"]
                            ).alias("logRecords"),
                        )
                    ).alias("scopeLogs"),
                )
            ).alias("resourceLogs")
        )
    )
    return grouped.select(
        *resource_cols, scope_name_col, scope_version_col,
        payload.alias("payload"),
    )
