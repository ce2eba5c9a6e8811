"""Per-event-type payload decode for the APM intake v2 NDJSON protocol (S1/S2
full form).

The reference decodes each dispatched event payload into typed fields and
derived attributes (receiver/elasticapmintakereceiver/internal/ndjsondecoder/
traces.go:44-960, logs.go, metrics.go; mappers/intakeV2ToDerivedFields.go:
33-229).  Spark-first shape: one ``from_json`` per event type with an explicit
StructType (Catalyst prunes unreferenced fields from the JSON parse), then the
derived-field cascades as column expressions.  The only Python on the path is
the error-event grouping-key/exception-flatten UDF, which needs a byte-stream
XXH64 and a recursive cause-tree walk JSON schemas can't bound — it runs as a
single Arrow-batched pandas UDF per error row.

Scale note: each decoder parses the payload ONCE with the full per-type
schema and materializes the typed record — the right shape for the
decode-then-persist pattern (downstream reads hit columnar parquet, where
column pruning is free).  Catalyst CAN prune a from_json schema down to the
accessed fields (OptimizeJsonExprs), but only within one projection;
stacking a narrow select on top of these decoders keeps the full parse
because CollapseProject refuses to duplicate the non-cheap from_json.  For
a narrow one-off extraction over raw NDJSON, use ``get_json_object``
directly instead of a decoder.

Derived-field parity (mappers/intakeV2ToDerivedFields.go + traces.go):
- timestamp.us = intake timestamp (already µs; traces.go:191,427)
- processor.event = transaction|span|error|metric|log
- event.outcome: case-insensitive success/failure else unknown
  (traces.go:592-601)
- transaction.duration.us / span.duration.us = duration_ms * 1000
  (traces.go:194,430)
- transaction.type / span.type default "unknown"; span type dot-splits into
  type.subtype.action when subtype+action absent (traces.go:605-620)
- transaction.sampled = true unless explicitly false (traces.go:444-447)
- service.target: explicit context.service.target, else derived from
  destination.service.resource "type" / "type/name" (traces.go:198-206,935)
- error.grouping_key: XXH64 over exception types (DFS) -> log param_message
  -> exception stacktraces (DFS) -> log stacktrace -> fallback messages
  (logs.go:245-334)
- error.exception: DFS-flattened cause tree; parent index written only when
  an exception is not the immediate DFS successor of its parent
  (mappers/intakeV2ToDerivedFields.go:157-229)
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

_FRAME_DDL = (
    "abs_path STRING, filename STRING, classname STRING, function STRING, "
    "module STRING, lineno BIGINT, colno BIGINT, library_frame BOOLEAN, "
    "context_line STRING, pre_context ARRAY<STRING>, post_context ARRAY<STRING>"
)

TRANSACTION_DDL = f"""
    id STRING, trace_id STRING, parent_id STRING, name STRING, type STRING,
    result STRING, outcome STRING, duration DOUBLE, timestamp BIGINT,
    sampled BOOLEAN, sample_rate DOUBLE,
    span_count STRUCT<started: BIGINT, dropped: BIGINT>,
    session STRUCT<id: STRING, sequence: BIGINT>,
    context STRUCT<
        service: STRUCT<target: STRUCT<type: STRING, name: STRING>>,
        request: STRUCT<method: STRING, http_version: STRING,
                        url: STRUCT<full: STRING, protocol: STRING,
                                    hostname: STRING, pathname: STRING>>,
        response: STRUCT<status_code: BIGINT>,
        message: STRUCT<queue: STRUCT<name: STRING>>
    >,
    dropped_spans_stats ARRAY<STRUCT<
        destination_service_resource: STRING, service_target_type: STRING,
        service_target_name: STRING, outcome: STRING,
        duration: STRUCT<count: BIGINT, sum: STRUCT<us: BIGINT>>>>
"""

SPAN_DDL = """
    id STRING, trace_id STRING, parent_id STRING, transaction_id STRING,
    name STRING, type STRING, subtype STRING, action STRING, sync BOOLEAN,
    outcome STRING, duration DOUBLE, timestamp BIGINT, start DOUBLE,
    sample_rate DOUBLE,
    composite STRUCT<count: BIGINT, sum: DOUBLE, compression_strategy: STRING>,
    context STRUCT<
        destination: STRUCT<address: STRING, port: BIGINT,
            service: STRUCT<resource: STRING, name: STRING, type: STRING>>,
        service: STRUCT<target: STRUCT<type: STRING, name: STRING>>,
        db: STRUCT<type: STRING, instance: STRING, statement: STRING,
                   link: STRING, rows_affected: BIGINT, user: STRING>,
        http: STRUCT<method: STRING, status_code: BIGINT, url: STRING,
            response: STRUCT<status_code: BIGINT, encoded_body_size: BIGINT,
                             decoded_body_size: BIGINT, transfer_size: BIGINT>,
            request: STRUCT<id: STRING>>,
        message: STRUCT<queue: STRUCT<name: STRING>>
    >
"""

ERROR_DDL = f"""
    id STRING, trace_id STRING, parent_id STRING, transaction_id STRING,
    timestamp BIGINT, culprit STRING,
    transaction STRUCT<sampled: BOOLEAN, type: STRING, name: STRING>,
    log STRUCT<message: STRING, param_message: STRING, logger_name: STRING,
               level: STRING, stacktrace: ARRAY<STRUCT<{_FRAME_DDL}>>>
"""

METRICSET_DDL = """
    timestamp BIGINT,
    span STRUCT<type: STRING, subtype: STRING>,
    transaction STRUCT<name: STRING, type: STRING>,
    samples MAP<STRING, STRUCT<value: DOUBLE, values: ARRAY<DOUBLE>,
                               counts: ARRAY<BIGINT>, type: STRING,
                               unit: STRING>>,
    tags MAP<STRING, STRING>
"""

LOG_DDL = """
    timestamp BIGINT, message STRING, level STRING, logger_name STRING,
    trace_id STRING, transaction_id STRING, span_id STRING,
    labels MAP<STRING, STRING>
"""

METADATA_DDL = """
    service STRUCT<name: STRING, version: STRING, environment: STRING,
        node: STRUCT<configured_name: STRING>,
        language: STRUCT<name: STRING, version: STRING>,
        runtime: STRUCT<name: STRING, version: STRING>,
        framework: STRUCT<name: STRING, version: STRING>,
        agent: STRUCT<name: STRING, version: STRING, ephemeral_id: STRING,
                      activation_method: STRING>>,
    process STRUCT<pid: BIGINT, ppid: BIGINT, title: STRING,
                   argv: ARRAY<STRING>>,
    system STRUCT<hostname: STRING, configured_hostname: STRING,
        detected_hostname: STRING, architecture: STRING, platform: STRING,
        container: STRUCT<id: STRING>,
        kubernetes: STRUCT<namespace: STRING,
            pod: STRUCT<uid: STRING, name: STRING>,
            node: STRUCT<name: STRING>>>,
    user STRUCT<id: STRING, username: STRING, email: STRING, domain: STRING>,
    cloud STRUCT<provider: STRING, region: STRING, availability_zone: STRING,
        account: STRUCT<id: STRING, name: STRING>,
        instance: STRUCT<id: STRING, name: STRING>,
        machine: STRUCT<type: STRING>,
        project: STRUCT<id: STRING, name: STRING>,
        service: STRUCT<name: STRING>>,
    labels MAP<STRING, STRING>
"""


def generate_intake_ndjson(spark, n: int = 5000) -> DataFrame:
    """Deterministic mixed-type intake NDJSON fixture (one JSON line per id;
    event type cycles with ``id % 5``).  Every field is modular arithmetic in
    ``id`` so an ANSI-SQL oracle can recompute the decoded output exactly —
    the same trick as ``sources/spans.py`` (see queries._SPANS_CTE).
    ``to_json`` drops null struct fields, which exercises the decoders'
    omitted-field defaults (type->unknown, sampled->true, level->error)."""
    i = F.col("id")
    ts = F.lit(1700000000000000).cast("long") + i

    tx = F.struct(
        F.concat(F.lit("tx"), i).alias("id"),
        F.concat(F.lit("tr"), F.pmod(i, F.lit(97))).alias("trace_id"),
        F.concat(F.lit("op-"), F.pmod(i, F.lit(8))).alias("name"),
        F.when(F.pmod(i, F.lit(11)) == 0, F.lit(""))
        .when(F.pmod(i, F.lit(11)) != 1, F.lit("request"))
        .alias("type"),
        (F.pmod(i, F.lit(5000)) / F.lit(2.0)).alias("duration"),
        ts.alias("timestamp"),
        F.element_at(
            F.array(F.lit("success"), F.lit("FAILURE"), F.lit("weird")),
            (F.pmod(i, F.lit(3)) + 1).cast("int"),
        ).alias("outcome"),
        F.when(F.pmod(i, F.lit(7)) == 0, F.lit(False)).alias("sampled"),
        F.when(F.pmod(i, F.lit(4)) == 0, F.lit("HTTP 2xx")).alias("result"),
        F.struct(
            F.pmod(i, F.lit(20)).alias("started"),
            F.when(F.pmod(i, F.lit(6)) == 0, F.pmod(i, F.lit(3))).alias("dropped"),
        ).alias("span_count"),
        F.struct(
            F.when(
                F.pmod(i, F.lit(9)) < 4,
                F.struct(
                    F.struct(
                        F.lit("db").alias("type"),
                        F.concat(F.lit("tgt"), F.pmod(i, F.lit(5))).alias("name"),
                    ).alias("target")
                ),
            ).alias("service"),
            F.when(
                F.pmod(i, F.lit(2)) == 0,
                F.struct((F.lit(200) + F.pmod(i, F.lit(300))).alias("status_code")),
            ).alias("response"),
        ).alias("context"),
    )

    sp = F.struct(
        F.concat(F.lit("sp"), i).alias("id"),
        F.concat(F.lit("tr"), F.pmod(i, F.lit(97))).alias("trace_id"),
        F.concat(F.lit("tx"), i - 1).alias("transaction_id"),
        F.concat(F.lit("q-"), F.pmod(i, F.lit(6))).alias("name"),
        F.element_at(
            F.array(F.lit("db.mysql.query"), F.lit("external"), F.lit("cache")),
            (F.pmod(i, F.lit(3)) + 1).cast("int"),
        ).alias("type"),
        F.when(F.pmod(i, F.lit(3)) == 1, F.lit("http")).alias("subtype"),
        (F.pmod(i, F.lit(1000)) / F.lit(2.0)).alias("duration"),
        ts.alias("timestamp"),
        F.element_at(
            F.array(F.lit("success"), F.lit("failure")),
            (F.pmod(i, F.lit(2)) + 1).cast("int"),
        ).alias("outcome"),
        F.when(
            F.pmod(i, F.lit(8)) == 0,
            F.struct(
                (F.pmod(i, F.lit(5)) + 2).alias("count"),
                (F.pmod(i, F.lit(300)) / F.lit(2.0)).alias("sum"),
                F.lit("exact_match").alias("compression_strategy"),
            ),
        ).alias("composite"),
        F.struct(
            F.when(
                F.pmod(i, F.lit(4)) != 3,
                F.struct(
                    F.struct(
                        F.element_at(
                            F.array(
                                F.lit("mysql/users"),
                                F.lit("postgresql"),
                                F.lit("no match!"),
                            ),
                            (F.pmod(i, F.lit(4)) + 1).cast("int"),
                        ).alias("resource")
                    ).alias("service")
                ),
            ).alias("destination"),
            # span ids are ≡1 (mod 5); i%10==6 is the reachable residue that
            # exercises the explicit-target-wins branch
            F.when(
                F.pmod(i, F.lit(10)) == 6,
                F.struct(
                    F.struct(
                        F.lit("tt").alias("type"), F.lit("nn").alias("name")
                    ).alias("target")
                ),
            ).alias("service"),
            F.when(
                F.pmod(i, F.lit(6)) < 2,
                F.struct(
                    F.lit(500).alias("status_code"),
                    F.when(
                        F.pmod(i, F.lit(6)) == 0,
                        F.struct(F.lit(204).alias("status_code")),
                    ).alias("response"),
                ),
            ).alias("http"),
        ).alias("context"),
    )

    er = F.struct(
        F.concat(F.lit("er"), i).alias("id"),
        F.concat(F.lit("tr"), F.pmod(i, F.lit(97))).alias("trace_id"),
        F.when(F.pmod(i, F.lit(3)) == 0, F.concat(F.lit("pp"), i)).alias("parent_id"),
        ts.alias("timestamp"),
        F.when(
            F.pmod(i, F.lit(4)) == 0, F.concat(F.lit("mod.fn"), F.pmod(i, F.lit(7)))
        ).alias("culprit"),
        F.struct(
            F.concat(F.lit("op-"), F.pmod(i, F.lit(8))).alias("name"),
            (F.pmod(i, F.lit(2)) == 0).alias("sampled"),
        ).alias("transaction"),
        F.struct(
            F.concat(F.lit("log message "), F.pmod(i, F.lit(13))).alias("message"),
            F.when(F.pmod(i, F.lit(3)) == 0, F.lit("warning")).alias("level"),
        ).alias("log"),
        F.when(
            F.pmod(i, F.lit(2)) == 0,
            F.struct(
                F.concat(F.lit("E"), F.pmod(i, F.lit(4))).alias("type"),
                F.concat(F.lit("boom "), F.pmod(i, F.lit(6))).alias("message"),
                F.pmod(i, F.lit(100)).alias("code"),
                F.when(
                    F.pmod(i, F.lit(4)) == 0,
                    F.array(
                        F.struct(
                            F.concat(F.lit("C"), F.pmod(i, F.lit(3))).alias("type"),
                            F.lit("cause").alias("message"),
                        )
                    ),
                ).alias("cause"),
            ),
        ).alias("exception"),
    )

    ms = F.struct(
        ts.alias("timestamp"),
        F.struct(
            F.concat(F.lit("op-"), F.pmod(i, F.lit(8))).alias("name"),
            F.lit("request").alias("type"),
        ).alias("transaction"),
        F.map_from_entries(
            F.filter(
                F.array(
                    F.struct(
                        F.concat(F.lit("gauge."), F.pmod(i, F.lit(4))).alias("key"),
                        F.struct(
                            (F.pmod(i, F.lit(1000)) / F.lit(10.0)).alias("value"),
                            F.lit(None).cast("array<double>").alias("values"),
                            F.lit(None).cast("array<bigint>").alias("counts"),
                            F.lit(None).cast("string").alias("type"),
                            F.lit(None).cast("string").alias("unit"),
                        ).alias("value"),
                    ),
                    F.struct(
                        F.lit("latency_hist").alias("key"),
                        F.struct(
                            F.lit(None).cast("double").alias("value"),
                            F.array(
                                F.pmod(i, F.lit(5)).cast("double"), F.lit(2.0)
                            ).alias("values"),
                            F.array(F.pmod(i, F.lit(7)), F.lit(3)).alias("counts"),
                            F.lit("histogram").alias("type"),
                            F.lit("s").alias("unit"),
                        ).alias("value"),
                    ),
                ),
                lambda e: (F.pmod(i, F.lit(2)) == 1) | ~e["key"].startswith("latency"),
            )
        ).alias("samples"),
        F.create_map(
            F.lit("code"), (F.lit(200) + F.pmod(i, F.lit(3))).cast("string")
        ).alias("tags"),
    )

    lg = F.struct(
        ts.alias("timestamp"),
        F.concat(F.lit("hello "), F.pmod(i, F.lit(17))).alias("message"),
        F.element_at(
            F.array(F.lit("info"), F.lit("warn"), F.lit("error")),
            (F.pmod(i, F.lit(3)) + 1).cast("int"),
        ).alias("level"),
        F.concat(F.lit("lg"), F.pmod(i, F.lit(6))).alias("logger_name"),
        F.concat(F.lit("tr"), F.pmod(i, F.lit(97))).alias("trace_id"),
        F.create_map(
            F.lit("env"),
            F.element_at(
                F.array(F.lit("prod"), F.lit("dev")),
                (F.pmod(i, F.lit(2)) + 1).cast("int"),
            ),
        ).alias("labels"),
    )

    kind = F.pmod(i, F.lit(5))
    line = (
        F.when(kind == 0, F.to_json(F.struct(tx.alias("transaction"))))
        .when(kind == 1, F.to_json(F.struct(sp.alias("span"))))
        .when(kind == 2, F.to_json(F.struct(er.alias("error"))))
        .when(kind == 3, F.to_json(F.struct(ms.alias("metricset"))))
        .otherwise(F.to_json(F.struct(lg.alias("log"))))
    )
    return spark.range(n).select(line.alias("value"))


def event_outcome(outcome: Column) -> Column:
    """Case-insensitive success/failure, everything else unknown
    (traces.go:592-601)."""
    low = F.lower(outcome)
    return (
        F.when(low == "success", F.lit("success"))
        .when(low == "failure", F.lit("failure"))
        .otherwise(F.lit("unknown"))
    )


def _target_from_dest_resource(resource: Column) -> tuple[Column, Column]:
    """service.target derivation from destination.service.resource
    (traces.go:935-941): "type" or "type/name"; non-matching strings become
    (type='', name=resource)."""
    typ = F.regexp_extract(resource, r"^([a-z0-9]+)(?:/(\w+))?$", 1)
    name = F.regexp_extract(resource, r"^([a-z0-9]+)(?:/(\w+))?$", 2)
    matched = resource.rlike(r"^[a-z0-9]+(?:/\w+)?$")
    return (
        F.when(matched, typ).otherwise(F.lit("")),
        F.when(matched, name).otherwise(resource),
    )


def decode_transactions(decoded: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed transaction records + derived fields from dispatched intake rows
    (``decode_ndjson_intake`` output filtered to event_type='transaction')."""
    df = decoded.filter(F.col("event_type") == "transaction").withColumn(
        "tx", F.from_json(F.col(payload_col), TRANSACTION_DDL)
    )
    p = lambda f: F.col(f"tx.{f}")  # noqa: E731
    explicit_t, explicit_n = p("context.service.target.type"), p("context.service.target.name")
    has_target = explicit_t.isNotNull() | explicit_n.isNotNull()
    return df.select(
        F.lit("transaction").alias("processor_event"),
        p("id").alias("transaction_id"),
        p("trace_id").alias("trace_id"),
        p("parent_id").alias("parent_id"),
        p("timestamp").alias("timestamp_us"),
        (p("duration") * 1000).cast("long").alias("transaction_duration_us"),
        p("name").alias("transaction_name"),
        F.coalesce(F.nullif(p("type"), F.lit("")), F.lit("unknown")).alias("transaction_type"),
        F.nullif(p("result"), F.lit("")).alias("transaction_result"),
        # sampled = true unless explicitly false (traces.go:444-447)
        F.coalesce(p("sampled"), F.lit(True)).alias("transaction_sampled"),
        F.coalesce(p("sample_rate"), F.lit(1.0)).alias("sample_rate"),
        event_outcome(p("outcome")).alias("event_outcome"),
        F.when(has_target, F.coalesce(explicit_t, F.lit(""))).alias("service_target_type"),
        F.when(has_target, F.coalesce(explicit_n, F.lit(""))).alias("service_target_name"),
        p("span_count.started").alias("span_count_started"),
        p("span_count.dropped").alias("span_count_dropped"),
        p("session.id").alias("session_id"),
        p("session.sequence").alias("session_sequence"),
        p("context.request.method").alias("http_request_method"),
        p("context.response.status_code").alias("http_response_status_code"),
        p("context.request.url.full").alias("url_full"),
        p("context.message.queue.name").alias("messaging_destination_name"),
        p("dropped_spans_stats").alias("dropped_spans_stats"),
        F.col("metadata"),
    )


def decode_spans(decoded: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed span records + derived fields (traces.go:185-320)."""
    df = decoded.filter(F.col("event_type") == "span").withColumn(
        "sp", F.from_json(F.col(payload_col), SPAN_DDL)
    )
    p = lambda f: F.col(f"sp.{f}")  # noqa: E731
    # type.subtype.action dot-split when subtype and action absent
    raw_type = F.coalesce(p("type"), F.lit(""))
    need_split = p("subtype").isNull() & p("action").isNull() & raw_type.contains(".")
    parts = F.split(raw_type, r"\.", 3)
    # F.get is NULL-safe out of bounds (ANSI mode is on: a bare parts[2]
    # THROWS on two-segment types like "db.mysql")
    typ = F.when(need_split, parts[0]).otherwise(raw_type)
    sub = F.when(need_split, F.get(parts, 1)).otherwise(p("subtype"))
    act = F.when(need_split, F.get(parts, 2)).otherwise(p("action"))
    resource = p("context.destination.service.resource")
    derived_t, derived_n = _target_from_dest_resource(resource)
    explicit_t, explicit_n = p("context.service.target.type"), p("context.service.target.name")
    has_explicit = explicit_t.isNotNull() | explicit_n.isNotNull()
    return df.select(
        F.lit("span").alias("processor_event"),
        p("id").alias("span_id"),
        p("trace_id").alias("trace_id"),
        p("parent_id").alias("parent_id"),
        p("transaction_id").alias("transaction_id"),
        p("timestamp").alias("timestamp_us"),
        (p("duration") * 1000).cast("long").alias("span_duration_us"),
        p("name").alias("span_name"),
        F.coalesce(F.nullif(typ, F.lit("")), F.lit("unknown")).alias("span_type"),
        F.nullif(sub, F.lit("")).alias("span_subtype"),
        F.nullif(act, F.lit("")).alias("span_action"),
        p("sync").alias("span_sync"),
        event_outcome(p("outcome")).alias("event_outcome"),
        F.coalesce(p("sample_rate"), F.lit(1.0)).alias("sample_rate"),
        F.when(has_explicit, F.coalesce(explicit_t, F.lit("")))
        .when(resource.isNotNull(), derived_t)
        .alias("service_target_type"),
        F.when(has_explicit, F.coalesce(explicit_n, F.lit("")))
        .when(resource.isNotNull(), derived_n)
        .alias("service_target_name"),
        resource.alias("destination_service_resource"),
        p("context.destination.address").alias("destination_address"),
        p("context.destination.port").alias("destination_port"),
        p("context.db.type").alias("db_system"),
        p("context.db.instance").alias("db_namespace"),
        p("context.db.statement").alias("db_query_text"),
        # status code: response.status_code, falling back to the deprecated
        # top-level status_code (traces.go:626-631)
        F.coalesce(
            p("context.http.response.status_code"), p("context.http.status_code")
        ).alias("http_response_status_code"),
        p("context.message.queue.name").alias("messaging_destination_name"),
        p("composite.count").alias("composite_count"),
        (p("composite.sum") * 1000).cast("long").alias("composite_sum_us"),
        p("composite.compression_strategy").alias("composite_compression_strategy"),
        F.col("metadata"),
    )


def _frames_for_key(frames: list) -> tuple[str, bool]:
    """Frame-identifier byte stream for the grouping key (logs.go:321-334):
    module > filename > classname (possibly empty), then function."""
    out = []
    for f in frames or []:
        if f.get("module"):
            out.append(f["module"])
        elif f.get("filename"):
            out.append(f["filename"])
        else:
            out.append(f.get("classname") or "")
        out.append(f.get("function") or "")
    return "".join(out), bool(frames)


def error_grouping_key(exc: dict | None, log: dict | None) -> str:
    """apm-data SetGroupingKey for errors (logs.go:245-318): XXH64 over
    exception types (DFS) -> log param_message -> exception stacktraces (DFS)
    -> log stacktrace (only if no exception stacktrace) -> fallback exception
    messages -> fallback log message."""
    from ..functions.xxh64 import xxh64_hex

    log = log or {}
    buf: list[str] = []
    updated = False

    def walk_types(e: dict) -> bool:
        up = False
        if e.get("type"):
            buf.append(e["type"])
            up = True
        for c in e.get("cause") or []:
            up = walk_types(c) or up
        return up

    def walk_stacks(e: dict) -> bool:
        s, up = _frames_for_key(e.get("stacktrace"))
        buf.append(s)
        for c in e.get("cause") or []:
            up = walk_stacks(c) or up
        return up

    def walk_messages(e: dict) -> None:
        if e.get("message"):
            buf.append(e["message"])
        for c in e.get("cause") or []:
            walk_messages(c)

    if exc:
        updated = walk_types(exc) or updated
    if log.get("param_message"):
        buf.append(log["param_message"])
        updated = True
    have_exc_stack = False
    if exc:
        have_exc_stack = walk_stacks(exc)
        updated = updated or have_exc_stack
    if not have_exc_stack and log.get("stacktrace"):
        s, up = _frames_for_key(log["stacktrace"])
        buf.append(s)
        updated = updated or up
    if not updated and exc:
        walk_messages(exc)
        updated = True  # messages may be empty; matches reference fallthrough
    if not updated and log.get("message"):
        buf.append(log["message"])
    return xxh64_hex("".join(buf).encode("utf-8"))


def flatten_exception_tree(exc: dict | None) -> list[dict] | None:
    """DFS cause-tree flatten with the implicit-parent rule
    (mappers/intakeV2ToDerivedFields.go:157-229): parent index recorded only
    when the exception is not the immediate successor of its parent."""
    if not exc:
        return None
    flat: list[tuple[dict, int]] = []

    def collect(e: dict, parent_idx: int) -> None:
        idx = len(flat)
        flat.append((e, parent_idx))
        for c in e.get("cause") or []:
            collect(c, idx)

    collect(exc, -1)
    out = []
    for i, (e, parent_idx) in enumerate(flat):
        item: dict = {}
        if i > parent_idx + 1:
            item["parent"] = parent_idx
        if e.get("code") is not None:
            item["code"] = str(e["code"])
        for k in ("message", "type", "module"):
            if e.get(k) is not None:
                item[k] = e[k]
        if e.get("handled") is not None:
            item["handled"] = e["handled"]
        if e.get("attributes"):
            item["attributes"] = e["attributes"]
        if e.get("stacktrace"):
            item["stacktrace"] = e["stacktrace"]
        out.append(item)
    return out


# schema built programmatically: DDL parsing needs a live session and this
# module must be importable before one exists
_ERROR_DERIVED_SCHEMA = StructType(
    [
        StructField("grouping_key", StringType()),
        StructField("exception_flat", StringType()),
    ]
)


@pandas_udf(_ERROR_DERIVED_SCHEMA)
def _error_derived_udf(payload: pd.Series) -> pd.DataFrame:
    keys, flats = [], []
    for raw in payload:
        try:
            ev = json.loads(raw) if raw else {}
        except (TypeError, ValueError):
            ev = {}
        exc = ev.get("exception")
        keys.append(error_grouping_key(exc, ev.get("log")))
        flat = flatten_exception_tree(exc)
        flats.append(json.dumps(flat, sort_keys=True) if flat is not None else None)
    return pd.DataFrame({"grouping_key": keys, "exception_flat": flats})


def decode_errors(decoded: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed error records + derived fields incl. grouping key and the
    DFS-flattened exception array (as a JSON string column — bounded-depth
    structs can't hold a recursive cause tree)."""
    df = decoded.filter(F.col("event_type") == "error").withColumn(
        "er", F.from_json(F.col(payload_col), ERROR_DDL)
    )
    p = lambda f: F.col(f"er.{f}")  # noqa: E731
    derived = _error_derived_udf(F.col(payload_col))
    return df.select(
        F.lit("error").alias("processor_event"),
        p("id").alias("error_id"),
        p("trace_id").alias("trace_id"),
        F.nullif(p("parent_id"), F.lit("")).alias("parent_id"),
        p("transaction_id").alias("transaction_id"),
        p("timestamp").alias("timestamp_us"),
        F.nullif(p("culprit"), F.lit("")).alias("error_culprit"),
        p("transaction.name").alias("transaction_name"),
        p("transaction.type").alias("transaction_type"),
        p("transaction.sampled").alias("transaction_sampled"),
        p("log.message").alias("error_log_message"),
        # log level defaults to "error" when the log object exists but level
        # is unset (logs.go:405-410)
        F.when(
            p("log").isNotNull(),
            F.coalesce(F.nullif(p("log.level"), F.lit("")), F.lit("error")),
        ).alias("error_log_level"),
        p("log.param_message").alias("error_log_param_message"),
        p("log.logger_name").alias("error_log_logger_name"),
        derived["grouping_key"].alias("error_grouping_key"),
        derived["exception_flat"].alias("error_exception_json"),
        F.col("metadata"),
    )


def decode_metricsets(decoded: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metricset samples exploded to one row per metric name
    (ndjsondecoder/metrics.go): scalar gauges keep value; histogram samples
    keep values/counts arrays."""
    df = decoded.filter(F.col("event_type") == "metricset").withColumn(
        "ms", F.from_json(F.col(payload_col), METRICSET_DDL)
    )
    p = lambda f: F.col(f"ms.{f}")  # noqa: E731
    return df.select(
        F.lit("metric").alias("processor_event"),
        p("timestamp").alias("timestamp_us"),
        p("span.type").alias("span_type"),
        p("span.subtype").alias("span_subtype"),
        p("transaction.name").alias("transaction_name"),
        p("transaction.type").alias("transaction_type"),
        F.explode(p("samples")).alias("metric_name", "sample"),
        p("tags").alias("tags"),
        F.col("metadata"),
    ).select(
        "processor_event", "timestamp_us", "span_type", "span_subtype",
        "transaction_name", "transaction_type", "metric_name",
        F.col("sample.value").alias("value"),
        F.col("sample.values").alias("histogram_values"),
        F.col("sample.counts").alias("histogram_counts"),
        F.col("sample.type").alias("metric_type"),
        F.col("sample.unit").alias("metric_unit"),
        "tags", "metadata",
    )


def decode_logs(decoded: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed log records (ndjsondecoder/logs.go basic fields)."""
    df = decoded.filter(F.col("event_type") == "log").withColumn(
        "lg", F.from_json(F.col(payload_col), LOG_DDL)
    )
    p = lambda f: F.col(f"lg.{f}")  # noqa: E731
    return df.select(
        F.lit("log").alias("processor_event"),
        p("timestamp").alias("timestamp_us"),
        p("message").alias("message"),
        p("level").alias("log_level"),
        p("logger_name").alias("logger_name"),
        p("trace_id").alias("trace_id"),
        p("transaction_id").alias("transaction_id"),
        p("span_id").alias("span_id"),
        p("labels").alias("labels"),
        F.col("metadata"),
    )


def metadata_resource_attrs(df: DataFrame, metadata_col: str = "metadata") -> DataFrame:
    """Semconv resource attributes from intake metadata (mappers/
    intakeV2ToSemConv.go + resource_walker.go subset): service identity,
    SDK/runtime, host/os, cloud, container/k8s.  host.name prefers
    configured_hostname over detected_hostname (the deprecated ``hostname``
    is last)."""
    md = F.from_json(F.col(metadata_col), METADATA_DDL)

    def g(path: str) -> Column:
        c = md
        for part in path.split("."):
            c = c.getField(part)
        return c

    return df.withColumns(
        {
            "service_name": g("service.name"),
            "service_version": g("service.version"),
            "deployment_environment": g("service.environment"),
            "telemetry_sdk_language": g("service.language.name"),
            "telemetry_sdk_name": F.when(
                g("service.agent.name").isNotNull(), F.lit("ElasticAPM")
            ),
            "agent_name": g("service.agent.name"),
            "agent_version": g("service.agent.version"),
            "process_runtime_name": g("service.runtime.name"),
            "process_runtime_version": g("service.runtime.version"),
            "service_framework_name": g("service.framework.name"),
            "service_framework_version": g("service.framework.version"),
            "service_instance_id": g("service.node.configured_name"),
            "host_name": g("system.configured_hostname"),
            "host_hostname": F.coalesce(
                g("system.detected_hostname"), g("system.hostname")
            ),
            "host_arch": g("system.architecture"),
            "os_type": g("system.platform"),
            "process_pid": g("process.pid"),
            "process_parent_pid": g("process.ppid"),
            "container_id": g("system.container.id"),
            "k8s_namespace_name": g("system.kubernetes.namespace"),
            "k8s_pod_name": g("system.kubernetes.pod.name"),
            "k8s_pod_uid": g("system.kubernetes.pod.uid"),
            "k8s_node_name": g("system.kubernetes.node.name"),
            "cloud_provider": g("cloud.provider"),
            "cloud_region": g("cloud.region"),
            "cloud_availability_zone": g("cloud.availability_zone"),
            "cloud_account_id": g("cloud.account.id"),
            "cloud_account_name": g("cloud.account.name"),
            "cloud_instance_id": g("cloud.instance.id"),
            "cloud_instance_name": g("cloud.instance.name"),
            "cloud_machine_type": g("cloud.machine.type"),
            "cloud_project_id": g("cloud.project.id"),
            "cloud_project_name": g("cloud.project.name"),
            "cloud_platform": g("cloud.service.name"),
            "user_id": g("user.id"),
            "user_name": g("user.username"),
            "user_email": g("user.email"),
            "user_domain": g("user.domain"),
        }
    )
