"""ECS-mode attribute translation tables (E6 full form).

Data-driven transcription of the elasticapmprocessor's ECS translation
(processor/elasticapmprocessor/internal/ecs/ecs_translation.go:1-552 and
client_address.go:29-45): preserved-key sets per signal, the move of every
other attribute to ``labels.*`` / ``numeric_labels.*`` with reserved-rune
key sanitization (``. * "`` -> ``_``) and ECS keyword truncation (1024
chars, util.go:20-21), and the ``host.ip``-from-client-address derivation.

Columnar model: OTel's typed attribute map splits into a string map and a
numeric map (mirroring ECS's labels/numeric_labels split).  All transforms
are JVM map expressions (map_filter/transform/map_from_entries) — no Python
on the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ECS_KEYWORD_MAX_LENGTH = 1024  # util.go:20-21

# Resource attributes kept verbatim (ecs_translation.go:117-174 first case)
ECS_RESOURCE_PRESERVED = [
    "data_stream.type", "data_stream.dataset", "data_stream.namespace",
    "host.hostname", "service.name",
    "agent.activation_method", "agent.ephemeral_id", "agent.name",
    "agent.version", "cloud.account.name", "cloud.instance.id",
    "cloud.instance.name", "cloud.machine.type", "cloud.origin.account.id",
    "cloud.origin.provider", "cloud.origin.region", "cloud.origin.service.name",
    "cloud.project.id", "cloud.project.name", "destination.ip",
    "faas.execution", "faas.trigger.request_id", "host.os.type",
    "metricset.name", "service.framework.name", "service.framework.version",
    "service.origin.id", "service.origin.name", "service.origin.version",
    "service.target.name", "service.target.type", "source.nat.ip",
    "user.domain", "client.address", "client.port", "container.image.tags",
    "faas.coldstart", "faas.instance", "faas.name", "faas.trigger",
    "faas.version", "host.ip", "network.carrier.icc", "network.carrier.mcc",
    "network.carrier.mnc", "network.carrier.name",
    "network.connection.subtype", "network.connection.type",
    "process.executable.name", "process.parent_pid", "process.pid",
    "service.namespace", "source.address", "source.port",
    "telemetry.distro.name", "telemetry.distro.version",
    "telemetry.sdk.elastic_export_timestamp", "user_agent.original",
    "user.email", "user.id", "user.name", "opencensus.exporterversion",
]

# Resource attributes kept but truncated to the ECS keyword max
# (ecs_translation.go:176-211 second case)
ECS_RESOURCE_PRESERVED_TRUNCATED = [
    "host.name", "k8s.node.name", "k8s.pod.name", "k8s.pod.uid",
    "k8s.namespace.name",  # context keys, truncated at capture (lines 96-116)
    "container.image.tag", "device.manufacturer", "cloud.account.id",
    "cloud.availability_zone", "cloud.platform", "cloud.provider",
    "cloud.region", "container.id", "container.image.name", "container.name",
    "container.runtime", "deployment.environment",
    "deployment.environment.name", "device.id", "device.model.identifier",
    "device.model.name", "host.arch", "host.id", "host.type",
    "os.description", "os.name", "os.type", "os.version",
    "process.command_line", "process.executable.path", "process.owner",
    "process.runtime.name", "process.runtime.version", "service.instance.id",
    "service.version", "telemetry.sdk.language", "telemetry.sdk.name",
    "telemetry.sdk.version",
]

# Span attributes preserved in ECS mode (ecs_translation.go:309-412)
ECS_SPAN_PRESERVED = [
    "data_stream.dataset", "data_stream.namespace", "data_stream.type",
    "service.target.name", "service.target.type",
    "span.destination.service.name", "span.destination.service.type",
    "span.destination.service.resource", "event.outcome", "processor.event",
    "session.id", "transaction.type", "type", "code.stacktrace",
    "sql.query", "db.type", "db.instance", "db.elasticsearch.cluster.name",
    "db.name", "db.namespace", "db.query.text", "db.statement", "db.system",
    "db.system.name", "db.user", "gen_ai.provider.name", "gen_ai.system",
    "http.flavor", "http.method", "http.request.method",
    "http.response.body.size", "http.response.status_code", "http.scheme",
    "http.status_code", "http.target", "http.host", "http.url",
    "http.user_agent", "message_bus.destination",
    "messaging.destination.name", "messaging.destination.temporary",
    "messaging.operation", "messaging.operation.name", "messaging.system",
    "messaging.operation.type", "messaging.temp_destination",
    "messaging.destination", "net.host.name", "net.peer.name",
    "net.peer.port", "net.peer.ip", "net.sock.peer.addr",
    "network.peer.address", "peer.address", "peer.hostname", "peer.ipv4",
    "peer.ipv6", "peer.port", "network.carrier.icc", "network.carrier.mcc",
    "network.carrier.mnc", "network.carrier.name",
    "network.connection.subtype", "network.connection.type", "peer.service",
    "rpc.grpc.status_code", "rpc.method", "rpc.response.status_code",
    "rpc.service", "rpc.system", "rpc.system.name", "server.address",
    "server.port", "service.peer.name", "url.domain", "url.full",
    "url.path", "url.port", "url.query", "url.scheme", "user_agent.name",
    "user_agent.original", "user_agent.version",
]

# Log record attributes preserved in ECS mode (ecs_translation.go:270-291)
ECS_LOG_PRESERVED = [
    "data_stream.dataset", "data_stream.namespace", "data_stream.type",
    "error.id", "processor.event", "session.id", "exception.escaped",
    "exception.message", "exception.stacktrace", "exception.type",
    "network.connection.type", "event.domain", "event.name",
]

# Metric datapoint attributes preserved in ECS mode (ecs_translation.go:424-441)
ECS_METRIC_PRESERVED = [
    "data_stream.dataset", "data_stream.namespace", "data_stream.type",
    "event.dataset", "event.module", "system.process.cpu.start_time",
    "system.process.state",
]
ECS_METRIC_PRESERVED_TRUNCATED = [
    "user.name", "system.filesystem.mount_point", "system.process.cmdline",
]


def sanitize_label_key(key: Column) -> Column:
    """Reserved runes ``. * "`` become ``_`` (ecs_translation.go:546-552)."""
    return F.translate(key, '.*"', "___")


def _truncate(v: Column) -> Column:
    return F.substring(v, 1, ECS_KEYWORD_MAX_LENGTH)


def _map_last_wins(entries: Column) -> Column:
    """map_from_entries with the reference's PutStr overwrite semantics:
    when two source keys sanitize to the same target key, the LAST entry
    wins.  A plain map_from_entries throws DUPLICATED_MAP_KEY on the
    collision (the session's mapKeyDedupPolicy default is EXCEPTION).
    O(n^2) per row in map size — attribute maps are tens of keys."""
    n = F.size(entries)
    # sequence(1, 0) would produce a DESCENDING [1, 0] on empty input —
    # guard the index zip behind the emptiness check
    idx = F.zip_with(
        entries,
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda e, i: F.struct(
            e["key"].alias("key"), e["value"].alias("value"), i.alias("i")
        ),
    )
    deduped = F.filter(
        idx,
        lambda x: x["key"].isNotNull()
        & ~F.exists(idx, lambda y: (y["key"] == x["key"]) & (y["i"] > x["i"])),
    )
    return F.map_from_entries(
        F.transform(
            deduped,
            lambda x: F.struct(x["key"].alias("key"), x["value"].alias("value")),
        )
    )


def translate_attrs_to_ecs_labels(
    df: DataFrame,
    attrs_col: str,
    preserved: list[str],
    preserved_truncated: list[str] | None = None,
    numeric_attrs_col: str | None = None,
    sanitize_existing_labels: bool = False,
    out_col: str | None = None,
) -> DataFrame:
    """Moves unsupported attributes of a string map to ``labels.*`` (value
    truncated) and of a numeric map to ``numeric_labels.*``, keeping the
    preserved sets in place (truncating where the reference truncates).

    ``sanitize_existing_labels=True`` is the APM-intake path: keys already
    under ``labels.`` / ``numeric_labels.`` only get their SUFFIX sanitized
    and stay; the OTel path (False) re-normalizes them from scratch, so
    ``labels.a.b`` becomes ``labels.labels_a_b`` (ecs_translation.go:63-74,
    213-224)."""
    out_col = out_col or attrs_col
    attrs = F.col(attrs_col)
    keep_exact = F.array(*[F.lit(k) for k in preserved])
    keep_trunc = F.array(*[F.lit(k) for k in (preserved_truncated or [])])

    entries = F.map_entries(attrs)
    translated = _map_last_wins(
        F.transform(
            entries,
            lambda e: F.struct(
                F.when(
                    F.array_contains(keep_exact, e["key"])
                    | F.array_contains(keep_trunc, e["key"]),
                    e["key"],
                )
                .otherwise(_move_key_expr(e["key"], sanitize_existing_labels))
                .alias("key"),
                F.when(F.array_contains(keep_exact, e["key"]), e["value"])
                .otherwise(_truncate(e["value"]))
                .alias("value"),
            ),
        )
    )
    out = df.withColumn(out_col, translated)
    if numeric_attrs_col:
        nattrs = F.col(numeric_attrs_col)
        nout = _map_last_wins(
            F.transform(
                F.map_entries(nattrs),
                lambda e: F.struct(
                    F.when(
                        F.array_contains(keep_exact, e["key"])
                        | F.array_contains(keep_trunc, e["key"]),
                        e["key"],
                    )
                    .otherwise(
                        _numeric_move_key_expr(e["key"], sanitize_existing_labels)
                    )
                    .alias("key"),
                    e["value"].alias("value"),
                ),
            )
        )
        out = out.withColumn(numeric_attrs_col, nout)
    return out


def _move_key_expr(k: Column, sanitize_existing: bool) -> Column:
    moved = F.concat(F.lit("labels."), sanitize_label_key(k))
    if not sanitize_existing:
        return moved
    lbl = F.lit("labels.")
    nlbl = F.lit("numeric_labels.")
    return (
        F.when(k.startswith("labels."), F.concat(lbl, sanitize_label_key(F.substring(k, 8, 1 << 20))))
        .when(
            k.startswith("numeric_labels."),
            F.concat(nlbl, sanitize_label_key(F.substring(k, 16, 1 << 20))),
        )
        .otherwise(moved)
    )


def _numeric_move_key_expr(k: Column, sanitize_existing: bool) -> Column:
    moved = F.concat(F.lit("numeric_labels."), sanitize_label_key(k))
    if not sanitize_existing:
        return moved
    return (
        F.when(
            k.startswith("numeric_labels."),
            F.concat(F.lit("numeric_labels."), sanitize_label_key(F.substring(k, 16, 1 << 20))),
        )
        .otherwise(moved)
    )


def remap_span_attrs_to_ecs(df: DataFrame, attrs_col: str = "attributes",
                            numeric_attrs_col: str | None = None) -> DataFrame:
    """RemapSpanAttributesToECSLabels (ecs_translation.go:309-420)."""
    return translate_attrs_to_ecs_labels(
        df, attrs_col, ECS_SPAN_PRESERVED, numeric_attrs_col=numeric_attrs_col
    )


def remap_log_attrs_to_ecs(df: DataFrame, attrs_col: str = "attributes",
                           numeric_attrs_col: str | None = None) -> DataFrame:
    """RemapLogRecordAttributesToECSLabels (ecs_translation.go:268-298)."""
    return translate_attrs_to_ecs_labels(
        df, attrs_col, ECS_LOG_PRESERVED, numeric_attrs_col=numeric_attrs_col
    )


def remap_metric_attrs_to_ecs(df: DataFrame, attrs_col: str = "attributes",
                              numeric_attrs_col: str | None = None) -> DataFrame:
    """RemapMetricDataPointAttributesToECSLabels (ecs_translation.go:422-450)."""
    return translate_attrs_to_ecs_labels(
        df, attrs_col, ECS_METRIC_PRESERVED, ECS_METRIC_PRESERVED_TRUNCATED,
        numeric_attrs_col=numeric_attrs_col,
    )


def remap_resource_attrs_to_ecs(
    df: DataFrame,
    attrs_col: str = "resource_attributes",
    numeric_attrs_col: str | None = None,
    sanitize_existing_labels: bool = False,
) -> DataFrame:
    """TranslateResourceMetadata's rename portion (ecs_translation.go:77-230);
    the host/service resolution conventions live in
    operators/enrich.py::ecs_resolve_host.  Adds the apm-data default
    ``service.name=unknown`` when absent (lines 240-245)."""
    out = translate_attrs_to_ecs_labels(
        df, attrs_col, ECS_RESOURCE_PRESERVED, ECS_RESOURCE_PRESERVED_TRUNCATED,
        numeric_attrs_col=numeric_attrs_col,
        sanitize_existing_labels=sanitize_existing_labels,
    )
    # coalesce first: map_filter/map_concat propagate NULL, and the
    # reference adds the default even on a missing attributes map
    attrs = F.coalesce(
        F.col(attrs_col), F.create_map().cast("map<string,string>")
    )
    with_default = F.when(
        F.element_at(attrs, "service.name").isNull()
        | (F.element_at(attrs, "service.name") == ""),
        F.map_concat(
            F.map_filter(attrs, lambda k, _: k != "service.name"),
            F.create_map(F.lit("service.name"), F.lit("unknown")),
        ),
    ).otherwise(attrs)
    return out.withColumn(attrs_col, with_default)


def set_host_ip(df: DataFrame, client_addr_col: str,
                attrs_col: str = "resource_attributes") -> DataFrame:
    """client_address.go:29-45: sets ``host.ip`` from the client address only
    when absent or empty; empty client addresses are ignored."""
    attrs = F.col(attrs_col)
    addr = F.col(client_addr_col)
    existing = F.element_at(attrs, "host.ip")
    should_set = (
        addr.isNotNull() & (addr != "") & (existing.isNull() | (existing == ""))
    )
    return df.withColumn(
        attrs_col,
        F.when(
            should_set,
            F.map_concat(
                F.map_filter(attrs, lambda k, _: k != "host.ip"),
                F.create_map(F.lit("host.ip"), addr),
            ),
        ).otherwise(attrs),
    )
