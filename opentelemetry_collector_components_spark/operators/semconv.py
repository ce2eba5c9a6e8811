"""Semconv span-attribute capture set (E1 full form).

Transcribes the ~40 attribute variants the elasticapmprocessor captures per
span (processor/elasticapmprocessor/internal/enrichments/span.go:152-295)
into one JVM-side select over a string attribute map: every variant group
collapses to a typed context column, plus the isHTTP/isRPC/isDB/isMessaging/
isGenAI protocol flags the downstream type/result/outcome cascades key on.

Determinism note: the reference captures inside a Go map Range whose order
is unspecified, so when two variants of one field are BOTH present the
reference's winner is arbitrary — except the explicitly-guarded pairs
(server.address over net.peer.name/peer.hostname, server.port over
net.peer.port/peer.port, user_agent.original over http.user_agent).  Here
every group uses a fixed coalesce order (the guarded pairs exactly as the
reference guards them; otherwise modern-semconv-first), which is a
documented strengthening, not a divergence, on well-formed single-variant
input.

gRPC status codes arrive as integers and are captured as the grpc-go code
NAMES (span.go:245: ``codes.Code(v.Int()).String()``) — the public table
below (grpc/codes, public API) covers 0-16 with ``Code(n)`` fallback.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRPC_CODE_NAMES = [
    "OK", "Canceled", "Unknown", "InvalidArgument", "DeadlineExceeded",
    "NotFound", "AlreadyExists", "PermissionDenied", "ResourceExhausted",
    "FailedPrecondition", "Aborted", "OutOfRange", "Unimplemented",
    "Internal", "Unavailable", "DataLoss", "Unauthenticated",
]

_HTTP_FLAG_KEYS = [
    "http.host", "http.status_code", "http.response.status_code",
    "http.method", "http.request.method", "http.scheme", "http.flavor",
    "net.host.name", "http.target", "url.full", "http.url", "url.scheme",
    "url.domain", "url.port", "url.path", "url.query",
]
_MESSAGING_FLAG_KEYS = [
    "messaging.destination", "messaging.destination.name",
    "message_bus.destination", "messaging.operation",
    "messaging.operation.type", "messaging.operation.name",
    "messaging.system", "messaging.temp_destination",
    "messaging.destination.temporary",
]
_RPC_FLAG_KEYS = [
    "rpc.grpc.status_code", "rpc.response.status_code", "rpc.system",
    "rpc.system.name", "rpc.service", "rpc.method",
]
_DB_FLAG_KEYS = [
    "db.statement", "db.user", "db.query.text", "db.name", "db.namespace",
    "db.instance", "db.elasticsearch.cluster.name", "db.system",
    "db.system.name", "db.type", "sql.query",
]
_GENAI_FLAG_KEYS = ["gen_ai.system", "gen_ai.provider.name"]


def grpc_code_name(code: Column) -> Column:
    """Integer gRPC status -> grpc-go code name, ``Code(n)`` beyond 16."""
    name = F.element_at(
        F.array(*[F.lit(n) for n in GRPC_CODE_NAMES]), (code + 1).cast("int")
    )
    return F.when(
        (code >= 0) & (code <= 16), name
    ).otherwise(F.concat(F.lit("Code("), code.cast("string"), F.lit(")")))


def capture_span_semconv(df: DataFrame, attrs_col: str = "attributes") -> DataFrame:
    """Adds the captured context columns of span.go:152-295.  Input: one
    MAP<STRING,STRING> attribute column (integer-valued semconv attributes
    ride as decimal strings and are cast where the reference reads Int)."""
    a = F.col(attrs_col)

    def g(key: str) -> Column:
        return F.element_at(a, key)

    def first(*keys: str) -> Column:
        return F.coalesce(*[g(k) for k in keys])

    def has_any(keys: list[str]) -> Column:
        return F.arrays_overlap(
            F.map_keys(a), F.array(*[F.lit(k) for k in keys])
        )

    grpc_int = g("rpc.grpc.status_code").try_cast("long")
    return df.withColumns(
        {
            "processor_event": g("processor.event"),
            "event_outcome": g("event.outcome"),
            "peer_service": first("peer.service", "service.peer.name"),
            "http_host": g("http.host"),
            # guarded deprecation order (span.go:170-184)
            "server_address": first("server.address", "net.peer.name", "peer.hostname"),
            "server_port": first("server.port", "net.peer.port", "peer.port").try_cast("long"),
            "net_peer_ip": first(
                "net.peer.ip", "net.sock.peer.addr", "network.peer.address",
                "peer.ipv4", "peer.ipv6",
            ),
            "peer_address": g("peer.address"),
            "messaging_destination_name": first(
                "messaging.destination", "messaging.destination.name",
                "message_bus.destination",
            ),
            "messaging_operation": first(
                "messaging.operation", "messaging.operation.type",
                "messaging.operation.name",
            ),
            "messaging_system": g("messaging.system"),
            # key PRESENCE sets the flag regardless of value — matches the
            # reference exactly (span.go:205-208 sets true on the case arm
            # without reading v)
            "messaging_destination_temp": has_any(
                ["messaging.temp_destination", "messaging.destination.temporary"]
            ),
            # try_cast: a malformed value ("5xx") must yield NULL, not a
            # job-killing ANSI CAST_INVALID_INPUT
            "http_status_code": first(
                "http.status_code", "http.response.status_code"
            ).try_cast("long"),
            "http_target": g("http.target"),
            "url_full": first("url.full", "http.url"),
            "url_scheme": g("url.scheme"),
            "url_domain": g("url.domain"),
            "url_port": g("url.port").try_cast("long"),
            "url_path": g("url.path"),
            "url_query": g("url.query"),
            # int code -> grpc-go name; string form from rpc.response.status_code
            "grpc_status": F.coalesce(
                F.when(grpc_int.isNotNull(), grpc_code_name(grpc_int)),
                g("rpc.response.status_code"),
            ),
            "rpc_system": first("rpc.system", "rpc.system.name"),
            # rpc.method also lands in rpcService (span.go:256-258)
            "rpc_service": first("rpc.service", "rpc.method"),
            "db_name": first(
                "db.name", "db.namespace", "db.instance",
                "db.elasticsearch.cluster.name",
            ),
            # sql.query implies db_system='sql' when no explicit system
            "db_system": F.coalesce(
                first("db.system", "db.system.name", "db.type"),
                F.when(g("sql.query").isNotNull(), F.lit("sql")),
            ),
            "gen_ai_system": first("gen_ai.system", "gen_ai.provider.name"),
            # user_agent.original wins over deprecated http.user_agent
            "user_agent_original": first("user_agent.original", "http.user_agent"),
            "user_agent_name": g("user_agent.name"),
            "user_agent_version": g("user_agent.version"),
            "type_value": g("type"),
            "transaction_type": g("transaction.type"),
            "is_http": has_any(_HTTP_FLAG_KEYS),
            "is_messaging": has_any(_MESSAGING_FLAG_KEYS),
            "is_rpc": has_any(_RPC_FLAG_KEYS),
            "is_db": has_any(_DB_FLAG_KEYS),
            "is_genai": has_any(_GENAI_FLAG_KEYS),
        }
    )
