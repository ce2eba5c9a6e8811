"""Zipkin v2 JSON span intake — the POST /api/v2/spans body decode.

The reference distribution ships the contrib zipkinreceiver
(distributions/elastic-components/manifest.yaml:32); pipelines fed by
classic zipkin instrumentation POST JSON arrays of v2 spans (public
Zipkin API spec, zipkin.io/zipkin-api) that must become the same span
rows the OTLP traces wire produces before enrich/route see them:

- ids are lower-hex: traceId 16 or 32 chars (128-bit ids), span/parent
  ids 16; OTLP uses 32-char trace ids, so 16-char ids LEFT-PAD with
  zeros (the standard zipkin->otel translation).
- ``kind`` is CLIENT/SERVER/PRODUCER/CONSUMER or absent; absent maps
  to ``internal`` (the OTLP default kind).
- ``timestamp``/``duration`` are epoch MICROseconds.
- ``localEndpoint.serviceName`` is the service identity (OTLP
  ``service.name`` resource attr); ``remoteEndpoint`` the peer.
- ``shared: true`` marks the server half of a client-originated span id
  (zipkin's one-span-two-halves convention — kept as a column so the
  trace assembler can dedup the pair).
- ``tags`` is a string map; ``annotations`` [{timestamp, value}] map to
  span events.

Scale shape: one ``from_json`` + ``explode`` per body — pure JVM
column expressions fused into the scan, zero UDFs, zero shuffles; the
generator packs each shard's spans into one JSON array body (the POST
payload shape) inside a small aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, LongType, MapType, StringType, StructField,
    StructType,
)

ZIPKIN_SPAN_SCHEMA = StructType(
    [
        StructField("traceId", StringType()),
        StructField("id", StringType()),
        StructField("parentId", StringType()),
        StructField("name", StringType()),
        StructField("kind", StringType()),
        StructField("timestamp", LongType()),
        StructField("duration", LongType()),
        StructField("shared", BooleanType()),
        StructField(
            "localEndpoint", StructType([StructField("serviceName", StringType())])
        ),
        StructField(
            "remoteEndpoint", StructType([StructField("serviceName", StringType())])
        ),
        StructField("tags", MapType(StringType(), StringType())),
        StructField(
            "annotations",
            ArrayType(
                StructType(
                    [
                        StructField("timestamp", LongType()),
                        StructField("value", StringType()),
                    ]
                )
            ),
        ),
    ]
)

_KINDS = {"CLIENT": "client", "SERVER": "server",
          "PRODUCER": "producer", "CONSUMER": "consumer"}


def decode_zipkin_json(df: DataFrame, body_col: str = "body") -> DataFrame:
    """Decode POST bodies (JSON arrays of v2 spans) into one row per
    span: trace_id (32-hex, zero-padded), span_id, parent_span_id,
    name, kind (otel names, absent -> internal), start_us, end_us,
    service, peer_service, shared, tags, events.  A body that is not a
    JSON array yields one ``valid = false`` row (intake contract)."""
    parsed = F.from_json(F.col(body_col), ArrayType(ZIPKIN_SPAN_SCHEMA))
    exploded = (
        df.select(parsed.alias("_spans"))
        .select(
            F.when(F.col("_spans").isNull(), F.array(F.lit(None).cast(ZIPKIN_SPAN_SCHEMA)))
            .otherwise(F.col("_spans"))
            .alias("_spans"),
            F.col("_spans").isNotNull().alias("valid"),
        )
        .select(F.explode("_spans").alias("s"), "valid")
    )
    s = F.col("s")
    kind_map = F.create_map(
        *[F.lit(x) for kv in _KINDS.items() for x in kv]
    )
    return exploded.select(
        F.when(F.col("valid"), F.lpad(F.lower(s["traceId"]), 32, "0")).alias(
            "trace_id"
        ),
        s["id"].alias("span_id"),
        s["parentId"].alias("parent_span_id"),
        s["name"].alias("name"),
        F.when(
            F.col("valid"),
            F.coalesce(kind_map[s["kind"]], F.lit("internal")),
        ).alias("kind"),
        s["timestamp"].alias("start_us"),
        (s["timestamp"] + F.coalesce(s["duration"], F.lit(0))).alias("end_us"),
        s["localEndpoint"]["serviceName"].alias("service"),
        s["remoteEndpoint"]["serviceName"].alias("peer_service"),
        F.coalesce(s["shared"], F.lit(False)).alias("shared"),
        s["tags"].alias("tags"),
        s["annotations"].alias("events"),
        "valid",
    )


def generate_zipkin_bodies(events: DataFrame, shards: int = 16) -> DataFrame:
    """Render events as deterministic zipkin v2 POST bodies, one JSON
    array per shard (= event_id % shards).  Closed-form per event:

    - traceId: 32-hex of user_id*100000 + eid for even eids, 16-hex of
      the same for odd (exercising the pad path)
    - id = 16-hex(eid + 1); parentId absent when eid % 4 == 0
    - kind cycles CLIENT/SERVER/PRODUCER/CONSUMER/absent by eid % 5
    - timestamp = unix micros of ts; duration = round(value*1000) + 1
    - localEndpoint.serviceName = 'svc-' + event_type
    - shared = true on SERVER spans with eid % 3 == 0
    - tags {"http.method": GET|POST by user_id % 2} on even eids
    """
    eid = F.col("event_id")
    kind = F.element_at(
        F.array(
            F.lit("CLIENT"), F.lit("SERVER"), F.lit("PRODUCER"),
            F.lit("CONSUMER"), F.lit(None).cast("string"),
        ),
        (eid % 5 + 1).cast("int"),
    )
    span = F.struct(
        F.when(
            eid % 2 == 0,
            F.format_string("%032x", F.col("user_id") * 100000 + eid),
        )
        .otherwise(F.format_string("%016x", F.col("user_id") * 100000 + eid))
        .alias("traceId"),
        F.format_string("%016x", eid + 1).alias("id"),
        F.when(eid % 4 != 0, F.format_string("%016x", eid % 4)).alias("parentId"),
        F.concat(F.lit("op"), (eid % 7).cast("string")).alias("name"),
        kind.alias("kind"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("timestamp"),
        (F.round(F.col("value") * 1000).cast("long") + 1).alias("duration"),
        F.when((eid % 5 == 1) & (eid % 3 == 0), F.lit(True)).alias("shared"),
        F.struct(
            F.concat(F.lit("svc-"), F.col("event_type")).alias("serviceName")
        ).alias("localEndpoint"),
        F.when(
            eid % 2 == 0,
            F.create_map(
                F.lit("http.method"),
                F.when(F.col("user_id") % 2 == 0, F.lit("GET")).otherwise(
                    F.lit("POST")
                ),
            ),
        ).alias("tags"),
    )
    # sort_array cannot order structs containing a map; an explicit
    # comparator on the (unique) span id keeps the body deterministic
    cmp = lambda l, r: (  # noqa: E731
        F.when(l["id"] < r["id"], -1).when(l["id"] > r["id"], 1).otherwise(0)
    )
    return (
        events.select((eid % shards).alias("shard"), span.alias("s"))
        .groupBy("shard")
        .agg(F.array_sort(F.collect_list("s"), cmp).alias("_arr"))
        .select("shard", F.to_json("_arr").alias("body"))
    )
