"""StatsD / DogStatsD line-protocol decode and flush semantics.

The one push-metrics wire the transport matrix (OTLP json+protobuf,
PRW protobuf+snappy, syslog, GELF, CEF, logfmt, beats csv/json/text)
still lacked: fleets instrument with the Etsy statsd daemon protocol
``<name>:<value>|<type>[|@<rate>][|#tag:val,...]`` over UDP, and a
collector fronting them must split the line, type the value, honor
the sampling-rate correction, and apply per-type flush semantics
before anything downstream (interval agg, routing) sees a datapoint.
The reference ships no statsd receiver, but its intake contract —
per-line decode, undecodable lines survive with ``valid = false``
(receiver/elasticapmintakereceiver decode-error rows) — is the model,
as with ``decode_syslog``.

Wire grammar (public statsd protocol + DogStatsD extensions):

- ``c``  counter — flush = sum(value / rate): a client that sampled at
  ``@0.25`` sent 1 line per 4 increments, so the server scales back up.
- ``g``  gauge — last-write-wins; a leading ``+``/``-`` on the value is
  a DELTA applied to the current gauge, not an absolute set.  Flush =
  (latest absolute value, else 0) + deltas arriving after it — an
  order-dependent fold, which is why :func:`statsd_flush` requires an
  ``order_col`` when gauges are present.
- ``ms``/``h``/``d``  timing/histogram/distribution — flush here keeps
  the closed-form moments (n, sum, min, max); quantiles are the
  ddsketch operator's job downstream.
- ``s``  set — flush = count of DISTINCT raw values.

Scale shape: decode is pure column expressions (one regexp_extract per
field, fused into the scan — zero shuffle, zero UDF, whole-stage
codegen).  Flush is one groupBy per type plus, for gauges only, an
anchor aggregate (latest absolute per key) broadcast-joined back — the
gauge fold is two shuffles on the name key, everything else one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name ":" value "|" type, then any number of "|"-led option fields
# (order-free per DogStatsD: "@rate", "#tags", container-id, etc.).
_RE_LINE = r"^([^:|#\s]+):([^|]+)\|(c|g|ms|h|s|d)((?:\|[^|]*)*)$"


def decode_statsd(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Decode statsd lines into typed columns; all other input columns
    pass through (carry a sequence column if gauge flush order matters).

    Adds: ``name``, ``raw_value`` (string, the untouched value token),
    ``value`` (double; NULL for sets/garbage via try_cast), ``mtype``,
    ``is_delta`` (gauge value carried a leading sign), ``sample_rate``
    (double, NULL when absent), ``tags`` (map<string,string>, NULL when
    absent), ``valid``.  Undecodable lines keep every parsed column
    NULL and ``valid = false`` — never dropped silently.
    """
    from ..functions.extract import regexp_extract_multi

    # all four line groups in ONE regex pass (r6, see
    # extract.regexp_extract_multi), staged so the multi-referenced
    # array is evaluated once per line — the naive form paid one
    # anchored-pattern pass per referencing column
    line = F.col(line_col)
    staged = df.withColumn(
        "_sd_g", regexp_extract_multi(line, _RE_LINE, [1, 2, 3, 4])
    )
    g = F.col("_sd_g")
    name = F.element_at(g, 1)
    raw_value = F.element_at(g, 2)
    mtype = F.element_at(g, 3)
    opts = F.element_at(g, 4)
    ok = name != F.lit("")
    rate = F.regexp_extract(opts, r"\|@([0-9.]+)(?:\||$)", 1)
    tags = F.regexp_extract(opts, r"\|#([^|]*)", 1)
    return staged.select(
        "*",
        F.when(ok, name).alias("name"),
        F.when(ok, raw_value).alias("raw_value"),
        F.when(ok, raw_value.try_cast("double")).alias("value"),
        F.when(ok, mtype).alias("mtype"),
        F.when(ok, raw_value.rlike(r"^[+-]") & (mtype == "g")).alias("is_delta"),
        F.when(ok & (rate != ""), rate.try_cast("double")).alias("sample_rate"),
        F.when(ok & (tags != ""), F.str_to_map(tags, F.lit(","), F.lit(":"))).alias(
            "tags"
        ),
        ok.alias("valid"),
    ).drop("_sd_g")


def statsd_flush(decoded: DataFrame, order_col: str | None = None) -> DataFrame:
    """One flush interval's server-side aggregation, per (name, mtype):
    ``(name, mtype, n, flushed_milli)`` with the flushed value in
    half-up milli-units (the repo's cross-engine float convention).

    Counters rate-correct (value / rate); sets count distinct raw
    values; timings/histograms/distributions flush the sum (their n /
    min / max ride along as ``lo_milli`` / ``hi_milli``); gauges fold
    latest-absolute + later-deltas and REQUIRE ``order_col`` (arrival
    order; without one the fold is undefined and this raises).
    """
    d = decoded.where(F.col("valid"))
    if order_col is None:
        has_gauge = d.where(F.col("mtype") == "g").limit(1).count() > 0
        if has_gauge:
            raise ValueError("gauge flush is order-dependent: pass order_col")
    val = F.col("value")
    milli = lambda c: F.floor(c * 1000 + F.lit(0.5)).cast("long")  # noqa: E731

    simple = (
        d.where(F.col("mtype").isin("c", "ms", "h", "d"))
        .groupBy("name", "mtype")
        .agg(
            F.count(F.lit(1)).alias("n"),
            milli(
                F.sum(
                    F.when(
                        F.col("mtype") == "c",
                        val / F.coalesce(F.col("sample_rate"), F.lit(1.0)),
                    ).otherwise(val)
                )
            ).alias("flushed_milli"),
            milli(F.min(val)).alias("lo_milli"),
            milli(F.max(val)).alias("hi_milli"),
        )
    )
    sets = (
        d.where(F.col("mtype") == "s")
        .groupBy("name", "mtype")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.countDistinct("raw_value") * 1000).alias("flushed_milli"),
            F.lit(None).cast("long").alias("lo_milli"),
            F.lit(None).cast("long").alias("hi_milli"),
        )
    )
    out = simple.unionByName(sets)

    g = d.where(F.col("mtype") == "g")
    if order_col is not None:
        order = F.col(order_col)
        anchors = (
            g.where(~F.col("is_delta"))
            .groupBy("name")
            .agg(
                F.max(order).alias("_anchor"),
                F.max_by(val, order).alias("_base"),
            )
        )
        gauges = (
            g.join(F.broadcast(anchors), "name", "left")
            .groupBy("name")
            .agg(
                F.count(F.lit(1)).alias("n"),
                milli(
                    F.max(F.coalesce(F.col("_base"), F.lit(0.0)))
                    + F.coalesce(
                        F.sum(
                            F.when(
                                F.col("is_delta")
                                & (
                                    F.col("_anchor").isNull()
                                    | (order > F.col("_anchor"))
                                ),
                                val,
                            )
                        ),
                        F.lit(0.0),
                    )
                ).alias("flushed_milli"),
            )
            .select(
                "name",
                F.lit("g").alias("mtype"),
                "n",
                "flushed_milli",
                F.lit(None).cast("long").alias("lo_milli"),
                F.lit(None).cast("long").alias("hi_milli"),
            )
        )
        out = out.unionByName(gauges)
    return out


def generate_statsd_lines(events: DataFrame) -> DataFrame:
    """Render every event as one deterministic statsd line (plus a
    malformed line for event_id % 97 == 0, exercising the valid=false
    path).  Pure closed-form on (event_id, user_id, event_type, value)
    so any oracle can predict the decoded surface without decoding:

    - ``% 5 == 0`` counter ``app.<type>.hits:<1 + id % 7>|c``, sampled
      ``|@0.5`` when ``id % 2 == 0``
    - ``% 5 == 1`` gauge ``app.<type>.level`` — ``id % 3 == 0`` delta
      ``+<1 + id % 9>``, ``% 3 == 1`` delta ``-<1 + id % 9>``, else
      absolute ``<10 * (user_id % 40) + 5>``
    - ``% 5 == 2`` timing ``app.<type>.latency:<round(value*100)>|ms``
    - ``% 5 == 3`` set ``app.<type>.users:u<user_id>|s``
    - ``% 5 == 4`` histogram ``app.<type>.size:<id % 100>|h``

    DogStatsD tags ``|#env:prod,region:r<user_id % 3>`` on even ids.
    Emits ``(seq = event_id, line)``.
    """
    eid = F.col("event_id")
    kind = eid % 5
    name = F.concat(
        F.lit("app."),
        F.col("event_type"),
        F.element_at(
            F.array(
                F.lit(".hits"),
                F.lit(".level"),
                F.lit(".latency"),
                F.lit(".users"),
                F.lit(".size"),
            ),
            (kind + 1).cast("int"),
        ),
    )
    gauge_val = (
        F.when(eid % 3 == 0, F.concat(F.lit("+"), (eid % 9 + 1).cast("string")))
        .when(eid % 3 == 1, F.concat(F.lit("-"), (eid % 9 + 1).cast("string")))
        .otherwise((F.col("user_id") % 40 * 10 + 5).cast("string"))
    )
    value = (
        F.when(kind == 0, (eid % 7 + 1).cast("string"))
        .when(kind == 1, gauge_val)
        .when(kind == 2, F.round(F.col("value") * 100).cast("long").cast("string"))
        .when(kind == 3, F.concat(F.lit("u"), F.col("user_id").cast("string")))
        .otherwise((eid % 100).cast("string"))
    )
    mtype = F.element_at(
        F.array(F.lit("c"), F.lit("g"), F.lit("ms"), F.lit("s"), F.lit("h")),
        (kind + 1).cast("int"),
    )
    rate = F.when((kind == 0) & (eid % 2 == 0), F.lit("|@0.5")).otherwise(F.lit(""))
    tags = F.when(
        eid % 2 == 0,
        F.concat(F.lit("|#env:prod,region:r"), (F.col("user_id") % 3).cast("string")),
    ).otherwise(F.lit(""))
    line = F.when(
        eid % 97 == 0, F.concat(F.lit("garbage line "), eid.cast("string"))
    ).otherwise(F.concat(name, F.lit(":"), value, F.lit("|"), mtype, rate, tags))
    return events.select(eid.alias("seq"), line.alias("line"))
