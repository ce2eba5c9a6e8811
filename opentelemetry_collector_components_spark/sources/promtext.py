"""Prometheus text exposition format — scrape-side decode.

The repo already speaks Prometheus Remote-Write (protobuf + snappy:
``sources/decoders.py::decode_prometheus_remote_write``, gates
``prw_translate`` / ``prw_decode_e2e``) — the PUSH wire.  Scraping is
the other half: a collector's prometheus receiver GETs ``/metrics``
and must parse the text exposition format (public format spec from
the Prometheus docs / client_model):

    # HELP http_requests_total The total number of HTTP requests.
    # TYPE http_requests_total counter
    http_requests_total{method="post",code="200"} 1027 1395066363000

Decode contract here:

- ``# TYPE <family> <type>`` / ``# HELP <family> <text>`` comment
  lines build a tiny metadata dimension (families × 2 rows — always
  broadcastable); every other non-blank line is a sample.
- Sample grammar: ``name[{labels}] value [timestamp_ms]`` with label
  values double-quoted.  ``+Inf``/``-Inf``/``NaN`` parse to the IEEE
  values.  Unparseable lines survive with ``valid = false`` (same
  contract as ``decode_syslog`` / ``decode_statsd``).
- Histogram/summary series ride their family's TYPE via the
  ``_bucket``/``_sum``/``_count`` suffix convention: a sample name
  that misses the metadata join retries with the suffix stripped, so
  ``request_duration_seconds_bucket`` inherits ``histogram`` and
  reports ``suffix = 'bucket'``.  Order of lines does NOT matter to
  the decoder (metadata is a join, not a stateful scan) — scrapes are
  parsed whole, not streamed line-by-line.

Label parsing covers the grammar our exposition pages use (no escaped
quotes or commas inside label values); escape-heavy corpora should
extend the split — documented, not silent.

Scale shape: samples parse as pure column expressions fused into the
scan; the metadata join is two BROADCAST hash joins against a
families-sized dimension (exact-name, then stripped-name fallback).
Zero shuffles on the sample side, zero UDFs, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the text format allows any run of blanks/tabs between tokens, and
# timestamps are signed int64 milliseconds
_RE_SAMPLE = (
    r"^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\{(.*)\})?[ \t]+([^ \t]+)"
    r"(?:[ \t]+(-?\d+))?[ \t]*$"
)
_SUFFIXES = ("bucket", "sum", "count")


def decode_prom_text(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Decode one scrape page's lines into typed sample rows.

    Output keeps input columns and adds: ``name``, ``family`` (name
    with a histogram/summary suffix stripped when the metadata join
    says so), ``suffix`` ('' | 'bucket' | 'sum' | 'count'), ``mtype``
    (from # TYPE; NULL when the family was never declared), ``help``,
    ``labels`` map, ``value`` double, ``ts_ms`` long, ``valid``.
    Comment and blank lines are metadata, not samples — they do not
    appear in the output.
    """
    line = F.trim(F.col(line_col))
    meta = (
        df.select(line.alias("l"))
        .where(F.col("l").startswith("# TYPE ") | F.col("l").startswith("# HELP "))
        .select(
            F.regexp_extract("l", r"^# (TYPE|HELP) (\S+) (.*)$", 2).alias("family"),
            F.when(
                F.col("l").startswith("# TYPE "),
                F.regexp_extract("l", r"^# TYPE \S+ (\S+)", 1),
            ).alias("_mtype"),
            F.when(
                F.col("l").startswith("# HELP "),
                F.regexp_extract("l", r"^# HELP \S+ (.*)$", 1),
            ).alias("_help"),
        )
        .groupBy("family")
        .agg(F.max("_mtype").alias("mtype"), F.max("_help").alias("help"))
    )

    name = F.regexp_extract(line, _RE_SAMPLE, 1)
    ls = F.regexp_extract(line, _RE_SAMPLE, 2)
    vs = F.regexp_extract(line, _RE_SAMPLE, 3)
    tss = F.regexp_extract(line, _RE_SAMPLE, 4)
    ok = name != F.lit("")
    value = (
        F.when(vs == "+Inf", F.lit(float("inf")))
        .when(vs == "-Inf", F.lit(float("-inf")))
        .when(vs == "NaN", F.lit(float("nan")))
        .otherwise(vs.try_cast("double"))
    )
    parts = F.filter(F.split(ls, r'",\s*'), lambda p: p != "")
    labels = F.map_from_entries(
        F.transform(
            parts,
            lambda p: F.struct(
                F.regexp_extract(p, r"^\s*([^=]+)=", 1).alias("key"),
                F.regexp_replace(
                    F.regexp_extract(p, r'="(.*)$', 1), r'"$', ""
                ).alias("value"),
            ),
        )
    )
    suffix_re = r"_(%s)$" % "|".join(_SUFFIXES)
    stripped = F.regexp_replace(name, suffix_re, "")
    samples = (
        df.where(
            ~F.trim(F.col(line_col)).startswith("#")
            & (F.trim(F.col(line_col)) != "")
        )
        .select(
            "*",
            F.when(ok, name).alias("name"),
            F.when(ok, stripped).alias("_stripped"),
            F.when(ok & (ls != ""), labels).alias("labels"),
            F.when(ok, value).alias("value"),
            F.when(ok & (tss != ""), tss.try_cast("long")).alias("ts_ms"),
            ok.alias("valid"),
        )
    )
    exact = F.broadcast(meta).withColumnRenamed("family", "name")
    fallback = F.broadcast(
        meta.where(F.col("mtype").isin("histogram", "summary"))
        .withColumnRenamed("family", "_stripped")
        .withColumnRenamed("mtype", "_fb_mtype")
        .withColumnRenamed("help", "_fb_help")
    )
    joined = samples.join(exact, "name", "left").join(fallback, "_stripped", "left")
    use_fb = F.col("mtype").isNull() & F.col("_fb_mtype").isNotNull()
    return joined.select(
        *[c for c in samples.columns if c not in ("_stripped",)],
        F.when(~F.col("valid"), F.lit(None))
        .when(use_fb, F.col("_stripped"))
        .otherwise(F.col("name"))
        .alias("family"),
        F.when(~F.col("valid"), F.lit(None))
        .when(use_fb, F.regexp_extract(F.col("name"), suffix_re, 1))
        .otherwise(F.lit(""))
        .alias("suffix"),
        F.when(use_fb, F.col("_fb_mtype")).otherwise(F.col("mtype")).alias("mtype"),
        F.when(use_fb, F.col("_fb_help")).otherwise(F.col("help")).alias("help"),
    )


def generate_prom_text(events: DataFrame) -> DataFrame:
    """Render the events table as one deterministic ``/metrics`` scrape
    page (one DataFrame of lines).  Closed-form so oracles can predict
    the decoded surface from events directly:

    - ``event_id % 3 == 0`` → counter samples
      ``http_requests_total{method,code} <1 + id % 50>`` with a
      millisecond timestamp ``1700000000000 + id``
    - ``% 3 == 1`` → gauge samples
      ``node_memory_bytes{host="h<user_id % 20>"} <round(value*1000)>``
    - ``% 3 == 2`` → ONE histogram family
      ``request_duration_seconds`` aggregated per route
      (``r<user_id % 4>``) over observations ``round(value * 100)``
      with buckets le ∈ {200, 800, +Inf}: 3 ``_bucket`` lines +
      ``_sum`` + ``_count`` per route — a well-formed exposition
      (unique series per page), not one line per event.

    Plus ``# HELP`` / ``# TYPE`` headers for all three families and a
    malformed line to exercise ``valid = false``.
    """
    spark = events.sparkSession
    eid = F.col("event_id")
    counters = events.where(eid % 3 == 0).select(
        F.concat(
            F.lit("http_requests_total{method=\""),
            F.when(F.col("user_id") % 2 == 0, F.lit("get")).otherwise(F.lit("post")),
            F.lit("\",code=\""),
            F.element_at(
                F.array(F.lit("200"), F.lit("301"), F.lit("404"), F.lit("500")),
                (eid % 4 + 1).cast("int"),
            ),
            F.lit("\"} "),
            (eid % 50 + 1).cast("string"),
            F.lit(" "),
            (eid + 1700000000000).cast("string"),
        ).alias("line")
    )
    gauges = events.where(eid % 3 == 1).select(
        F.concat(
            F.lit("node_memory_bytes{host=\"h"),
            (F.col("user_id") % 20).cast("string"),
            F.lit("\"} "),
            F.round(F.col("value") * 1000).cast("long").cast("string"),
        ).alias("line")
    )
    obs = events.where(eid % 3 == 2).select(
        F.concat(F.lit("r"), (F.col("user_id") % 4).cast("string")).alias("route"),
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    hist = obs.groupBy("route").agg(
        F.sum((F.col("x") <= 200).cast("long")).alias("le200"),
        F.sum((F.col("x") <= 800).cast("long")).alias("le800"),
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
    )
    hname = "request_duration_seconds"
    hist_lines = hist.select(
        F.explode(
            F.array(
                F.concat(
                    F.lit(hname + "_bucket{route=\""), F.col("route"),
                    F.lit("\",le=\"200\"} "), F.col("le200").cast("string"),
                ),
                F.concat(
                    F.lit(hname + "_bucket{route=\""), F.col("route"),
                    F.lit("\",le=\"800\"} "), F.col("le800").cast("string"),
                ),
                F.concat(
                    F.lit(hname + "_bucket{route=\""), F.col("route"),
                    F.lit("\",le=\"+Inf\"} "), F.col("n").cast("string"),
                ),
                F.concat(
                    F.lit(hname + "_sum{route=\""), F.col("route"),
                    F.lit("\"} "), F.col("s").cast("string"),
                ),
                F.concat(
                    F.lit(hname + "_count{route=\""), F.col("route"),
                    F.lit("\"} "), F.col("n").cast("string"),
                ),
            )
        ).alias("line")
    )
    headers = spark.createDataFrame(
        [
            ("# HELP http_requests_total Total HTTP requests.",),
            ("# TYPE http_requests_total counter",),
            ("# HELP node_memory_bytes Resident memory.",),
            ("# TYPE node_memory_bytes gauge",),
            ("# HELP request_duration_seconds Request latency.",),
            ("# TYPE request_duration_seconds histogram",),
            ("this line is not a metric",),
        ],
        "line string",
    )
    return headers.unionByName(counters).unionByName(gauges).unionByName(hist_lines)
