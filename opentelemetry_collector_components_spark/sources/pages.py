"""Deterministic Common-Crawl-style `pages` table generator.

The input shape mandated by BASELINE.json: ``(url string, warc_ts timestamp,
html binary, text string, lang string)``.  Every column is a pure function of
``row_id`` built from JVM-side expressions (``spark.range`` + builtins) — no
Python in the data path, no wall clock, no RNG state.  This is the analog of
the reference's ``loadgenreceiver`` corpus replay
(receiver/loadgenreceiver/logs.go:58-109) recast as a columnar generator.

Skew is built in on purpose (FIXTURES.md §1): ~20%% of rows land on 3 hot
domains so the salted-repartition path (processor/partitioningprocessor
analog) is actually exercised.

The embedded ``text`` column is a grok-able log line:

    ts=<iso> level=<INFO|WARN|ERROR> svc=<svc-N> code=<100..599>
    dur_us=<int> msg="<verb> /p/<n>"

with a fixed 1%% of rows malformed (level+code dropped) to test error
routing, mirroring the reference's malformed-NDJSON handling
(receiver/elasticapmintakereceiver/internal/ndjsondecoder/stream.go:97-300).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_DOMAINS = 50
N_HOT = 3
N_COLD = N_DOMAINS - N_HOT
HOT_PCT = 20  # percent of rows on the hot domains
EPOCH_2026 = 1767225600  # 2026-01-01T00:00:00Z

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def domain_expr(id_col):
    """Domain as a pure function of row id with Zipf-ish head skew."""
    is_hot = F.pmod(F.xxhash64(id_col), F.lit(100)) < F.lit(HOT_PCT)
    hot = F.concat(F.lit("hot"), F.pmod(id_col, F.lit(N_HOT)), F.lit(".example.com"))
    cold = F.concat(
        F.lit("d"),
        F.pmod(F.xxhash64(id_col, F.lit(1)), F.lit(N_COLD)),
        F.lit(".example.org"),
    )
    return F.when(is_hot, hot).otherwise(cold)


def generate_pages(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """Generate the pages table: columns are exact functions of ``id``.

    ``spark.range`` is already parallel; every derived column stays inside
    whole-stage codegen, so the generator itself scales linearly with cores
    (it stands in for an Iceberg scan in the benchmarks).
    """
    df = spark.range(0, n_rows, 1, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    id_ = F.col("id")

    domain = domain_expr(id_)
    path = F.concat(F.lit("p/"), F.pmod(id_, F.lit(1000)))
    url = F.concat(F.lit("https://"), domain, F.lit("/"), path)

    warc_ts = F.timestamp_seconds(F.lit(EPOCH_2026) + F.pmod(id_, F.lit(86400)))
    iso = F.date_format(warc_ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")

    lvl_bucket = F.pmod(id_, F.lit(10))
    level = (
        F.when(lvl_bucket <= 6, F.lit("INFO"))
        .when(lvl_bucket <= 8, F.lit("WARN"))
        .otherwise(F.lit("ERROR"))
    )
    svc = F.concat(F.lit("svc-"), F.pmod(id_, F.lit(20)))
    code = (F.lit(100) + F.pmod(id_ * F.lit(7), F.lit(500))).cast("int")
    dur_us = F.pmod(id_ * F.lit(131), F.lit(1000000))
    verb_bucket = F.pmod(id_, F.lit(3))
    verb = (
        F.when(verb_bucket == 0, F.lit("GET"))
        .when(verb_bucket == 1, F.lit("POST"))
        .otherwise(F.lit("PUT"))
    )
    msg = F.concat(F.lit('msg="'), verb, F.lit(" /"), path, F.lit('"'))

    well_formed = F.concat_ws(
        " ",
        F.concat(F.lit("ts="), iso),
        F.concat(F.lit("level="), level),
        F.concat(F.lit("svc="), svc),
        F.concat(F.lit("code="), code),
        F.concat(F.lit("dur_us="), dur_us),
        msg,
    )
    # fixed 1% malformed: level+code missing entirely
    malformed = F.concat_ws(
        " ",
        F.concat(F.lit("ts="), iso),
        F.concat(F.lit("svc="), svc),
        F.concat(F.lit("dur_us="), dur_us),
        msg,
    )
    is_malformed = F.pmod(F.xxhash64(id_, F.lit(2)), F.lit(100)) == F.lit(0)
    text = F.when(is_malformed, malformed).otherwise(well_formed)

    lang_bucket = F.pmod(id_, F.lit(20))
    lang = (
        F.when(lang_bucket < 12, F.lit("en"))   # 60%
        .when(lang_bucket < 15, F.lit("de"))    # 15%
        .when(lang_bucket < 17, F.lit("fr"))    # 10%
        .when(lang_bucket < 19, F.lit("es"))    # 10%
        .otherwise(F.lit("ja"))                  # 5%
    )

    html = F.concat(
        F.lit("<html><head><title>T"),
        id_,
        F.lit("</title></head><body>"),
        text,
        F.lit("</body></html>"),
    ).cast("binary")

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        id_.alias("doc_id"),  # kept for golden joins; drop with select(PAGES_COLUMNS) if strict shape needed
    )
