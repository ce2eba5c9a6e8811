"""Sink fan-out + lineage/metrics rows.

Analog of the ES exporter's data-stream routing (SURVEY.md K1/R3: documents
land in the stream named by ``data_stream.*``) and of the collector's
component telemetry counters (``telemetryBuilder.*.Add``,
lsmintervalprocessor/processor.go:367-376,630-641) — every sink commit is
accompanied by a lineage row recording what went in and out.

Table format: parquet directories with a thin abstraction; on clusters with
an Iceberg catalog the same calls go through ``writeTo(...).append()``
(``use_iceberg=True``).  Locally (this sandbox has no Iceberg jars) the
parquet path is the tested one.

Scale notes
-----------
``write_fanout`` is ONE pass over the data (``partitionBy(route)``): Spark
writes each route's rows into its own directory without per-route job
launches — at 10^12 rows, N-sinks-as-N-filtered-scans would read the input
N times; this reads it once.  ``write_per_sink`` exists for checkpointed /
resumable runs where per-sink commit granularity is the point.
"""

from __future__ import annotations

import os
import time

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "sink string, rows_out long, malformed long, min_ts timestamp, "
    "max_ts timestamp, run_id string, committed_at double"
)


def sink_path(base_dir: str, sink: str) -> str:
    return os.path.join(base_dir, "sinks", sink.replace("/", "_"))


def iceberg_available(spark: SparkSession, catalog: str = "local") -> bool:
    """True when an Iceberg Spark catalog is configured (the jars are not in
    this sandbox; on a real cluster set
    ``spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog`` and
    ``spark.sql.catalog.local.type=hadoop`` + warehouse)."""
    try:
        cls = spark.conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return False
    return bool(cls) and "iceberg" in cls.lower()


def write_table(df: DataFrame, base_dir: str, name: str, mode: str = "append", catalog: str = "local") -> str:
    """Format-abstracted table write: Iceberg ``writeTo().append()`` when a
    catalog exists (atomic snapshot commit — the WAL/commit-atomicity analog,
    SURVEY.md K2), parquet directory otherwise."""
    spark = df.sparkSession
    if iceberg_available(spark, catalog):
        ident = f"{catalog}.db.{name}"
        if mode == "overwrite":
            df.writeTo(ident).createOrReplace()
        else:
            try:
                df.writeTo(ident).append()
            except AnalysisException as e:
                # create only on table-missing; any other append failure
                # (commit conflict, schema mismatch, storage error) must
                # propagate, not be masked by a TableAlreadyExists
                if "TABLE_OR_VIEW_NOT_FOUND" not in str(e):
                    raise
                df.writeTo(ident).create()
        return ident
    path = os.path.join(base_dir, name)
    df.write.mode(mode).parquet(path)
    return path


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> str:
    """Hash-bucketed (optionally sorted) table write — the co-located-join
    scale path.

    At 100 TB, bucket both fact tables on their join key ONCE; every
    subsequent join between them is shuffle-free (Spark recognizes the
    matching bucket spec and plans SortMergeJoin with no Exchange, and no
    per-query Sort when ``sort_cols`` == join key).  Equivalent to the
    reference's partitioningprocessor slot (E9) taken to its cluster
    conclusion: pre-partition once, reuse the layout across queries.
    ``path`` makes it an external table (bucketing metadata still lands in
    the session catalog, the data wherever you point it).
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(name)
    return name


def write_fanout(df: DataFrame, base_dir: str, route_col: str = "sink", mode: str = "overwrite") -> str:
    """Single-pass fan-out: one write partitioned by the route column."""
    out = os.path.join(base_dir, "fanout")
    df.write.mode(mode).partitionBy(route_col).parquet(out)
    return out


def lineage_rows(df: DataFrame, route_col: str = "sink", ts_col: str = "warc_ts", run_id: str = "run0") -> DataFrame:
    """Per-sink lineage/metrics aggregate (tiny; one extra pass over the
    routed frame — cache the frame if also fanning out)."""
    has_malformed = "malformed" in df.columns
    return df.groupBy(route_col).agg(
        F.count(F.lit(1)).alias("rows_out"),
        (F.sum(F.col("malformed").cast("long")) if has_malformed else F.lit(0)).alias("malformed"),
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"),
        F.lit(run_id).alias("run_id"),
        F.lit(time.time()).alias("committed_at"),
    ).withColumnRenamed(route_col, "sink")


def append_lineage(spark: SparkSession, rows: DataFrame, base_dir: str) -> None:
    rows.write.mode("append").parquet(os.path.join(base_dir, "_lineage"))


def read_lineage(spark: SparkSession, base_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base_dir, "_lineage"))


def write_per_sink(
    df: DataFrame,
    base_dir: str,
    routes: list[str],
    route_col: str = "sink",
    run_id: str = "run0",
    fail_after: int | None = None,
) -> list[str]:
    """Per-sink filtered writes, each followed by its lineage append —
    the commit unit for resumable runs (plans.checkpoint).

    ``fail_after`` injects a crash after N sinks (test hook for the
    kill-between-sinks resume fixture, FIXTURES.md §6).
    """
    spark = df.sparkSession
    written = []
    for i, route in enumerate(sorted(routes)):
        if fail_after is not None and i >= fail_after:
            raise RuntimeError(f"injected failure before sink {route}")
        part = df.filter(F.col(route_col) == route)
        part.write.mode("overwrite").parquet(sink_path(base_dir, route))
        append_lineage(spark, lineage_rows(part, route_col, run_id=run_id), base_dir)
        written.append(route)
    return written


def prw_export_payloads(df: DataFrame, n_shards: int = 8) -> DataFrame:
    """Prometheus remote-write EXPORT path (K2): series rows -> snappy-
    compressed prompb.WriteRequest payloads, one per shard.

    Input columns: ``name`` (metric name), ``labels`` (map<string,string>,
    __name__ added automatically), ``value`` (double), ``ts_ms`` (long).
    Mirrors the reference exporter's convert->batch->marshal->compress
    chain (internal/exporter/prometheusremotewriteexporter) with the
    pure-Python codecs in ``functions/protowire.py`` /
    ``functions/snappy_codec.py``; the HTTP POST is the caller's sink.

    Sharding is hash(name) so one series never splits across payloads
    (the exporter's requirement for remote-write ordering); payload bytes
    are deterministic: series sorted by label set, samples by timestamp.
    """
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from ..functions.protowire import encode_write_request
    from ..functions.snappy_codec import snappy_compress

    out_schema = StructType(
        [
            StructField("shard", LongType()),
            StructField("n_series", LongType()),
            StructField("n_samples", LongType()),
            StructField("payload", BinaryType()),
        ]
    )

    def _encode(key, pdf):
        series: dict[tuple, dict] = {}
        for name, labels, value, ts_ms in zip(
            pdf["name"], pdf["labels"], pdf["value"], pdf["ts_ms"]
        ):
            full = dict(labels or {})
            full["__name__"] = name
            skey = tuple(sorted(full.items()))
            entry = series.setdefault(skey, {"labels": dict(skey), "samples": []})
            entry["samples"].append((float(value), int(ts_ms)))
        ordered = [series[k] for k in sorted(series)]
        for s in ordered:
            s["samples"].sort(key=lambda vt: (vt[1], vt[0]))
        payload = snappy_compress(encode_write_request(ordered))
        return pd.DataFrame(
            [
                {
                    "shard": int(key[0]),
                    "n_series": len(ordered),
                    "n_samples": int(sum(len(s["samples"]) for s in ordered)),
                    "payload": payload,
                }
            ]
        )

    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64("name"), F.lit(n_shards))
    )
    return sharded.groupBy("shard").applyInPandas(_encode, schema=out_schema)
