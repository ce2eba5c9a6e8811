"""Streaming interval aggregation == batch aggregation on the same data."""

import shutil
import tempfile

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.enrich import (
    derive_event_fields,
    enrich_with_dim,
)
from opentelemetry_collector_components_spark.operators.parse import parse_pages
from opentelemetry_collector_components_spark.sources.dims import generate_domain_dim
from opentelemetry_collector_components_spark.sources.pages import generate_pages
from opentelemetry_collector_components_spark.streaming.interval import (
    run_stream_to_memory,
    streaming_interval_agg,
)


def test_stream_equals_batch(spark):
    tmp = tempfile.mkdtemp()
    data_dir, ckpt = f"{tmp}/data", f"{tmp}/ckpt"
    try:
        enriched = derive_event_fields(
            enrich_with_dim(parse_pages(generate_pages(spark, 5000)), generate_domain_dim(spark))
        )
        enriched.write.mode("overwrite").parquet(data_dir)
        static = spark.read.parquet(data_dir)

        stream = spark.readStream.schema(static.schema).parquet(data_dir)
        agg = streaming_interval_agg(stream, keys=["geo"], interval="10 minutes")
        q = run_stream_to_memory(agg, "sagg", ckpt, mode="complete")
        q.processAllAvailable()
        q.stop()

        got = {
            (r["window_start"], r["geo"]): (r["docs"], r["dur_us_sum"])
            for r in spark.sql("select * from sagg").collect()
        }
        want = {
            (r["w"], r["geo"]): (r["docs"], r["dur_us_sum"])
            for r in static.groupBy(
                F.window("warc_ts", "10 minutes")["start"].alias("w"), "geo"
            )
            .agg(F.count(F.lit(1)).alias("docs"), F.sum("dur_us").alias("dur_us_sum"))
            .collect()
        }
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_watermark_present(spark):
    enriched = derive_event_fields(
        enrich_with_dim(parse_pages(generate_pages(spark, 100)), generate_domain_dim(spark))
    )
    tmp = tempfile.mkdtemp()
    try:
        enriched.write.mode("overwrite").parquet(f"{tmp}/d")
        static = spark.read.parquet(f"{tmp}/d")
        stream = spark.readStream.schema(static.schema).parquet(f"{tmp}/d")
        agg = streaming_interval_agg(stream, keys=["geo"], watermark="5 minutes")
        assert agg.isStreaming
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_rollup_equals_batch_all_intervals(spark):
    """streaming_interval_rollup: the 1m stateful aggregate AND the
    10m/60m foreachBatch-derived rollups must each equal the direct batch
    aggregate at that interval."""
    from opentelemetry_collector_components_spark.operators.aggregate import (
        trunc_to_interval,
    )
    from opentelemetry_collector_components_spark.streaming.interval import (
        streaming_interval_rollup,
    )

    tmp = tempfile.mkdtemp()
    data_dir, ckpt, out = f"{tmp}/data", f"{tmp}/ckpt", f"{tmp}/out"
    try:
        rows = spark.range(20000).select(
            F.timestamp_seconds(1_700_000_000 + F.col("id") * 37).alias("ts"),
            F.concat(F.lit("t"), F.col("id") % 5).alias("event_type"),
            (F.col("id") % 100 / 7.0).alias("value"),
        )
        rows.write.mode("overwrite").parquet(data_dir)
        static = spark.read.parquet(data_dir)

        stream = spark.readStream.schema(static.schema).parquet(data_dir)
        q = streaming_interval_rollup(
            stream, ["event_type"], out, ckpt, query_name="rollup_t"
        )
        q.awaitTermination()
        got = spark.read.parquet(out)

        for ivl in ("1m", "10m", "60m"):
            expect = static.groupBy(
                trunc_to_interval(F.col("ts"), ivl).alias("window_start"),
                "event_type",
            ).agg(
                F.count(F.lit(1)).alias("docs"),
                F.round(F.sum("value"), 6).alias("value_sum"),
            )
            g = got.filter(F.col("metricset_interval") == ivl).select(
                "window_start",
                "event_type",
                "docs",
                F.round("value_sum", 6).alias("value_sum"),
            )
            assert g.exceptAll(expect).count() == 0, ivl
            assert expect.exceptAll(g).count() == 0, ivl
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
