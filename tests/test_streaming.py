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
