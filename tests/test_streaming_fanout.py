"""Streaming fan-out: per-sink counts equal the batch fan-out's."""

import shutil
import tempfile

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.plans.pipeline import run_e2e
from opentelemetry_collector_components_spark.streaming.fanout import streaming_fanout


def test_stream_fanout_counts_match_batch(spark):
    tmp = tempfile.mkdtemp()
    try:
        routed = run_e2e(spark, 4000, intervals=("60m",))["_routed"]
        routed.write.mode("overwrite").parquet(f"{tmp}/in")
        static = spark.read.parquet(f"{tmp}/in")

        stream = spark.readStream.schema(static.schema).parquet(f"{tmp}/in")
        q = streaming_fanout(stream, tmp, f"{tmp}/ckpt")
        q.awaitTermination(120)

        got = {
            r["sink"]: r["cnt"]
            for r in spark.read.parquet(f"{tmp}/stream_fanout")
            .groupBy("sink").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        want = {
            r["sink"]: r["cnt"]
            for r in static.groupBy("sink").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        assert got == want
        # lineage rows cover every sink
        lin = spark.read.parquet(f"{tmp}/stream_lineage")
        assert {r["sink"] for r in lin.collect()} == set(want)
        assert sum(r["rows_out"] for r in lin.collect()) == 4000
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
