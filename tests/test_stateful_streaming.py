"""applyInPandasWithState: cumulative state survives across micro-batches,
out-of-order rows in later batches ignored."""

import shutil
import tempfile

from opentelemetry_collector_components_spark.streaming.stateful import (
    cumulative_latest_stateful,
)


def test_state_across_batches(spark):
    tmp = tempfile.mkdtemp()
    try:
        # two parquet files == two micro-batches (maxFilesPerTrigger=1)
        b1 = spark.createDataFrame(
            [("k1", "2026-01-01T00:00:30", 1, 100.0), ("k2", "2026-01-01T00:00:10", 2, 7.0)],
            "key string, ts_s string, seq long, value double",
        ).selectExpr("key", "cast(ts_s as timestamp) ts", "seq", "value")
        b2 = spark.createDataFrame(
            [("k1", "2026-01-01T00:00:05", 3, 999.0),   # older ts, later batch -> ignored
             ("k2", "2026-01-01T00:00:50", 4, 8.0)],    # newer -> replaces
            "key string, ts_s string, seq long, value double",
        ).selectExpr("key", "cast(ts_s as timestamp) ts", "seq", "value")
        b1.coalesce(1).write.parquet(f"{tmp}/in/b1")
        b2.coalesce(1).write.parquet(f"{tmp}/in/b2")

        static = spark.read.parquet(f"{tmp}/in/*")
        stream = (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in/*")
        )
        out = cumulative_latest_stateful(stream)
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("cum_state")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        q.processAllAvailable()
        q.stop()

        rows = spark.sql(
            "select key, last(latest_value) as v from "
            "(select * from cum_state) group by key"
        ).collect()
        # final state: k1 keeps 100.0 (the 999.0 row was older), k2 -> 8.0
        final = {}
        for r in spark.sql("select * from cum_state").collect():
            final[r["key"]] = (r["latest_ts"], r["latest_value"])
        assert final["k1"][1] == 100.0
        assert final["k2"][1] == 8.0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
