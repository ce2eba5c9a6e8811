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


def test_token_bucket_stateful_stream_equals_batch(spark):
    """Streaming token bucket with cross-batch state == the batch scan on
    the same (in-order) events: state survives the micro-batch boundary."""
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.streaming.admission import (
        token_bucket_admit,
        token_bucket_stateful,
    )

    tmp = tempfile.mkdtemp()
    data, ckpt = f"{tmp}/data", f"{tmp}/ckpt"
    os.makedirs(data)
    try:
        base = 1_700_000_000

        def mk(lo, hi):
            rows = [
                (k, i, base + i)
                for k in ("a", "b")
                for i in range(lo, hi)
            ]
            return spark.createDataFrame(
                rows, "key string, event_id long, sec long"
            ).select("key", "event_id", F.timestamp_seconds("sec").alias("ts"))

        # two single-file batches, mtime-ordered so the file source
        # processes them as two micro-batches (maxFilesPerTrigger=1)
        for n, (lo, hi) in enumerate([(0, 8), (8, 16)]):
            stage = f"{tmp}/stage{n}"
            mk(lo, hi).coalesce(1).write.parquet(stage)
            part = glob.glob(f"{stage}/part-*.parquet")[0]
            dst = f"{data}/{n:03d}.parquet"
            shutil.copy(part, dst)
            os.utime(dst, (1000 + n, 1000 + n))

        full = mk(0, 16)
        stream = (
            spark.readStream.schema(full.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(data)
        )
        out = token_bucket_stateful(
            stream, ["key"], rate=0.2, burst=3.0, order_col="event_id"
        )
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("tb_stateful")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.table("tb_stateful").select(
            "key", "event_seq", "admitted", F.round("tokens_after", 6).alias("t")
        )
        want = token_bucket_admit(
            full, ["key"], rate=0.2, burst=3.0, order_col="event_id"
        ).select("key", "event_seq", "admitted", F.round("tokens_after", 6).alias("t"))
        assert got.count() == 32
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        # the interesting part: at least one admit decision in batch 2
        # depended on state carried from batch 1 (bucket not full at entry)
        b2 = {r["event_seq"]: r for r in want.collect() if r["event_seq"] >= 8}
        assert any(not r["admitted"] for r in b2.values()) or any(
            r["t"] < 2.0 for r in b2.values()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
