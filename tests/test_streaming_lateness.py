"""Streaming lateness twin: stream output across micro-batches equals
the batch frontier replay row for row; cross-batch regression raises."""

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.lateness import (
    lateness_events,
)
from opentelemetry_collector_components_spark.streaming.lateness import (
    lateness_stateful,
)


def _run_batches(spark, batches, name):
    """Stage each batch as one parquet file, replay with
    maxFilesPerTrigger=1, collect the update-mode memory sink."""
    tmp = tempfile.mkdtemp(prefix="late_stream_")
    data = f"{tmp}/data"
    os.makedirs(data)
    schema = "key string, arrival long, event_sec long"
    try:
        for n, rows in enumerate(batches):
            stage = f"{tmp}/stage{n}"
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
            src = glob.glob(f"{stage}/part-*.parquet")[0]
            dst = f"{data}/{n:03d}.parquet"
            shutil.copy(src, dst)
            os.utime(dst, (1000 + n, 1000 + n))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(data)
        )
        out = lateness_stateful(stream, "key", "arrival", "event_sec")
        ckpt = f"{tmp}/ckpt"
        for q in spark.streams.active:
            if q.name == name:
                q.stop()
        (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        return spark.table(name).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_equals_batch_across_batches(spark):
    rows = [
        ("k", 0, 100),
        ("k", 1, 110),
        ("k", 2, 95),    # 15 late
        ("k", 3, 120),
        ("k", 4, 60),    # 60 late (vs frontier 120, set in batch 1)
        ("k", 5, 130),
        ("x", 0, 50),
        ("x", 1, 40),    # 10 late
    ]
    batches = [rows[:4] + rows[6:7], rows[4:6] + rows[7:]]
    got = {
        (r["key"], r["arrival"]): (r["event_sec"], r["late_s"])
        for r in _run_batches(spark, batches, "late_stream_eq")
    }

    df = spark.createDataFrame(rows, "key string, arrival long, event_sec long")
    batch = {
        (r["key"], r["arrival"]): (r["event_sec"], r["late_s"])
        for r in lateness_events(
            df.withColumn("ts", F.col("event_sec").cast("timestamp")),
            ["key"],
            "arrival",
            "ts",
        ).collect()
    }
    assert got == batch
    assert got[("k", 4)] == (60, 60)
    assert got[("k", 2)] == (95, 15)
    assert got[("x", 1)] == (40, 10)


def test_cross_batch_regression_raises(spark):
    batches = [[("k", 5, 100)], [("k", 3, 200)]]  # arrival goes backwards
    with pytest.raises(Exception, match="regressed"):
        _run_batches(spark, batches, "late_stream_reg")
