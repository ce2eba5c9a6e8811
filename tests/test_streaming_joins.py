from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.streaming.joins import (
    interval_join_streams,
)


def _run_append(spark, df, name):
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    ckpt = tempfile.mkdtemp(prefix="ckpt_join_")
    try:
        (
            df.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


@pytest.fixture(scope="module")
def events_src(spark, sf_dir):
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    return schema, f"{sf_dir}/events.*"


def _sides(spark, schema, path, streaming):
    reader = (
        spark.readStream.schema(schema).parquet(path)
        if streaming
        else spark.read.schema(schema).parquet(path)
    )
    left = reader.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("l_ts"),
        F.col("event_id").alias("l_id"),
    )
    reader2 = (
        spark.readStream.schema(schema).parquet(path)
        if streaming
        else spark.read.schema(schema).parquet(path)
    )
    right = reader2.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("r_ts"),
        F.col("event_id").alias("r_id"),
    )
    return left, right


def test_stream_equals_batch(spark, events_src):
    schema, path = events_src
    ls, rs = _sides(spark, schema, path, streaming=True)
    joined = interval_join_streams(
        ls, rs, ["user_id"], "l_ts", "r_ts", "60 minutes"
    ).select("l_id", "r_id")
    got = {(r["l_id"], r["r_id"]) for r in _run_append(spark, joined, "t_join").collect()}

    lb, rb = _sides(spark, schema, path, streaming=False)
    want = {
        (r["l_id"], r["r_id"])
        for r in lb.join(
            rb,
            (lb.user_id == rb.user_id)
            & (F.col("r_ts") > F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 60 minutes")),
        )
        .select("l_id", "r_id")
        .collect()
    }
    assert got == want and len(want) > 0


def test_bounds_are_half_open(spark):
    """Drives interval_join_streams itself (real file streams) so the
    function's own bound construction — strict lower, inclusive upper,
    multi-word interval string — is what's under test."""
    rows_l = [(1, "2024-01-01 00:00:00", 10)]
    rows_r = [
        (1, "2024-01-01 00:00:00", 20),  # equal ts: excluded (strict >)
        (1, "2024-01-01 00:05:00", 21),  # inside
        (1, "2024-01-01 00:10:00", 22),  # exactly upper: included (<=)
        (1, "2024-01-01 00:10:01", 23),  # beyond: excluded
        (2, "2024-01-01 00:05:00", 24),  # wrong key
    ]
    base = tempfile.mkdtemp(prefix="join_bounds_")
    try:
        spark.createDataFrame(rows_l, "k int, l_ts string, l_id int").select(
            "k", F.col("l_ts").cast("timestamp").alias("l_ts"), "l_id"
        ).write.parquet(f"{base}/l")
        spark.createDataFrame(rows_r, "k int, r_ts string, r_id int").select(
            "k", F.col("r_ts").cast("timestamp").alias("r_ts"), "r_id"
        ).write.parquet(f"{base}/r")
        ls = spark.readStream.schema("k int, l_ts timestamp, l_id int").parquet(f"{base}/l")
        rs = spark.readStream.schema("k int, r_ts timestamp, r_id int").parquet(f"{base}/r")
        joined = interval_join_streams(ls, rs, ["k"], "l_ts", "r_ts", "10 minutes")
        got = {r["r_id"] for r in _run_append(spark, joined, "t_bounds").collect()}
    finally:
        shutil.rmtree(base, ignore_errors=True)
    assert got == {21, 22}


def test_validations(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError):
        interval_join_streams(df, df, [], "a", "b", "1 minute")
    with pytest.raises(ValueError):
        # non-key overlap: column b on both sides
        interval_join_streams(df, df, ["a"], "b", "b", "1 minute")
