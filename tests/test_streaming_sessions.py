"""Streaming session_window: cross-micro-batch session merging, boundary
strictness, and stream == batch equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.queries import _run_stream_gate
from opentelemetry_collector_components_spark.streaming.sessions import (
    sessionize_stream,
)

SCHEMA = "user_id long, ts timestamp"
GAP_S = 4 * 3600


def _drain(spark, stream_df, name):
    return _run_stream_gate(spark, stream_df, name)


def _write_batches(spark, tmpdir, batches):
    """One parquet file per batch so maxFilesPerTrigger=1 replays them as
    separate micro-batches."""
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{tmpdir}/b{i}", mode="overwrite"
        )
    return f"{tmpdir}/b*"


def test_sessions_merge_across_micro_batches(spark, tmp_path):
    # user 1: batch 0 event at t0, batch 1 event 1h later (same session);
    # user 2: events GAP+1s apart across batches (two sessions)
    import datetime as dt

    batches = [
        [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 1))],
        [
            (1, dt.datetime(2024, 1, 1, 1, 0, 0)),
            (2, dt.datetime(2024, 1, 1, 4, 0, 1)),
        ],
    ]
    glob = _write_batches(spark, str(tmp_path), batches)
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(glob)
    out = _drain(
        spark,
        sessionize_stream(stream, ["user_id"], gap="4 hours"),
        "sess_merge_test",
    )
    got = {
        (r["user_id"], str(r["window_start"])): r["n_events"]
        for r in out.collect()
    }
    assert got[(1, "2024-01-01 00:00:00")] == 2  # merged across batches
    assert got[(2, "2024-01-01 00:00:00")] == 1
    assert got[(2, "2024-01-01 04:00:01")] == 1  # > gap -> new session


def test_boundary_event_at_exactly_gap_extends(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0), (1, t0 + dt.timedelta(seconds=GAP_S))]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        f"{tmp_path}/b0", mode="overwrite"
    )
    stream = spark.readStream.schema(SCHEMA).parquet(f"{tmp_path}/b*")
    out = _drain(
        spark,
        sessionize_stream(stream, ["user_id"], gap="4 hours"),
        "sess_boundary_test",
    )
    assert out.count() == 1 and out.collect()[0]["n_events"] == 2


def test_stream_equals_batch_on_events(spark, sf_dir):
    from opentelemetry_collector_components_spark.operators.sessions import (
        session_stats,
    )

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(f"{sf_dir}/events.*")
    got = _drain(
        spark,
        sessionize_stream(stream, ["user_id"], gap="4 hours"),
        "sess_eq_test",
    ).select("user_id", "window_start", "n_events")

    batch = session_stats(
        spark.read.parquet(f"{sf_dir}/events.parquet"),
        ["user_id"], "ts", gap="4 hours", order_col="event_id",
    )
    want = batch.select(
        "user_id",
        F.col("session_start").alias("window_start"),
        F.col("n_events"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_keys_required(spark):
    df = spark.readStream.schema(SCHEMA).parquet("/tmp/nonexistent_*")
    with pytest.raises(ValueError, match="keys"):
        sessionize_stream(df, [])
