"""Streaming HLL sketch maintenance: multi-batch merge correctness,
per-batch sink cost bounded by touched partitions, estimates == batch."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.sketches import (
    estimate,
    merge_sketches,
)
from opentelemetry_collector_components_spark.streaming.sketches import (
    read_sketch_estimates,
    streaming_sketch_distinct,
)


def _write_batches(spark, src_dir):
    batches = [
        [("d1", u) for u in range(0, 40)],
        [("d1", u) for u in range(20, 60)] + [("d2", u) for u in range(0, 10)],
        [("d3", u) for u in range(0, 25)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "day string, user long").coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(f"{src_dir}/b{i}")
    return batches


def test_multi_batch_merge_and_boundedness(spark):
    src = tempfile.mkdtemp(prefix="sketch_src_")
    out = tempfile.mkdtemp(prefix="sketch_out_")
    ckpt = tempfile.mkdtemp(prefix="sketch_ckpt_")
    shutil.rmtree(out)  # must not pre-exist as an empty parquet table
    try:
        _write_batches(spark, src)
        stream = spark.readStream.schema("day string, user long").option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{src}/b*")
        stats: list = []
        q = streaming_sketch_distinct(
            stream, ["day"], "user", out, ckpt,
            query_name="test_stream_sketch", stats=stats,
        )
        q.awaitTermination()

        got = {
            r.day: r.distinct_est
            for r in read_sketch_estimates(spark, out, ["day"]).collect()
        }
        # d1 saw 0..59 across two batches, d2 0..9, d3 0..24
        assert got == {"d1": 60, "d2": 10, "d3": 25}
        # global merge: user ids are shared across days (d2/d3 subsets of
        # d1's 0..59), so the union distinct is 60 — the merge must NOT
        # add per-day counts
        merged = merge_sketches(spark.read.parquet(out), [])
        assert merged.select(estimate("hll_sketch").alias("e")).collect()[0].e == 60

        assert len(stats) == 3
        # per-batch sink cost = touched partitions' sketch rows, never the
        # whole table: batch 3 (d3 only) touches 1 partition, writes 1 row
        assert stats[2]["partitions_touched"] == 1
        assert stats[2]["rows_written"] == 1
        assert all(s["rows_written"] <= 2 for s in stats)
    finally:
        for q in spark.streams.active:
            if q.name == "test_stream_sketch":
                q.stop()
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_restart_resumes_without_double_count(spark):
    # same-value replay is the HLL sweet spot: re-sketching identical
    # values cannot inflate the estimate, so a duplicate batch is harmless
    src = tempfile.mkdtemp(prefix="sketch_src2_")
    out = tempfile.mkdtemp(prefix="sketch_out2_")
    ckpt = tempfile.mkdtemp(prefix="sketch_ckpt2_")
    shutil.rmtree(out)
    try:
        rows = [("d1", u) for u in range(30)]
        spark.createDataFrame(rows, "day string, user long").coalesce(1).write.parquet(
            f"{src}/b0"
        )
        for _ in range(2):  # second run: new checkpoint, same sink -> re-merge
            ck = tempfile.mkdtemp(prefix="sketch_ckpt2b_")
            stream = spark.readStream.schema("day string, user long").parquet(
                f"{src}/b*"
            )
            q = streaming_sketch_distinct(
                stream, ["day"], "user", out, ck, query_name="test_stream_sketch2"
            )
            q.awaitTermination()
            shutil.rmtree(ck, ignore_errors=True)
        got = read_sketch_estimates(spark, out, ["day"]).collect()
        assert [(r.day, r.distinct_est) for r in got] == [("d1", 30)]
    finally:
        for q in spark.streams.active:
            if q.name == "test_stream_sketch2":
                q.stop()
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# decayed trending partials through the same merge sink
# ---------------------------------------------------------------------------
def test_streaming_trending_multi_batch_matches_direct(spark):
    import tempfile as _tf

    from opentelemetry_collector_components_spark.operators.trending import (
        decayed_scores,
    )
    from opentelemetry_collector_components_spark.streaming.trending import (
        read_trending,
        streaming_decayed_partials,
    )

    src = _tf.mkdtemp(prefix="trend_src_")
    out = _tf.mkdtemp(prefix="trend_out_")
    ckpt = _tf.mkdtemp(prefix="trend_ckpt_")
    shutil.rmtree(out)
    try:
        from datetime import datetime, timedelta

        t0 = datetime(2024, 3, 1, 0, 0, 0)
        now = 1709337600  # 2024-03-02T00:00:00Z
        hl = 86400
        batches = [
            [("a", t0), ("a", t0), ("b", t0 + timedelta(hours=3))],
            [("a", t0 + timedelta(hours=20)), ("b", t0 + timedelta(days=-1))],
        ]
        rows = []
        for i, bs in enumerate(batches):
            spark.createDataFrame(bs, "path string, ts timestamp").coalesce(
                1
            ).write.parquet(f"{src}/b{i}")
            rows += bs
        stream = spark.readStream.schema("path string, ts timestamp").option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{src}/b*")
        stats: list = []
        q = streaming_decayed_partials(
            stream, ["path"], "ts", hl, out, ckpt,
            query_name="test_stream_trend", stats=stats,
        )
        q.awaitTermination()
        got = {
            r.path: r.score
            for r in read_trending(spark, out, ["path"], now, hl).collect()
        }
        direct = {
            r.path: r.score
            for r in decayed_scores(
                spark.createDataFrame(rows, "path string, ts timestamp"),
                ["path"], "ts", now, hl,
            ).collect()
        }
        assert set(got) == set(direct)
        for p in direct:  # multi-batch rounding drift bounded by 1e-3
            assert abs(got[p] - direct[p]) < 1e-3, (p, got[p], direct[p])
        assert len(stats) == 2
        # batch 2 touches 2 anchors (its rows span 2 days), never the
        # whole table
        assert all(s["partitions_touched"] <= 2 for s in stats)
    finally:
        for q in spark.streams.active:
            if q.name == "test_stream_trend":
                q.stop()
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)
