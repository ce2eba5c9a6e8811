"""Streaming DDSketch maintenance: multi-batch merge equals the batch
sketch exactly (bucket rows, not just estimates), bounded per-batch
writes, read-time coarser rollup."""

from __future__ import annotations

import shutil
import tempfile

from opentelemetry_collector_components_spark.operators.sketches import (
    ddsketch_build,
    ddsketch_quantiles,
)
from opentelemetry_collector_components_spark.streaming.ddsketch import (
    read_ddsketch_quantiles,
    streaming_ddsketch,
)


def _write_batches(spark, src_dir):
    batches = [
        [("d1", float(v)) for v in range(1, 41)],
        [("d1", float(v)) for v in range(30, 80)]
        + [("d2", 5.0), ("d2", 500.0)],
        [("d3", float(v)) for v in (1, 10, 100, 1000)],
    ]
    rows = []
    for i, b in enumerate(batches):
        spark.createDataFrame(b, "day string, value double").coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(f"{src_dir}/b{i}")
        rows += b
    return rows


def test_stream_sketch_equals_batch_sketch(spark):
    src = tempfile.mkdtemp(prefix="dd_src_")
    out = tempfile.mkdtemp(prefix="dd_out_")
    ckpt = tempfile.mkdtemp(prefix="dd_ckpt_")
    shutil.rmtree(out)
    try:
        rows = _write_batches(spark, src)
        stream = spark.readStream.schema("day string, value double").option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{src}/b*")
        stats: list = []
        q = streaming_ddsketch(
            stream, "day", "value", out, ckpt,
            query_name="test_stream_dd", stats=stats,
        )
        q.awaitTermination()

        # maintained bucket rows == one-shot batch sketch, row for row
        got = {
            (r.day, r.bucket): r.n
            for r in spark.read.parquet(out).collect()
        }
        batch = spark.createDataFrame(rows, "day string, value double")
        want = {
            (r.day, r.bucket): r.n
            for r in ddsketch_build(batch, ["day"], "value").collect()
        }
        assert got == want
        # read-time quantiles (per day and global) equal batch-side math
        got_q = {
            (r.day, r.q): r.est
            for r in read_ddsketch_quantiles(spark, out, ["day"], [0.5, 0.99]).collect()
        }
        want_q = {
            (r.day, r.q): r.est
            for r in ddsketch_quantiles(
                ddsketch_build(batch, ["day"], "value"), ["day"], [0.5, 0.99]
            ).collect()
        }
        assert got_q == want_q

        assert len(stats) == 3
        # batch 3 (d3 only, 4 distinct buckets) writes 4 rows, not the table
        assert stats[2]["partitions_touched"] == 1
        assert stats[2]["rows_written"] == 4
    finally:
        for qq in spark.streams.active:
            if qq.name == "test_stream_dd":
                qq.stop()
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)
