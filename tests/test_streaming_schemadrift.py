"""Streaming schema-drift maintenance: multi-batch count merge equals
the batch profile, per-batch sink cost bounded by touched days, novelty
flags derived correctly from the maintained grid."""

from __future__ import annotations

import shutil
import tempfile

from opentelemetry_collector_components_spark.operators.jsonprofile import (
    json_schema_profile,
    schema_novelty,
)
from opentelemetry_collector_components_spark.streaming.schemadrift import (
    read_schema_drift,
    streaming_schema_profile,
)


def _write_batches(spark, src_dir):
    batches = [
        [(1, '{"a": 1}'), (1, '{"a": 2, "o": {"v": 3}}')],
        [(1, '{"a": 4}'), (2, '{"a": 5, "b": [1]}')],   # day 1 spans batches
        [(3, '{"b": [2]}')],                            # b seen on day 2 first
    ]
    rows = []
    for i, b in enumerate(batches):
        spark.createDataFrame(b, "day long, js string").coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(f"{src_dir}/b{i}")
        rows += b
    return rows


def test_stream_equals_batch_and_bounded_writes(spark):
    src = tempfile.mkdtemp(prefix="schema_src_")
    out = tempfile.mkdtemp(prefix="schema_out_")
    ckpt = tempfile.mkdtemp(prefix="schema_ckpt_")
    shutil.rmtree(out)
    try:
        rows = _write_batches(spark, src)
        stream = spark.readStream.schema("day long, js string").option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{src}/b*")
        stats: list = []
        q = streaming_schema_profile(
            stream, "js", "day", out, ckpt,
            query_name="test_stream_schema", stats=stats,
        )
        q.awaitTermination()

        got = {
            (r.day, r.path, r.jtype): (r.n, r.is_new)
            for r in read_schema_drift(spark, out, "day").collect()
        }
        batch = spark.createDataFrame(rows, "day long, js string")
        want = {
            (r.day, r.path, r.jtype): (r.n, r.is_new)
            for r in schema_novelty(
                json_schema_profile(batch, "js", group_cols=["day"]), "day"
            ).collect()
        }
        assert got == want
        # cross-batch merge: day 1's 'a' count must be 3 (2 + 1), flagged new
        assert got[(1, "a", "scalar")] == (3, True)
        # 'b' first appears on day 2 -> new there, not on day 3
        assert got[(2, "b", "array")] == (1, True)
        assert got[(3, "b", "array")] == (1, False)

        assert len(stats) == 3
        # batch 3 touches only day 3: writes day-3 grid rows, not the table
        assert stats[2]["partitions_touched"] == 1
        assert all(s["partitions_touched"] <= 2 for s in stats)
    finally:
        for q in spark.streams.active:
            if q.name == "test_stream_schema":
                q.stop()
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)
