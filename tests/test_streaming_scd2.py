"""Streaming SCD2: cross-batch version close, heartbeat compaction,
NULL-attribute faithfulness, stream == batch on the fixture, and the
out-of-order raise."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.queries import _run_stream_gate
from opentelemetry_collector_components_spark.streaming.scd2 import scd2_stream

SCHEMA = "entity_id string, ts timestamp, plan string"


def _write_batches(spark, tmpdir, batches, schema=SCHEMA):
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{tmpdir}/b{i}", mode="overwrite"
        )
    return f"{tmpdir}/b*"


def _drain(spark, tmp_path, batches, schema=SCHEMA, **kw):
    glob = _write_batches(spark, str(tmp_path), batches, schema)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
    )
    out = scd2_stream(stream, ["entity_id"], ts_col="ts", **kw)
    return _run_stream_gate(spark, out, "scd2_stream_test", mode="append")


def test_version_opens_and_closes_across_batches(spark, tmp_path):
    t = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
    batches = [
        [("u1", t(0), "a")],
        [("u1", t(1), "a")],  # heartbeat re-emit: compacts away
        [("u1", t(2), "b")],  # closes version 1 exactly once
    ]
    rows = _drain(spark, tmp_path, batches).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.entity_id, r.plan, r.version) == ("u1", "a", 1)
    assert (str(r.valid_from), str(r.valid_to)) == (
        "2024-01-01 00:00:00", "2024-01-01 02:00:00",
    )


def test_null_attribute_is_faithful_state(spark, tmp_path):
    t = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
    batches = [
        [("u1", t(0), None), ("u1", t(1), None)],  # NULL -> NULL: compact
        [("u1", t(2), "x")],  # NULL -> x: close version 1
    ]
    rows = _drain(spark, tmp_path, batches).collect()
    assert len(rows) == 1 and rows[0].plan is None and rows[0].version == 1


def test_stream_equals_batch_closed_versions(spark):
    import tempfile

    from opentelemetry_collector_components_spark.operators.asof import (
        scd2_from_changes,
    )
    from opentelemetry_collector_components_spark.sources.dims import (
        generate_change_log,
    )

    log = generate_change_log(spark, 1500)
    batch = (
        scd2_from_changes(log, ["entity_id"], ts_col="ts")
        .where("valid_to IS NOT NULL")
        .select("entity_id", "plan", "region", "valid_from", "valid_to", "version")
    )
    d = tempfile.mkdtemp(prefix="scd2_eq_")
    log.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(log.schema).parquet(d)
    got = _run_stream_gate(
        spark,
        scd2_stream(stream, ["entity_id"], ts_col="ts"),
        "scd2_stream_eq",
        mode="append",
    ).select("entity_id", "plan", "region", "valid_from", "valid_to", "version")
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_out_of_order_across_batches_raises(spark, tmp_path):
    t = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
    batches = [
        [("u1", t(5), "a")],
        [("u1", t(1), "b")],  # regressed vs the open version
    ]
    with pytest.raises(Exception, match="out-of-order|StreamingQuery"):
        _drain(spark, tmp_path, batches)
