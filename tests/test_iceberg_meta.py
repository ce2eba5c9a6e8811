"""Iceberg snapshot resolution over the pure-Python avro codec."""

import pytest

from opentelemetry_collector_components_spark.sources.iceberg_meta import (
    generate_iceberg_table,
    resolve_iceberg_snapshot,
)


def test_resolution_live_set(spark):
    from opentelemetry_collector_components_spark.queries import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    metadata, blobs = generate_iceberg_table(ev, n_files=40)
    live = resolve_iceberg_snapshot(metadata, blobs).cache()
    # i in 0..39: 8 multiples of 5 deleted+merged, 32 originals live
    parts = live.where(live.file_path.startswith("data/part-")).count()
    merged = live.where(live.file_path.startswith("data/merged-")).count()
    assert parts == 32 and merged == 8
    assert live.where(live.status == 2).count() == 0
    total = live.groupBy().sum("record_count").first()[0]
    assert total == ev.count()
    # formats + manifest provenance survive
    assert live.where(live.file_format != "PARQUET").count() == 0
    assert live.select("manifest_path").distinct().count() == 4
    live.unpersist()


def test_snapshot_1_time_travel(spark):
    from opentelemetry_collector_components_spark.queries import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    metadata, blobs = generate_iceberg_table(ev, n_files=40)
    live = resolve_iceberg_snapshot(metadata, blobs, snapshot_id=1).cache()
    # before the compaction: every original lives, no replacements yet
    assert live.where(live.file_path.startswith("data/part-")).count() == 40
    assert live.where(live.file_path.startswith("data/merged-")).count() == 0
    assert live.groupBy().sum("record_count").first()[0] == ev.count()
    live.unpersist()


def test_unknown_snapshot_raises(spark):
    from opentelemetry_collector_components_spark.queries import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    metadata, blobs = generate_iceberg_table(ev, n_files=10)
    with pytest.raises(ValueError):
        resolve_iceberg_snapshot(metadata, blobs, snapshot_id=99)


def test_missing_manifest_list_raises(spark):
    from opentelemetry_collector_components_spark.queries import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    metadata, blobs = generate_iceberg_table(ev, n_files=10)
    truncated = blobs.where(blobs.path != "meta/ml-2.avro")
    with pytest.raises(ValueError, match="not found in store"):
        resolve_iceberg_snapshot(metadata, truncated)
