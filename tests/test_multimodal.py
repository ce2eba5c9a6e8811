"""Multimodal plumbing: schemas, Arrow batch shape, deterministic stub."""

from opentelemetry_collector_components_spark.operators.multimodal import (
    decode_is_stubbed,
    extract_features,
    frame_sample_plan,
    generate_media,
    resize_stub,
)


def test_stub_is_declared():
    assert decode_is_stubbed()


def test_generate_and_extract(spark):
    media = generate_media(spark, 300)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 300
    assert all(len(r["feature"]) == 16 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["feature"])
    # deterministic: same id -> same feature across runs/partitionings
    again = {r["media_id"]: r["feature"] for r in extract_features(generate_media(spark, 300).repartition(7)).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["feature"]


def test_no_per_row_python(spark):
    plan = extract_features(generate_media(spark, 10))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan


def test_resize_dims(spark):
    out = resize_stub(generate_media(spark, 50), max_dim=100).collect()
    for r in out:
        assert max(r["target_w"], r["target_h"]) <= 100
        assert r["target_w"] >= 1 and r["target_h"] >= 1


def test_frame_sampling(spark):
    media = generate_media(spark, 30)
    frames = frame_sample_plan(media, every_ms=10000)
    rows = frames.collect()
    assert all(r["frame_ms"] % 10000 == 0 for r in rows)
    vids = media.filter("kind = 'video'").collect()
    expected = sum(r["duration_ms"] // 10000 + 1 for r in vids)
    assert len(rows) == expected
