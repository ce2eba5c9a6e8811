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


# ---------------------------------------------------------------------------
# Real decode path (BMP / WAV / RAWV pure-numpy codecs)
# ---------------------------------------------------------------------------


def test_bmp_round_trip_with_row_padding():
    import numpy as np

    from opentelemetry_collector_components_spark.functions.media_codec import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    for w in (5, 8, 13):  # 5/13 force non-trivial 4-byte row padding
        img = rng.integers(0, 256, size=(6, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_wav_round_trip_mono_and_stereo():
    import numpy as np

    from opentelemetry_collector_components_spark.functions.media_codec import (
        decode_wav,
        encode_wav,
    )

    mono = (np.arange(101, dtype=np.int16) * 321) % 4096 - 2048
    s, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and np.array_equal(s, mono)
    stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
    s2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and s2.shape == (101, 2) and np.array_equal(s2, stereo)


def test_rawv_round_trip_and_resize():
    import numpy as np

    from opentelemetry_collector_components_spark.functions.media_codec import (
        decode_rawv,
        encode_rawv,
        resize_nearest,
    )

    frames = np.arange(4 * 6 * 8 * 3, dtype=np.uint8).reshape(4, 6, 8, 3)
    out, fps = decode_rawv(encode_rawv(frames, fps=25))
    assert fps == 25 and np.array_equal(out, frames)
    small = resize_nearest(frames[0], 4, 3)
    assert small.shape == (3, 4, 3)
    # nearest-neighbor: pixel (0,0) maps to source (0,0)
    assert np.array_equal(small[0, 0], frames[0, 0, 0])


def test_real_media_pipeline(spark):
    from opentelemetry_collector_components_spark.operators.multimodal import (
        extract_media_features,
        generate_real_media,
        resize_media,
        sample_frames,
    )

    media = generate_real_media(spark, 30)
    feats = {r.media_id: r for r in extract_media_features(media).collect()}
    assert len(feats) == 30
    assert feats[0].kind == "image" and feats[0].width == 8 and feats[0].mean_r > 0
    assert feats[1].kind == "audio" and feats[1].n_samples == 101
    assert feats[2].kind == "video" and feats[2].n_frames == 4  # 2 + 2%3
    # resize: max_dim below every width/height shrinks all images
    resized = resize_media(media, max_dim=4).filter("kind = 'image'")
    dims = resized.select("width", "height").distinct().collect()
    assert all(r.width <= 4 and r.height <= 4 for r in dims)
    # frame sampling emits ceil(F/2) rows per video
    n_frames = sum(2 + i % 3 for i in range(30) if i % 3 == 2)
    got = sample_frames(media, every_n=2).count()
    expect = sum((2 + i % 3 + 1) // 2 for i in range(30) if i % 3 == 2)
    assert got == expect
