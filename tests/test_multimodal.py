"""Multimodal plumbing: schemas, Arrow batch shape, deterministic stub."""

from opentelemetry_collector_components_spark.operators.multimodal import (
    decode_is_stubbed,
    extract_features,
    frame_sample_plan,
    generate_media,
    resize_stub,
)


def test_no_decode_stub_remains():
    """Every claimed decode path is real as of the MP4 container parser
    (frame decode of compressed bitstreams is documented out of scope,
    not faked)."""
    assert not decode_is_stubbed()


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


def test_png_round_trip_all_filters_and_color_types():
    import numpy as np

    from opentelemetry_collector_components_spark.functions.media_codec import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(7)
    for shape in [(8, 11, 3), (5, 7, 1), (16, 9, 4), (1, 1, 3), (6, 300, 3)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        for mode in ("none", "cycle"):  # cycle hits Sub/Up/Average/Paeth
            dec = decode_png(encode_png(img, mode))
            assert dec.shape == shape and np.array_equal(dec, img), (shape, mode)


def test_png_decodes_external_fixture():
    """A PNG produced by an INDEPENDENT encoder (the ubiquitous 1x1
    transparent-pixel data URI) must parse: validates signature, chunk
    walk, CRCs, IHDR fields, and zlib stream against real-world bytes."""
    import base64

    from opentelemetry_collector_components_spark.functions.media_codec import (
        decode_png,
    )

    b64 = (
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk"
        "YPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
    )
    img = decode_png(base64.b64decode(b64))
    assert img.shape == (1, 1, 4)


def test_png_rejects_corruption_and_unsupported():
    import numpy as np
    import pytest

    from opentelemetry_collector_components_spark.functions.media_codec import (
        decode_png,
        encode_png,
    )

    good = bytearray(encode_png(np.zeros((4, 4, 3), dtype=np.uint8)))
    bad = good.copy()
    bad[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC|unsupported"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JUNK" + bytes(good))


def test_png_in_media_features_pipeline(spark):
    """generate -> encode -> Arrow -> decode -> features over real PNG
    bytes, checked against the closed-form formula for a spot row."""
    import numpy as np

    from opentelemetry_collector_components_spark.operators.multimodal import (
        extract_media_features,
        generate_png_media,
    )

    feats = {
        r["media_id"]: r
        for r in extract_media_features(generate_png_media(spark, 9)).collect()
    }
    assert len(feats) == 9
    # id=4: RGB (4 % 3 == 1), h=12, w=12
    h, w = 8 + 4 % 5, 8 + 4 % 7
    r, c = np.ogrid[0:h, 0:w]
    assert feats[4]["width"] == w and feats[4]["height"] == h
    expect_g = float(((4 + 3 * r + 5 * c + 11) % 256).mean())
    assert abs(feats[4]["mean_g"] - expect_g) < 1e-9
    # id=0: gray -> channels replicate
    assert feats[0]["mean_r"] == feats[0]["mean_g"] == feats[0]["mean_b"]
    # id=2: RGBA -> alpha (ch=3) excluded from means
    expect_b2 = float(((2 + 3 * np.ogrid[0:10, 0:1][0] + 5 * np.ogrid[0:1, 0:10][1] + 22) % 256).mean())
    assert abs(feats[2]["mean_b"] - expect_b2) < 1e-9


def test_resize_media_handles_png(spark):
    import numpy as np

    from opentelemetry_collector_components_spark.functions.media_codec import (
        decode_png,
    )
    from opentelemetry_collector_components_spark.operators.multimodal import (
        generate_png_media,
        resize_media,
    )

    big = generate_png_media(spark, 3)  # 8..12 px — resize with max_dim=6
    out = {r["media_id"]: r for r in resize_media(big, max_dim=6).collect()}
    for mid, r in out.items():
        img = decode_png(bytes(r["payload"]))
        assert max(img.shape[:2]) <= 6
        assert (r["height"], r["width"]) == img.shape[:2]


def test_jpeg_round_trip_bounded_error():
    """Baseline JPEG at quant=1: entropy round trip with only DCT float
    noise — max per-sample error <= 2 over random and gradient images."""
    import numpy as np

    from opentelemetry_collector_components_spark.functions.media_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(3)
    for shape in [(8, 8, 3), (16, 24, 3), (13, 9, 3), (10, 10)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img))
        want = img if img.ndim == 3 else img[:, :, None]
        assert dec.shape == want.shape
        assert np.abs(dec.astype(int) - want.astype(int)).max() <= 2
    # lossy knob: coarser quantization still decodes, larger error allowed
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quant=16))
    assert dec.shape == (16, 16, 3)


def test_jpeg_rejections():
    import numpy as np
    import pytest

    from opentelemetry_collector_components_spark.functions.media_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"nope")
    good = bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    # flip SOF0 marker to SOF2 (progressive) -> clean rejection
    i = bytes(good).find(b"\xff\xc0")
    bad = good.copy()
    bad[i + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(bad))


def test_jpeg_in_media_features_pipeline(spark):
    """generate -> encode -> Arrow -> entropy-decode -> features over real
    JPEG bytes; channel means within the documented 0.15 bound of the
    closed-form formula; gray replicates channels."""
    import numpy as np

    from opentelemetry_collector_components_spark.operators.multimodal import (
        _image_array,
        extract_media_features,
        generate_jpeg_media,
    )

    feats = {
        r["media_id"]: r
        for r in extract_media_features(generate_jpeg_media(spark, 12)).collect()
    }
    assert len(feats) == 12
    for mid, r in feats.items():
        img = _image_array(mid, nch=(1, 3)[mid % 2]).astype(float)
        h, w = img.shape[:2]
        assert (r["height"], r["width"]) == (h, w)
        want = img.mean(axis=(0, 1))
        if len(want) == 1:
            want = np.repeat(want, 3)
        got = np.array([r["mean_r"], r["mean_g"], r["mean_b"]])
        assert np.abs(got - want).max() < 0.15, mid
