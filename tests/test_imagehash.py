"""dHash perceptual hashing: hand-checked bit semantics, exact-twin
and perturbed-copy recovery through the chunk blocking, brute-force
hamming parity, validation."""

from __future__ import annotations

import numpy as np
import pytest


def test_dhash_bit_semantics():
    from opentelemetry_collector_components_spark.operators.imagehash import (
        dhash_chunks,
    )

    # strictly increasing left->right: every left block avg < right -> 0
    inc = np.tile(np.arange(18, dtype=np.uint8) * 10, (16, 1))
    assert dhash_chunks(inc) == (0, 0, 0, 0)
    # strictly decreasing: every comparison fires -> all 64 bits set
    dec = inc[:, ::-1].copy()
    assert dhash_chunks(dec) == (0xFFFF,) * 4
    # deterministic on RGB via the integer 601 grayscale
    rgb = np.stack([inc, inc, inc], axis=2)
    assert dhash_chunks(rgb) == (0, 0, 0, 0)
    # tiny image (smaller than the 8x9 grid) still hashes
    tiny = np.array([[0, 255], [255, 0]], dtype=np.uint8)
    assert len(dhash_chunks(tiny)) == 4


def _brute_pairs(chunk_map: dict, k: int) -> set:
    ids = sorted(chunk_map)
    out = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d = sum(
                bin(a ^ b).count("1")
                for a, b in zip(chunk_map[ids[x]], chunk_map[ids[y]])
            )
            if d <= k:
                out.add((ids[x], ids[y], d))
    return out


def test_near_dup_blocking_matches_brute_force(spark):
    from opentelemetry_collector_components_spark.operators.imagehash import (
        dhash_chunks,
        image_near_dup_pairs,
    )

    rng_imgs = {}
    for i in range(30):
        base = ((i * 31 + 7 * np.arange(12)[:, None]
                 + 5 * np.arange(14)[None, :]) % 256).astype(np.uint8)
        rng_imgs[i] = base
    # exact twin of 0 and a 2-pixel retouch of 1
    rng_imgs[100] = rng_imgs[0].copy()
    pert = rng_imgs[1].copy().astype(np.int64)
    pert[0, 0] = (pert[0, 0] + 128) % 256
    pert[5, 7] = (pert[5, 7] + 128) % 256
    rng_imgs[101] = pert.astype(np.uint8)

    chunk_map = {i: dhash_chunks(im) for i, im in rng_imgs.items()}
    rows = [(i, *c) for i, c in chunk_map.items()]
    df = spark.createDataFrame(
        rows, "media_id long, d0 int, d1 int, d2 int, d3 int"
    ).repartition(5)
    got = {(r.id_a, r.id_b, r.hamming)
           for r in image_near_dup_pairs(df, max_hamming=3).collect()}
    want = _brute_pairs(chunk_map, 3)
    assert got == want
    assert (0, 100, 0) in got  # exact twin survives at distance 0

    with pytest.raises(ValueError):
        image_near_dup_pairs(df, max_hamming=4)


def test_image_dhash_end_to_end_bmp_png(spark):
    from opentelemetry_collector_components_spark.operators.imagehash import (
        dhash_chunks,
        image_dhash,
    )
    from opentelemetry_collector_components_spark.operators.multimodal import (
        _image_array,
        generate_png_media,
        generate_real_media,
    )

    # BMP path: decode(encode(img)) must hash identically to the array
    bmp = generate_real_media(spark, 30).where("mime = 'image/bmp'")
    got = {r.media_id: (r.d0, r.d1, r.d2, r.d3)
           for r in image_dhash(bmp).collect()}
    assert got  # ids 0,3,...,27
    for mid, chunks in got.items():
        assert chunks == dhash_chunks(_image_array(mid)), mid
    # PNG path decodes through zlib+filters to the same pixels
    png = generate_png_media(spark, 9)
    pg = {r.media_id: (r.d0, r.d1, r.d2, r.d3)
          for r in image_dhash(png).collect()}
    for mid, chunks in pg.items():
        nch = (1, 3, 4)[mid % 3]
        assert chunks == dhash_chunks(_image_array(mid, nch=nch)), mid


def test_video_frame_dhash_and_near_dup(spark):
    from pyspark.sql import functions as F
    from opentelemetry_collector_components_spark.operators.imagehash import (
        dhash_chunks,
        video_frame_dhash,
        video_near_dup_pairs,
    )
    from opentelemetry_collector_components_spark.operators.multimodal import (
        _video_array,
        generate_real_media,
    )

    vids = generate_real_media(spark, 30).where("mime = 'video/rawv'")
    fh = video_frame_dhash(vids)
    got = {(r.media_id, r.frame_idx): (r.d0, r.d1, r.d2, r.d3)
           for r in fh.collect()}
    assert got
    for (mid, fi), chunks in got.items():
        assert chunks == dhash_chunks(_video_array(mid)[fi]), (mid, fi)

    # planted exact twin must match on every aligned frame (ppm 1e6)
    u = fh.unionByName(fh.withColumn("media_id", F.col("media_id") + 100))
    pairs = {(r.id_a, r.id_b): r for r in
             video_near_dup_pairs(u, max_hamming=3,
                                  min_match_ppm=1_000_000).collect()}
    twin_ids = {mid for mid, _ in got}
    for mid in twin_ids:
        r = pairs[(mid, mid + 100)]
        assert r.matched_frames == r.total_frames
        assert r.match_ppm == 1_000_000

    import pytest as _pytest
    with _pytest.raises(ValueError):
        video_near_dup_pairs(fh, max_hamming=9)
    with _pytest.raises(ValueError):
        video_near_dup_pairs(fh, min_match_ppm=0)


def test_vectorized_frame_chunks_bit_exact():
    # r6: dhash_chunks_frames (reduceat + broadcast) must reproduce the
    # per-pixel reference on every shape class — tall/wide/tiny (grid
    # degradation), gray/1-channel/RGB
    import numpy as np

    from opentelemetry_collector_components_spark.operators.imagehash import (
        _dhash_chunks_tiny,
        dhash_chunks_frames,
    )

    rng = np.random.default_rng(7)
    for _ in range(40):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        f = int(rng.integers(1, 6))
        c = int(rng.choice([0, 1, 3]))
        shape = (f, h, w) if c == 0 else (f, h, w, c)
        stack = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = dhash_chunks_frames(stack)
        want = np.array([_dhash_chunks_tiny(stack[k]) for k in range(f)])
        assert (got == want).all(), shape
