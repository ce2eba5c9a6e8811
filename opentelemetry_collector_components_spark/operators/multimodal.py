"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Two decode paths:

- REAL (``generate_real_media`` / ``extract_media_features`` /
  ``resize_media`` / ``sample_frames``): BMP images, WAV PCM audio, and
  RAWV raw-frame video are encoded AND decoded with the pure-numpy codecs
  in ``functions/media_codec.py`` — actual bytes, actual parsing, gated by
  an oracle that recomputes features from closed-form formulas.
- REAL (``generate_mp4_media`` / ``parse_mp4_media``): MP4 containers are
  written and parsed with the pure-Python ISO-BMFF codec in
  ``functions/mp4_codec.py`` — real box trees, real stsc/stsz/stco sample
  resolution, real mdat slices.  Frame decode of the compressed video
  bitstream (H.264/HEVC) is out of scope (needs ffmpeg/hardware), which is
  a codec concern, not a container one.  PNG decodes for real via stdlib
  zlib + filter reconstruction, and baseline JPEG via the pure-Python
  huffman+IDCT codec (media_codec.py).
- ``_payload_projection`` (legacy featurizer): a deterministic 16-dim byte
  projection used by ``extract_features`` — a real function of the real
  payload bytes, not a decode, kept for the original plumbing gate.

Scale notes: media rows are large (MBs) — ``mapInPandas`` with a small
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds executor memory;
feature extraction emits small fixed-width rows, so the output shuffle is
cheap regardless of input size.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),    # opaque bytes
        StructField("width", IntegerType()),     # typed metadata
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),  # 16-dim embedding stub
    ]
)


def generate_media(spark, n_rows: int) -> DataFrame:
    """Deterministic fake media table: payload bytes are a pure function of
    the id (so tests are stable); kinds cycle image/audio/video."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.concat(F.lit("MEDIA:"), F.col("id"), F.repeat(F.lit("x"), (F.pmod(F.col("id"), F.lit(64)) * 16).cast("int")))
    return spark.range(n_rows).select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(kind, F.lit("/fake")).alias("mime"),
        payload.cast("binary").alias("payload"),
        (F.lit(64) + F.pmod(F.col("id"), F.lit(256))).cast("int").alias("width"),
        (F.lit(64) + F.pmod(F.col("id") * 3, F.lit(256))).cast("int").alias("height"),
        (F.pmod(F.col("id"), F.lit(60000))).alias("duration_ms"),
    )


def _payload_projection(payload: bytes) -> np.ndarray:
    """Deterministic 16-dim byte projection — a cheap content featurizer
    over the raw payload (NOT a format decode; the real decoders live in
    ``functions/media_codec.py`` and ``functions/mp4_codec.py``).  Kept for
    the original plumbing gate: large binary in, small vector out."""
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float32)
    return arr.reshape(4, 16).mean(axis=0) / 255.0


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: large binary in, small vector out."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _payload_projection(p if p is not None else b"").tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    pruned = media.select("media_id", "kind", "payload")
    return pruned.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, max_dim: int = 224) -> DataFrame:
    """Resize plumbing: computes target dims JVM-side; byte transform is the
    stub (identity) — a real impl swaps `_resize_payload` only."""
    scale = F.least(
        F.lit(max_dim) / F.col("width"), F.lit(max_dim) / F.col("height"), F.lit(1.0)
    )
    return media.withColumn("target_w", (F.col("width") * scale).cast("int")).withColumn(
        "target_h", (F.col("height") * scale).cast("int")
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled frame offset —
    the explode happens JVM-side; actual frame decode is the stubbed step."""
    frames = F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ms"))
    )


def decode_is_stubbed() -> bool:
    """Marker for callers/tests: every format this package claims to decode
    has a real parser — JPEG/PNG/BMP/WAV/RAWV via ``media_codec`` and MP4
    containers via ``mp4_codec`` (sample tables, offsets, mdat slices).
    Compressed-video *frame* decode is documented out of scope (needs
    ffmpeg), not stubbed behind a fake."""
    return False


# ---------------------------------------------------------------------------
# REAL decode path: formats decodable with stdlib + numpy (no PIL/ffmpeg
# needed): BMP images, WAV PCM audio, RAWV raw-frame video.  The stub path
# above stays for the legacy gate; these functions are the production-shaped
# encode -> Arrow batch -> decode -> features loop over real bytes.
# ---------------------------------------------------------------------------

REAL_MEDIA_FORMATS = {"image/jpeg", "image/png", "image/bmp", "audio/wav", "video/rawv"}

REAL_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),        # image/video
        StructField("height", LongType()),
        StructField("n_frames", LongType()),     # video
        StructField("sample_rate", LongType()),  # audio
        StructField("n_samples", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("rms", DoubleType()),
    ]
)


def _image_array(mid: int, nch: int = 3) -> np.ndarray:
    """Closed-form test image: pixel(r,c,ch) = (id + 3r + 5c + 11ch) % 256.
    The formula is SQL-restatable, which is what lets the oracle gate verify
    the full encode->decode round trip without ever seeing bytes.  ``nch``
    selects gray (1) / RGB (3) / RGBA (4) — ONE formula for every gate so
    the generators can never drift apart."""
    h, w = 8 + mid % 5, 8 + mid % 7
    r, c, ch = np.ogrid[0:h, 0:w, 0:nch]
    return ((mid + 3 * r + 5 * c + 11 * ch) % 256).astype(np.uint8)


def _audio_array(mid: int) -> tuple[np.ndarray, int]:
    n, rate = 100 + mid % 50, 8000 + (mid % 3) * 4000
    i = np.arange(n)
    return ((mid * 7 + 13 * i) % 256 - 128).astype(np.int16), rate


def _video_array(mid: int) -> np.ndarray:
    f = 2 + mid % 3
    base = _image_array(mid).astype(np.int64)
    frames = (base[None] + 17 * np.arange(f)[:, None, None, None]) % 256
    return frames.astype(np.uint8)


def generate_real_media(spark, n_rows: int) -> DataFrame:
    """Deterministic media table with REAL encoded payloads (BMP/WAV/RAWV),
    one kind per id % 3.  mapInPandas so the byte encoding runs Arrow-
    batched on executors (synthetic-source analog of a real media scan)."""
    from ..functions.media_codec import encode_bmp, encode_rawv, encode_wav

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                k = mid % 3
                if k == 0:
                    img = _image_array(mid)
                    h, w = img.shape[:2]
                    rows.append((mid, "image", "image/bmp", encode_bmp(img), w, h, 0))
                elif k == 1:
                    s, rate = _audio_array(mid)
                    dur = len(s) * 1000 // rate
                    rows.append((mid, "audio", "audio/wav", encode_wav(s, rate), None, None, dur))
                else:
                    frames = _video_array(mid)
                    f, h, w = frames.shape[:3]
                    rows.append((mid, "video", "video/rawv", encode_rawv(frames, 10), w, h, f * 1000 // 10))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "mime", "payload", "width", "height", "duration_ms"]
            )

    return spark.range(n_rows).mapInPandas(_gen, schema=MEDIA_SCHEMA)


def generate_png_media(spark, n_rows: int) -> DataFrame:
    """Deterministic PNG table: pixel(r,c,ch) = (id + 3r + 5c + 11ch) % 256
    (the same SQL-restatable formula as ``_image_array``), color type
    cycling gray/RGB/RGBA by id % 3, encoder rotating through all five
    scanline filters — so the oracle gate exercises every reconstruction
    path in the decoder against closed-form expected features."""
    from ..functions.media_codec import encode_png

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                img = _image_array(mid, nch=(1, 3, 4)[mid % 3])
                h, w = img.shape[:2]
                rows.append(
                    (mid, "image", "image/png", encode_png(img, "cycle"), w, h, 0)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "mime", "payload", "width", "height", "duration_ms"],
            )

    return spark.range(n_rows).mapInPandas(_gen, schema=MEDIA_SCHEMA)


def generate_jpeg_media(spark, n_rows: int) -> DataFrame:
    """Deterministic baseline-JPEG table: the same closed-form pixel
    formula as the PNG/BMP generators, gray/RGB alternating by id % 2,
    encoded at quant=1 (near-lossless: only DCT float noise, <= 2/255
    per sample) — so dims are oracle-exact and channel means are
    test-pinned within the reconstruction bound."""
    from ..functions.media_codec import encode_jpeg

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                img = _image_array(mid, nch=(1, 3)[mid % 2])
                h, w = img.shape[:2]
                payload = encode_jpeg(img[:, :, 0] if img.shape[2] == 1 else img)
                rows.append((mid, "image", "image/jpeg", payload, w, h, 0))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "mime", "payload", "width", "height", "duration_ms"],
            )

    return spark.range(n_rows).mapInPandas(_gen, schema=MEDIA_SCHEMA)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Real decode + feature extraction, dispatched on mime:

    - image/jpeg: real huffman+IDCT baseline decode -> channel means
                  (gray replicates; lossy: means carry <=0.15 DCT noise)
    - image/png:  real zlib + filter-reconstruction decode -> channel means
                  (gray replicates to r=g=b; alpha ignored) + dims
    - image/bmp:  decode -> per-channel means + dims
    - audio/wav:  decode -> sample count / rate / RMS
    - video/rawv: decode -> frame count / dims + frame-0 channel means

    Large binary in, small fixed-width row out (the multimodal scan shape:
    cap ``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are
    MBs so an Arrow batch fits executor memory)."""
    from ..functions.media_codec import (
        decode_bmp,
        decode_jpeg,
        decode_png,
        decode_rawv,
        decode_wav,
    )

    cols = [f.name for f in REAL_FEATURE_SCHEMA.fields]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, mime, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["mime"], pdf["payload"]
            ):
                base = {c: None for c in cols}
                base["media_id"], base["kind"] = int(mid), kind
                base["n_bytes"] = len(payload)
                if mime == "image/jpeg":
                    img = decode_jpeg(payload).astype(np.float64)
                    base["height"], base["width"] = img.shape[:2]
                    m = img.mean(axis=(0, 1))
                    if len(m) == 1:  # gray -> replicate
                        m = np.repeat(m, 3)
                    base["mean_r"], base["mean_g"], base["mean_b"] = (
                        float(v) for v in m
                    )
                elif mime == "image/png":
                    img = decode_png(payload).astype(np.float64)
                    base["height"], base["width"] = img.shape[:2]
                    m = img[:, :, :3].mean(axis=(0, 1))  # drop alpha
                    if len(m) == 1:  # gray -> replicate
                        m = np.repeat(m, 3)
                    base["mean_r"], base["mean_g"], base["mean_b"] = (
                        float(v) for v in m
                    )
                elif mime == "image/bmp":
                    img = decode_bmp(payload).astype(np.float64)
                    base["height"], base["width"] = img.shape[:2]
                    m = img.mean(axis=(0, 1))
                    base["mean_r"], base["mean_g"], base["mean_b"] = (
                        float(v) for v in m
                    )
                elif mime == "audio/wav":
                    s, rate = decode_wav(payload)
                    base["sample_rate"], base["n_samples"] = rate, len(s)
                    base["rms"] = float(
                        np.sqrt(np.mean(s.astype(np.float64) ** 2))
                    )
                elif mime == "video/rawv":
                    frames, _fps = decode_rawv(payload)
                    base["n_frames"] = frames.shape[0]
                    base["height"], base["width"] = frames.shape[1:3]
                    m = frames[0].astype(np.float64).mean(axis=(0, 1))
                    base["mean_r"], base["mean_g"], base["mean_b"] = (
                        float(v) for v in m
                    )
                else:
                    raise ValueError(f"no decoder for {mime}")
                rows.append([base[c] for c in cols])
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "kind", "mime", "payload").mapInPandas(
        _extract, schema=REAL_FEATURE_SCHEMA
    )


def resize_media(media: DataFrame, max_dim: int = 224) -> DataFrame:
    """Real image resize: decode (BMP, PNG, or baseline JPEG) ->
    nearest-neighbor downscale so the longest side is <= max_dim ->
    re-encode in the same format.  Non-image rows pass through
    unchanged."""
    from ..functions.media_codec import (
        decode_bmp,
        decode_jpeg,
        decode_png,
        encode_bmp,
        encode_jpeg,
        encode_png,
        resize_nearest,
    )

    codecs = {
        "image/bmp": (decode_bmp, encode_bmp),
        "image/png": (decode_png, encode_png),
        "image/jpeg": (decode_jpeg, encode_jpeg),
    }

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            for i, (mime, payload) in enumerate(zip(pdf["mime"], pdf["payload"])):
                if mime not in codecs:
                    continue
                decode, encode = codecs[mime]
                img = decode(payload)
                h, w = img.shape[:2]
                scale = min(max_dim / w, max_dim / h, 1.0)
                tw, th = max(int(w * scale), 1), max(int(h * scale), 1)
                if (tw, th) != (w, h):
                    resized = resize_nearest(img, tw, th)
                    out.iloc[i, out.columns.get_loc("payload")] = encode(resized)
                    out.iloc[i, out.columns.get_loc("width")] = tw
                    out.iloc[i, out.columns.get_loc("height")] = th
            yield out

    return media.mapInPandas(_resize, schema=media.schema)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Real video frame sampling: decode RAWV, keep every ``every_n``-th
    frame, emit one row per kept frame with its per-frame channel means."""
    from ..functions.media_codec import decode_rawv

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("frame_ms", LongType()),
            StructField("mean_r", DoubleType()),
            StructField("mean_g", DoubleType()),
            StructField("mean_b", DoubleType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, fps = decode_rawv(payload)
                for idx in range(0, frames.shape[0], every_n):
                    m = frames[idx].astype(np.float64).mean(axis=(0, 1))
                    rows.append(
                        [int(mid), idx, idx * 1000 // fps] + [float(v) for v in m]
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ms", "mean_r", "mean_g", "mean_b"]
            )

    return (
        media.filter(F.col("mime") == "video/rawv")
        .select("media_id", "payload")
        .mapInPandas(_sample, schema=schema)
    )


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF: real container write + parse (functions/mp4_codec.py).
# Closed-form track parameters so the oracle can recompute every parsed
# field (dims, durations, chunk counts, byte sums) from SQL alone.
# ---------------------------------------------------------------------------

MP4_PARSE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("track_id", LongType()),
        StructField("handler", StringType()),
        StructField("codec", StringType()),
        StructField("brand", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("timescale", LongType()),
        StructField("duration", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_chunks", LongType()),
        StructField("total_bytes", LongType()),
        StructField("byte_sum", LongType()),
    ]
)


def _mp4_track_params(mid: int) -> list[dict]:
    """Closed-form ISO-BMFF track layout for test/gate media ``mid``.

    Video (always): n = 5+mid%7 samples of delta 20+mid%10 at timescale
    600*(1+mid%2); sample i is (50+(mid+7i)%40) bytes, every byte equal to
    (mid+i)%256; 2 samples per chunk.  Audio (odd ids): n = 8+mid%5
    constant-size samples (20+mid%10 bytes of (3*mid+i)%256) at the sample
    rate's own timescale, 3 per chunk.  Each formula is restated verbatim
    in the ``multimodal_mp4_parse`` oracle SQL."""
    n_v = 5 + mid % 7
    tracks = [
        {
            "handler": "vide",
            "codec": ("avc1", "hvc1", "mp4v")[mid % 3],
            "width": 16 * (4 + mid % 5),
            "height": 16 * (3 + mid % 4),
            "timescale": 600 * (1 + mid % 2),
            "sample_delta": 20 + mid % 10,
            "sample_sizes": [50 + (mid + 7 * i) % 40 for i in range(n_v)],
            "samples_per_chunk": 2,
            "sample_data": [
                bytes([(mid + i) % 256]) * (50 + (mid + 7 * i) % 40)
                for i in range(n_v)
            ],
        }
    ]
    if mid % 2 == 1:
        n_a = 8 + mid % 5
        size_a = 20 + mid % 10
        rate = 8000 + (mid % 3) * 4000
        tracks.append(
            {
                "handler": "soun",
                "codec": "mp4a",
                "sample_rate": rate,
                "timescale": rate,
                "sample_delta": 1024,
                "sample_sizes": [size_a] * n_a,
                "samples_per_chunk": 3,
                "sample_data": [
                    bytes([(3 * mid + i) % 256]) * size_a for i in range(n_a)
                ],
            }
        )
    return tracks


def generate_mp4_media(spark, n_rows: int) -> DataFrame:
    """Deterministic MP4 table: each payload is a real ISO-BMFF file
    (ftyp + mdat + full moov sample tables) written by ``encode_mp4`` from
    the closed-form ``_mp4_track_params`` layout.  Odd ids carry a second
    (audio) track so the parser's multi-trak path is always exercised."""
    from ..functions.mp4_codec import encode_mp4

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                tracks = _mp4_track_params(mid)
                v = tracks[0]
                dur_ms = (
                    len(v["sample_sizes"]) * v["sample_delta"] * 1000
                    // v["timescale"]
                )
                rows.append(
                    (
                        mid, "video", "video/mp4", encode_mp4(tracks),
                        v["width"], v["height"], dur_ms,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "mime", "payload", "width", "height", "duration_ms"],
            )

    return spark.range(n_rows).mapInPandas(_gen, schema=MEDIA_SCHEMA)


def parse_mp4_media(media: DataFrame) -> DataFrame:
    """Real MP4 container parse: one output row per track with the metadata
    a media-scan stage needs (codec id, dims, timescale/duration, sample
    and chunk counts) plus two integrity sums computed from the *resolved
    samples themselves* — ``total_bytes`` (stsz sum) and ``byte_sum`` (sum
    over every payload byte sliced out of mdat via stsc/stco offsets), so
    a wrong offset or size anywhere in the sample-table walk breaks the
    oracle hash.  Large binary in, small fixed-width rows out."""
    from ..functions.mp4_codec import extract_samples, parse_mp4

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                parsed = parse_mp4(payload)
                for t in parsed["tracks"]:
                    samples = extract_samples(payload, t)
                    rows.append(
                        (
                            int(mid), t["track_id"], t["handler"], t["codec"],
                            parsed["major_brand"], t["width"], t["height"],
                            t["timescale"], t["duration"], t["sample_rate"],
                            t["n_samples"], t["n_chunks"],
                            sum(t["sample_sizes"]),
                            sum(sum(s) for s in samples),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MP4_PARSE_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        _parse, schema=MP4_PARSE_SCHEMA
    )
