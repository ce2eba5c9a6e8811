"""Pure-Python/numpy media codecs: BMP images, WAV PCM audio, RAWV video.

No PIL/ffmpeg exists in this environment, so the multimodal decode path is
made REAL for the formats decodable with the standard library + numpy:

- BMP:  uncompressed 24-bit BITMAPINFOHEADER (the classic Windows DIB
        layout: BGR pixel order, rows bottom-up, 4-byte row padding).
- WAV:  RIFF/WAVE with a single PCM ``fmt `` + ``data`` chunk, 16-bit
        mono/stereo little-endian samples.
- RAWV: a minimal raw-frame video container (magic ``RAWV`` + width,
        height, fps, n_frames header, then concatenated RGB24 frames) —
        the uncompressed analog of what ffmpeg's rawvideo demuxer reads.

Encoders exist so tests and gates can build real byte payloads
deterministically; decoders are the production path.  Everything is
vectorized numpy per payload — these run inside Arrow-batched
``mapInPandas``, never per-row Python in the JVM plan.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BMP bytes (BGR, bottom-up, padded)."""
    h, w, _ = rgb.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BMP bytes -> (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    size, w, h, _planes, bpp = struct.unpack_from("<IiiHH", payload, 14)
    if size < 40 or bpp != 24:
        raise ValueError(f"unsupported BMP: header={size} bpp={bpp}")
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * abs(h), offset=offset)
    rows = rows.reshape(abs(h), row_size)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR -> RGB


# ---------------------------------------------------------------------------
# WAV (PCM 16-bit)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(N,) or (N, C) int16 -> RIFF/WAVE PCM bytes."""
    s = np.asarray(samples, dtype="<i2")
    channels = 1 if s.ndim == 1 else s.shape[1]
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> ((N,) or (N, C) int16 samples, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, channels, rate, data = 12, 1, 0, b""
    while pos + 8 <= len(payload):
        cid, clen = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        chunk = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", chunk, 0)
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV codec {audio_fmt}")
        elif cid == b"data":
            data = chunk
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    s = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        s = s.reshape(-1, channels)
    return s, rate


# ---------------------------------------------------------------------------
# RAWV (raw-frame video container)
# ---------------------------------------------------------------------------

_RAWV_HDR = "<4sHHHH"  # magic, width, height, fps, n_frames


def encode_rawv(frames: np.ndarray, fps: int = 10) -> bytes:
    """(F, H, W, 3) uint8 RGB frames -> RAWV bytes."""
    f, h, w, _ = frames.shape
    return struct.pack(_RAWV_HDR, b"RAWV", w, h, fps, f) + np.ascontiguousarray(
        frames, dtype=np.uint8
    ).tobytes()


def decode_rawv(payload: bytes) -> tuple[np.ndarray, int]:
    """RAWV bytes -> ((F, H, W, 3) uint8 frames, fps)."""
    magic, w, h, fps, f = struct.unpack_from(_RAWV_HDR, payload, 0)
    if magic != b"RAWV":
        raise ValueError("not a RAWV payload")
    size = struct.calcsize(_RAWV_HDR)
    frames = np.frombuffer(payload, dtype=np.uint8, count=f * h * w * 3, offset=size)
    return frames.reshape(f, h, w, 3), fps


# ---------------------------------------------------------------------------
# Transforms over decoded arrays
# ---------------------------------------------------------------------------


def resize_nearest(rgb: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W, 3) via integer index maps."""
    h, w, _ = rgb.shape
    rows = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    cols = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return rgb[rows][:, cols]
