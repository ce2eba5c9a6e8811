"""Pure-Python/numpy media codecs: PNG + BMP images, WAV PCM audio, RAWV video.

No PIL/ffmpeg exists in this environment, so the multimodal decode path is
made REAL for the formats decodable with the standard library + numpy:

- PNG:  the real compressed format (RFC 2083): zlib-inflated IDAT,
        per-scanline filter reconstruction (None/Sub/Up/Average/Paeth),
        8-bit gray/RGB/RGBA, CRC-verified chunks.  This is the most common
        web-corpus image format and needs no PIL — just stdlib zlib.
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
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG (8-bit gray / RGB / RGBA, non-interlaced) — RFC 2083
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_filter_row(ftype: int, raw: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Forward filter (encoder side): recon row -> filtered bytes.

    ``raw``/``prev`` are the RECONSTRUCTED current/previous scanlines; the
    filter subtracts the per-byte predictor, mod 256."""
    left = np.zeros_like(raw)
    left[bpp:] = raw[:-bpp]
    up_left = np.zeros_like(raw)
    up_left[bpp:] = prev[:-bpp]
    if ftype == 0:
        return raw.copy()
    if ftype == 1:
        return raw - left
    if ftype == 2:
        return raw - prev
    if ftype == 3:
        return raw - ((left.astype(np.uint16) + prev) // 2).astype(np.uint8)
    if ftype == 4:
        return raw - _paeth(left, prev, up_left)
    raise ValueError(f"bad PNG filter {ftype}")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (a=left, b=up, c=up-left)."""
    ai, bi, ci = (x.astype(np.int16) for x in (a, b, c))
    p = ai + bi - ci
    pa, pb, pc = np.abs(p - ai), np.abs(p - bi), np.abs(p - ci)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(img: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """(H, W) or (H, W, C in {1,3,4}) uint8 -> PNG bytes.

    ``filter_mode``: 'none' writes filter 0 rows; 'cycle' rotates through
    all five filter types (row % 5) so decoders are exercised on every
    reconstruction path — both are valid PNG."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]
    raw = np.ascontiguousarray(img, dtype=np.uint8).reshape(h, w * c)
    prev = np.zeros(w * c, dtype=np.uint8)
    lines = []
    for r in range(h):
        ftype = (r % 5) if filter_mode == "cycle" else 0
        lines.append(bytes([ftype]) + _png_filter_row(ftype, raw[r], prev, c).tobytes())
        prev = raw[r]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8.  8-bit gray/RGB/RGBA, non-interlaced;
    IDAT may span multiple chunks; chunk CRCs are verified."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = len(_PNG_SIG), [], None
    while pos + 8 <= len(payload):
        (clen,), ctype = struct.unpack_from(">I", payload, pos), payload[pos + 4 : pos + 8]
        if pos + 12 + clen > len(payload):
            raise ValueError(f"truncated PNG: chunk {ctype!r} overruns payload")
        data = payload[pos + 8 : pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + clen)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or color not in _PNG_CHANNELS or comp or filt or interlace:
                raise ValueError(
                    f"unsupported PNG: depth={depth} color={color} interlace={interlace}"
                )
            meta = (w, h, _PNG_CHANNELS[color])
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, c = meta
    stream = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(stream) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    rows = np.frombuffer(stream, dtype=np.uint8).reshape(h, stride + 1)
    ftypes, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ftype, raw = int(ftypes[r]), data[r]
        if ftype == 0:
            recon = raw.copy()
        elif ftype == 2:
            recon = raw + prev
        elif ftype == 1:
            # recon[i] = raw[i] + recon[i-bpp]: running sum per channel lane
            recon = np.cumsum(
                raw.reshape(w, c).astype(np.uint64), axis=0, dtype=np.uint64
            ).astype(np.uint8).reshape(stride)
        else:
            # Average / Paeth depend on the already-reconstructed left
            # pixel — inherently serial within the row.  Real encoders
            # (libpng adaptive filtering) emit mostly these two, so the
            # serial loop runs on plain Python ints over bytearrays
            # (~10x faster than per-pixel numpy small-array ops).
            rec = bytearray(raw.tobytes())
            pb = prev.tobytes()
            if ftype == 3:
                for i in range(stride):
                    left = rec[i - c] if i >= c else 0
                    rec[i] = (rec[i] + ((left + pb[i]) >> 1)) & 0xFF
            elif ftype == 4:
                for i in range(stride):
                    a = rec[i - c] if i >= c else 0
                    b = pb[i]
                    cc = pb[i - c] if i >= c else 0
                    p = a + b - cc
                    pa = p - a if p >= a else a - p
                    pb_ = p - b if p >= b else b - p
                    pc = p - cc if p >= cc else cc - p
                    pred = a if (pa <= pb_ and pa <= pc) else (b if pb_ <= pc else cc)
                    rec[i] = (rec[i] + pred) & 0xFF
            else:
                raise ValueError(f"bad PNG filter {ftype}")
            recon = np.frombuffer(bytes(rec), dtype=np.uint8)
        out[r] = recon
        prev = recon
    return out.reshape(h, w, c)


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
