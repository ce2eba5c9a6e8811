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


# ---------------------------------------------------------------------------
# Baseline JPEG (SOF0) — pure Python + numpy, no libjpeg.
#
# Scope (honestly bounded): baseline sequential DCT, 8-bit, grayscale or
# YCbCr 4:4:4 (no chroma subsampling), no progressive, no restart markers.
# The encoder emits canonical Huffman tables computed from the actual
# symbol set (DHT is self-describing; the decoder reads ANY tables a file
# declares, so standard Annex-K-table files decode too).  JPEG is lossy:
# round-trip error is bounded by quantization — with quant=1 (all-ones
# table) only DCT float round-trip noise remains (max ~2/255 per sample,
# test-pinned), so feature extraction is real decode over real entropy-
# coded bytes.  MP4 remains the single stubbed format (needs a video
# codec stack no pure-Python implementation can reasonably provide).
# ---------------------------------------------------------------------------



ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# 1-D DCT-II orthonormal matrix (8x8): block DCT = C @ B @ C.T
_C = np.array([
    [np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8) * np.cos((2 * n + 1) * k * np.pi / 16)
     for n in range(8)]
    for k in range(8)
])


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# --- canonical Huffman (fixed-length variant: every code the same length) ---

def _fixed_table(symbols) -> tuple[list[int], dict[int, tuple[int, int]]]:
    """Canonical table with all codes at one length L (prefix-free by
    construction; n <= 2^L - 1 keeps the all-ones code unassigned, which
    some decoders reserve).  Returns (bits[1..16], {sym: (code, L)})."""
    syms = sorted(set(symbols))
    n = len(syms)
    L = 1
    while (1 << L) - 1 < n:
        L += 1
    bits = [0] * 17
    bits[L] = n
    enc = {s: (i, L) for i, s in enumerate(syms)}
    return bits[1:], enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise ValueError("unexpected marker in entropy stream")
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v


def _decode_huffman(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:  # JPEG codes are at most 16 bits; never read a 17th
        code = (code << 1) | reader.read(1)
        length += 1
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (size, amplitude bits)."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    amp = v if v > 0 else v + (1 << size) - 1
    return size, amp


def _extend(amp: int, size: int) -> int:
    if size == 0:
        return 0
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


def encode_jpeg(img: np.ndarray, quant: int = 1) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> baseline JFIF bytes.

    ``quant``: uniform quantization divisor for every coefficient (1 =
    near-lossless: only DCT float round-trip error remains)."""
    if not 1 <= quant <= 255:
        raise ValueError("quant must be in 1..255 (8-bit DQT entries)")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ncomp = img.shape
    if ncomp not in (1, 3):
        raise ValueError(f"encode_jpeg supports gray or RGB, got {ncomp} channels")
    if ncomp == 3:
        planes = _rgb_to_ycbcr(img)
    else:
        planes = img.astype(np.float64)
    qtab = np.full(64, quant, dtype=np.int64)

    # pad to 8x8 blocks by edge replication
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.empty((ph, pw, ncomp))
    padded[:h, :w] = planes
    padded[h:, :w] = planes[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]

    # per-component coefficient streams -> symbols
    comp_coefs = []
    for c in range(ncomp):
        coefs = []
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                block = padded[by : by + 8, bx : bx + 8, c] - 128.0
                zz = np.round(_dct2(block).flatten()[ZIGZAG] / qtab).astype(np.int64)
                coefs.append(zz)
        comp_coefs.append(coefs)

    # gather symbol sets (shared DC table, shared AC table: legal and simple)
    dc_syms, ac_syms = set(), set()
    for coefs in comp_coefs:
        prev = 0
        for zz in coefs:
            diff = int(zz[0]) - prev
            prev = int(zz[0])
            dc_syms.add(_magnitude(diff)[0])
            run = 0
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms.add(0xF0)  # ZRL
                    run -= 16
                size, _ = _magnitude(int(v))
                ac_syms.add((run << 4) | size)
                run = 0
            if run:
                ac_syms.add(0x00)  # EOB
    ac_syms.add(0x00)
    dc_bits, dc_enc = _fixed_table(dc_syms)
    ac_bits, ac_enc = _fixed_table(ac_syms)

    # entropy-code the scan (interleaved MCUs = one block per component,
    # 4:4:4 so MCU order is just block order)
    bw = _BitWriter()
    n_blocks = len(comp_coefs[0])
    prev_dc = [0] * ncomp
    for bi in range(n_blocks):
        for c in range(ncomp):
            zz = comp_coefs[c][bi]
            diff = int(zz[0]) - prev_dc[c]
            prev_dc[c] = int(zz[0])
            size, amp = _magnitude(diff)
            code, length = dc_enc[size]
            bw.write(code, length)
            if size:
                bw.write(amp, size)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for i in range(1, 64):
                v = int(zz[i])
                if i > last:
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_enc[0xF0]
                    bw.write(code, length)
                    run -= 16
                size, amp = _magnitude(v)
                code, length = ac_enc[(run << 4) | size]
                bw.write(code, length)
                bw.write(amp, size)
                run = 0
            if last < 63:
                code, length = ac_enc[0x00]
                bw.write(code, length)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(int(q) for q in qtab))  # DQT id 0
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])  # id, 1x1 sampling, qtable 0
    out += seg(0xFFC0, sof)  # SOF0
    def dht(tc: int, th: int, bits: list[int], enc: dict) -> bytes:
        # _fixed_table assigns codes in sorted-symbol order
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(sorted(enc))
    out += seg(0xFFC4, dht(0, 0, dc_bits, dc_enc))
    out += seg(0xFFC4, dht(1, 0, ac_bits, ac_enc))
    sos = bytes([ncomp]) + b"".join(bytes([c + 1, 0x00]) for c in range(ncomp)) + bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W, C) uint8 (C = 1 gray or 3 RGB).
    Supports SOF0, 8-bit, 1x1 sampling (4:4:4), any DHT/DQT the file
    declares; rejects progressive/subsampled/arithmetic streams."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps = None
    h = w = 0
    scan_comps = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        # spec B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while payload[pos + 1] == 0xFF and pos + 4 <= len(payload):
            pos += 1
        marker = struct.unpack_from(">H", payload, pos)[0]
        if marker == 0xFFD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xFFDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                qtabs[tq] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(np.int64)
                i += 65
        elif marker == 0xFFC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc} (gray/YCbCr only)")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("chroma subsampling unsupported (4:4:4 only)")
                comps.append((cid, tq))
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC9, 0xFFCA):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                syms = list(body[i + 17 : i + 17 + n])
                table = {}
                code = 0
                k = 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                htabs[(tc, th)] = table
                i += 17 + n
        elif marker == 0xFFDA:
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cid, tabs >> 4, tabs & 0xF))
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if comps is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")

    # entropy stream runs until EOI
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("JPEG missing EOI marker")
    reader = _BitReader(payload[pos:end])
    ncomp = len(comps)
    # pair scan components with frame components by DECLARED id, not
    # position — a spec-valid SOS may list them in a different order
    by_cid = {cid: tq for cid, tq in comps}
    ordered = []
    for cid, dc_id, ac_id in scan_comps:
        if cid not in by_cid:
            raise ValueError(f"SOS component id {cid} not declared in SOF")
        if by_cid[cid] not in qtabs:
            raise ValueError(f"undeclared quant table {by_cid[cid]}")
        for tc, tid in ((0, dc_id), (1, ac_id)):
            if (tc, tid) not in htabs:
                raise ValueError(f"undeclared Huffman table ({tc}, {tid})")
        # plane slot = position of this cid in the SOF component list
        slot = [i for i, (fc, _) in enumerate(comps) if fc == cid][0]
        ordered.append((slot, dc_id, ac_id, qtabs[by_cid[cid]]))
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    planes = np.zeros((ph, pw, ncomp))
    prev_dc = [0] * ncomp
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for c in range(ncomp):
                slot, dc_id, ac_id, qt = ordered[c]
                zz = np.zeros(64, dtype=np.int64)
                size = _decode_huffman(reader, htabs[(0, dc_id)])
                diff = _extend(reader.read(size), size) if size else 0
                prev_dc[c] += diff
                zz[0] = prev_dc[c]
                i = 1
                while i < 64:
                    sym = _decode_huffman(reader, htabs[(1, ac_id)])
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0xF
                    if sym == 0xF0:
                        i += 16
                        continue
                    i += run
                    if i > 63:
                        raise ValueError("AC index overflow")
                    zz[i] = _extend(reader.read(size), size)
                    i += 1
                coef = np.zeros(64)
                coef[ZIGZAG] = zz * qt
                block = _idct2(coef.reshape(8, 8)) + 128.0
                planes[by : by + 8, bx : bx + 8, slot] = block
    planes = planes[:h, :w]
    if ncomp == 3:
        return _ycbcr_to_rgb(planes)
    return np.clip(np.round(planes[:, :, 0]), 0, 255).astype(np.uint8)[:, :, None]
