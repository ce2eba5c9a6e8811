"""Pure-Python Gorilla time-series chunk codec (implemented from the public
VLDB'15 paper, Pelkonen et al. "Gorilla: A Fast, Scalable, In-Memory Time
Series Database" §4.1, the same scheme Prometheus TSDB uses for its XOR
chunks).

This is the storage-side complement of the repo's lsminterval analog
(``operators/aggregate.py``): a merged 1m series is a (timestamp, value)
stream per identity, and the reference's downstream store (Elasticsearch
TSDS / Prometheus) persists exactly this delta-of-delta + XOR layout.  We
implement it so per-series chunks can be written as opaque ``binary``
columns next to the aggregate rows — ~1-2 bytes/sample on well-behaved
telemetry instead of 16.

Layout per chunk (bit stream, MSB-first inside each byte):

- header: ``n`` (uvarint), ``t0`` (zigzag uvarint, integer units — callers
  pass epoch-ms), ``v0`` (raw 64-bit IEEE-754 big-endian)
- 2nd sample timestamp: ``delta`` = t1-t0 as zigzag uvarint (the paper uses
  a fixed 14-bit field tied to its 2h block alignment; varint keeps the
  chunk alignment-free — a documented deviation, decode is symmetric)
- timestamps i>=2: ``dod`` = (t_i - t_{i-1}) - (t_{i-1} - t_{i-2}):
  '0' if dod == 0; '10' + 7 bits (dod+63) for [-63, 64]; '110' + 9 bits
  (dod+255) for [-255, 256]; '1110' + 12 bits (dod+2047) for [-2047, 2048];
  else '1111' + 64-bit two's complement
- values i>=1: xor = bits(v_i) ^ bits(v_{i-1}); '0' if xor == 0; '10' +
  meaningful bits when they fit the previous (leading, length) window;
  '11' + 5-bit leading-zero count (capped 31) + 6-bit significant-bit
  length (0 encodes 64) + the significant bits

All arithmetic is integer/bit-exact: NaN, infinities and -0.0 round-trip
bit-identically.  Encoding requires timestamps non-decreasing (the Spark
operator sorts per series before calling in).
"""

from __future__ import annotations

import struct

from .protowire import decode_varint, encode_varint


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def _unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self, prefix: bytes = b"") -> None:
        self.buf = bytearray(prefix)
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int) -> None:
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def finish(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, byte_offset: int) -> None:
        self.data = data
        self.pos = byte_offset * 8

    def read(self, width: int) -> int:
        out = 0
        pos = self.pos
        data = self.data
        remaining = width
        while remaining:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < remaining else remaining
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            remaining -= take
        self.pos = pos
        return out


_DOD_BUCKETS = ((63, 64, 0b10, 2, 7), (255, 256, 0b110, 3, 9), (2047, 2048, 0b1110, 4, 12))


def gorilla_encode(timestamps: list[int], values: list[float]) -> bytes:
    """Encode parallel (int timestamp, float value) lists into one chunk.
    Timestamps must be non-decreasing integers (epoch-ms by convention)."""
    n = len(timestamps)
    if n != len(values):
        raise ValueError("timestamps and values must be the same length")
    if n == 0:
        return encode_varint(0)
    header = bytearray(encode_varint(n))
    header += encode_varint(_zigzag(int(timestamps[0])))
    header += struct.pack(">d", values[0])
    if n == 1:
        return bytes(header)
    # first delta rides in the byte-aligned header as a varint too
    prev_t = int(timestamps[0])
    delta = int(timestamps[1]) - prev_t
    if delta < 0:
        raise ValueError("timestamps must be non-decreasing")
    header += encode_varint(_zigzag(delta))
    w = _BitWriter(bytes(header))
    prev_t = int(timestamps[1])
    prev_delta = delta
    (prev_bits,) = struct.unpack(">Q", struct.pack(">d", values[0]))
    prev_lead, prev_sig = -1, 0  # no open value window yet
    for i in range(1, n):
        if i >= 2:
            t = int(timestamps[i])
            delta = t - prev_t
            if delta < 0:
                raise ValueError("timestamps must be non-decreasing")
            dod = delta - prev_delta
            prev_t, prev_delta = t, delta
            if dod == 0:
                w.write(0, 1)
            else:
                for lo, hi, ctrl, ctrl_w, width in _DOD_BUCKETS:
                    if -lo <= dod <= hi:
                        w.write(ctrl, ctrl_w)
                        w.write(dod + lo, width)
                        break
                else:
                    w.write(0b1111, 4)
                    w.write(dod & 0xFFFFFFFFFFFFFFFF, 64)
        (bits,) = struct.unpack(">Q", struct.pack(">d", values[i]))
        xor = bits ^ prev_bits
        prev_bits = bits
        if xor == 0:
            w.write(0, 1)
            continue
        lead = 64 - xor.bit_length()
        trail = (xor & -xor).bit_length() - 1
        if lead > 31:
            lead = 31
        sig = 64 - lead - trail
        # reuse iff the xor fits inside the open window: lead >= prev_lead
        # AND trail >= prev_trail  (prev_trail = 64 - prev_lead - prev_sig)
        if prev_lead >= 0 and lead >= prev_lead and lead + sig <= prev_lead + prev_sig:
            # fits the open window: reuse previous (lead, sig)
            w.write(0b10, 2)
            w.write(xor >> (64 - prev_lead - prev_sig), prev_sig)
        else:
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(sig & 0x3F, 6)  # 64 encodes as 0
            w.write(xor >> trail, sig)
            prev_lead, prev_sig = lead, sig
    return w.finish()


def gorilla_decode(chunk: bytes) -> tuple[list[int], list[float]]:
    """Decode one chunk back to parallel (timestamps, values) lists."""
    n, pos = decode_varint(chunk, 0)
    if n == 0:
        return [], []
    z, pos = decode_varint(chunk, pos)
    t = _unzigzag(z)
    (v_bits,) = struct.unpack(">Q", chunk[pos : pos + 8])
    pos += 8
    timestamps = [t]
    values = [struct.unpack(">d", struct.pack(">Q", v_bits))[0]]
    if n == 1:
        return timestamps, values
    z, pos = decode_varint(chunk, pos)
    delta = _unzigzag(z)
    r = _BitReader(chunk, pos)
    lead, sig = 0, 0
    for i in range(1, n):
        if i == 1:
            t += delta
        else:
            ctrl = 0
            while ctrl < 4 and r.read(1):
                ctrl += 1
            if ctrl == 0:
                dod = 0
            elif ctrl < 4:
                lo, _hi, _c, _cw, width = _DOD_BUCKETS[ctrl - 1]
                dod = r.read(width) - lo
            else:
                raw = r.read(64)
                dod = raw - (1 << 64) if raw >= (1 << 63) else raw
            delta += dod
            t += delta
        timestamps.append(t)
        if r.read(1) == 0:
            values.append(values[-1])
            continue
        if r.read(1):
            lead = r.read(5)
            sig = r.read(6) or 64
        xor = r.read(sig) << (64 - lead - sig)
        v_bits ^= xor
        values.append(struct.unpack(">d", struct.pack(">Q", v_bits))[0])
    return timestamps, values
