"""Pure-Python LZ4 BLOCK format codec (implemented from the public format
spec, github.com/lz4/lz4/blob/dev/doc/lz4_Block_format.md).

Beats/Kafka-side log shippers compress transport batches with LZ4; the
container has no lz4 lib, so this joins snappy (``snappy_codec.py``) and
gzip (``gzip_codec.py``) to complete the collector transport-codec set.
Unlike the snappy encoder (literals-only by choice) this encoder does real
greedy hash-table matching — LZ4's end-of-block rules make a matching
encoder barely larger than a literal one, and repetitive log payloads
deserve the ratio.

Spec rules honored by the encoder:
- the last sequence is literals-only (no offset field);
- the last 5 bytes of the input are always encoded as literals;
- no match starts within the last 12 bytes of the input;
- match length >= 4, offset in [1, 65535].

Decompressed bytes are exact for any spec-valid input (overlap copies
included); compressed bytes are deterministic for this encoder but, as
with every codec here, nothing hashes compressed output — gates and tests
always round-trip."""

from __future__ import annotations

_HASH_MUL = 2654435761  # Knuth multiplicative hash, the constant lz4 uses


def _emit_length(out: bytearray, n: int) -> None:
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)


def _emit_sequence(out: bytearray, literals: bytes, offset: int, match_len: int) -> None:
    lit_len = len(literals)
    lit_nib = 15 if lit_len >= 15 else lit_len
    if offset == 0:  # final literals-only sequence
        out.append(lit_nib << 4)
        if lit_nib == 15:
            _emit_length(out, lit_len - 15)
        out += literals
        return
    m = match_len - 4
    m_nib = 15 if m >= 15 else m
    out.append((lit_nib << 4) | m_nib)
    if lit_nib == 15:
        _emit_length(out, lit_len - 15)
    out += literals
    out += offset.to_bytes(2, "little")
    if m_nib == 15:
        _emit_length(out, m - 15)


def lz4_compress(data: bytes) -> bytes:
    n = len(data)
    if n == 0:
        return b"\x00"
    out = bytearray()
    if n < 13:  # too short for any spec-legal match
        _emit_sequence(out, data, 0, 0)
        return bytes(out)
    table: dict[int, int] = {}
    mflimit = n - 12  # no match may START at or past here
    match_end_limit = n - 5  # last 5 bytes stay literals
    pos = 0
    anchor = 0
    while pos < mflimit:
        key = int.from_bytes(data[pos : pos + 4], "little")
        h = (key * _HASH_MUL) & 0xFFFFFFFF
        cand = table.get(h)
        table[h] = pos
        if (
            cand is not None
            and pos - cand <= 65535
            and data[cand : cand + 4] == data[pos : pos + 4]
        ):
            mlen = 4
            max_m = match_end_limit - pos
            while mlen < max_m and data[cand + mlen] == data[pos + mlen]:
                mlen += 1
            _emit_sequence(out, data[anchor:pos], pos - cand, mlen)
            pos += mlen
            anchor = pos
        else:
            pos += 1
    _emit_sequence(out, data[anchor:], 0, 0)
    return bytes(out)


def lz4_decompress(data: bytes) -> bytes:
    if data == b"":
        return b""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated LZ4 block: literal length")
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("truncated LZ4 block: literal run past end")
        out += data[pos : pos + lit_len]
        pos += lit_len
        if pos >= n:  # final literals-only sequence
            break
        if pos + 2 > n:
            raise ValueError("truncated LZ4 block: incomplete match offset")
        offset = int.from_bytes(data[pos : pos + 2], "little")
        pos += 2
        if offset == 0:
            raise ValueError("invalid LZ4 block: zero match offset")
        m = token & 0xF
        if m == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated LZ4 block: match length")
                b = data[pos]
                pos += 1
                m += b
                if b != 255:
                    break
        m += 4
        start = len(out) - offset
        if start < 0:
            raise ValueError("invalid LZ4 block: offset beyond output")
        if offset >= m:
            out += out[start : start + m]
        else:  # overlap copy: byte-at-a-time RLE semantics
            for i in range(m):
                out.append(out[start + i])
    return bytes(out)
