"""Pure-Python Snappy BLOCK format codec (implemented from the public
format description, github.com/google/snappy/format_description.txt).

Prometheus remote-write bodies are snappy block-compressed; the container
has no snappy lib, so this closes the last transport step of S5.  The
decompressor handles the full format (literals + all three copy element
kinds); the compressor emits spec-valid output using literals only (a
correct, conservative encoding every decompressor accepts — compression
ratio is not the point here, transport fidelity is)."""

from __future__ import annotations

from .protowire import decode_varint, encode_varint


def snappy_compress(data: bytes) -> bytes:
    """Spec-valid all-literal encoding: uvarint length + literal elements
    (max literal run 2^32-1; we chunk at 2^24-1 to keep 3-byte lengths)."""
    out = bytearray(encode_varint(len(data)))
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 0xFFFFFF]
        n = len(chunk) - 1
        if n < 60:
            out.append(n << 2)
        elif n < 0x100:
            out.append(60 << 2)
            out.append(n)
        elif n < 0x10000:
            out.append(61 << 2)
            out += n.to_bytes(2, "little")
        else:
            out.append(62 << 2)
            out += n.to_bytes(3, "little")
        out += chunk
        pos += len(chunk)
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    expected, pos = decode_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("corrupt snappy stream: bad copy offset")
        # overlapping copies are legal and byte-at-a-time semantically
        start = len(out) - offset
        for i in range(ln):
            out.append(out[start + i])
    if len(out) != expected:
        raise ValueError(f"corrupt snappy stream: {len(out)} != {expected}")
    return bytes(out)


# --------------------------------------------------------------------------
# Snappy FRAMING format (the streaming ".sz" container, public
# google/snappy framing_format.txt): chunked transport with per-chunk
# masked CRC-32C — what Kafka's snappy-framed payloads and .sz dumps
# carry, one level above the raw block codec this module already speaks.
# Chunk: 1-byte type + 3-byte LE length + payload; types: 0xff stream
# identifier ("sNaPpY"), 0x00 compressed data (masked CRC + snappy
# block), 0x01 uncompressed data (masked CRC + raw bytes), 0x02-0x7f
# reserved-unskippable (raise), 0x80-0xfe reserved-skippable (skip).
# --------------------------------------------------------------------------

_STREAM_ID = b"sNaPpY"


def _mask_crc(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def frame_compress(data: bytes, chunk_size: int = 65536) -> bytes:
    """Frame ``data`` as a snappy stream: identifier chunk + one
    compressed chunk per ``chunk_size`` slice (the spec's 64 KiB
    maximum uncompressed chunk)."""
    import struct as _s

    from ..sources.kafka_batch import crc32c

    if not 1 <= chunk_size <= 65536:
        raise ValueError("chunk_size must be in [1, 65536]")
    out = bytearray(b"\xff\x06\x00\x00" + _STREAM_ID)
    for i in range(0, len(data), chunk_size):
        piece = data[i : i + chunk_size]
        body = _s.pack("<I", _mask_crc(crc32c(piece))) + snappy_compress(piece)
        out += bytes([0x00]) + len(body).to_bytes(3, "little") + body
    return bytes(out)


def frame_decompress(data: bytes) -> bytes:
    """Inverse of :func:`frame_compress`, accepting any spec-conforming
    stream: verifies the identifier, every chunk's masked CRC-32C over
    the UNCOMPRESSED bytes, skips skippable reserved chunks, raises on
    unskippable ones and on any CRC/framing tear."""
    import struct as _s

    from ..sources.kafka_batch import crc32c

    if data[:4] != b"\xff\x06\x00\x00" or data[4:10] != _STREAM_ID:
        raise ValueError("missing snappy stream identifier chunk")
    pos, n = 10, len(data)
    out = bytearray()
    while pos < n:
        if pos + 4 > n:
            raise ValueError("truncated snappy frame header")
        ctype = data[pos]
        clen = int.from_bytes(data[pos + 1 : pos + 4], "little")
        pos += 4
        if pos + clen > n:
            raise ValueError("snappy frame chunk overruns stream")
        body = data[pos : pos + clen]
        pos += clen
        if ctype == 0xFF:
            if body != _STREAM_ID:
                raise ValueError("bad snappy stream identifier")
        elif ctype in (0x00, 0x01):
            if clen < 4:
                raise ValueError("snappy frame chunk missing CRC")
            if ctype == 0x00 and clen == 4:  # block codec would IndexError
                raise ValueError("empty snappy frame compressed payload")
            (want,) = _s.unpack("<I", body[:4])
            piece = (
                snappy_decompress(body[4:]) if ctype == 0x00 else body[4:]
            )
            if len(piece) > 65536:
                raise ValueError("snappy frame chunk exceeds 64 KiB limit")
            if _mask_crc(crc32c(piece)) != want:
                raise ValueError("snappy frame CRC mismatch")
            out += piece
        elif 0x80 <= ctype <= 0xFE:
            continue  # reserved skippable (e.g. padding 0xfe)
        else:
            raise ValueError(f"unskippable reserved snappy chunk {ctype:#x}")
    return bytes(out)
