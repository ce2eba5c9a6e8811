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
