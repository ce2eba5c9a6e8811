"""Protobuf wire-format primitives + prompb.WriteRequest codec (pure Python,
implemented from the PUBLIC protobuf encoding spec and the public
prometheus/prompb schema — no generated code, no external libs).

Closes the transport gap of the prometheusremotewritev1receiver
(receiver/prometheusremotewritev1receiver/receiver.go:31-80): the reference
decodes snappy-compressed prompb bodies before handing the post-protobuf
shape to the translator; this module does the same inside an Arrow-batched
UDF so ``sources/decoders.py::prw_translate`` can start from raw HTTP
bodies.

prompb schema (public):
    WriteRequest { repeated TimeSeries timeseries = 1; }
    TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
    Label        { string name = 1; string value = 2; }
    Sample       { double value = 1; int64 timestamp = 2; }  // ms
"""

from __future__ import annotations


def encode_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return encode_varint((field << 3) | 2) + encode_varint(len(payload)) + payload


def encode_write_request(series: list[dict]) -> bytes:
    """series: [{"labels": {name: value}, "samples": [(value, ts_ms), ...]}]"""
    import struct

    body = bytearray()
    for ts in series:
        ts_body = bytearray()
        for name, value in ts["labels"].items():
            ts_body += _ld(1, _ld(1, name.encode()) + _ld(2, value.encode()))
        for value, ts_ms in ts["samples"]:
            sample = (
                encode_varint((1 << 3) | 1)  # field 1, wire type 1 (fixed64)
                + struct.pack("<d", value)
                + encode_varint(2 << 3)  # field 2, wire type 0 (varint)
                + encode_varint(ts_ms & 0xFFFFFFFFFFFFFFFF)
            )
            ts_body += _ld(2, bytes(sample))
        body += _ld(1, bytes(ts_body))
    return bytes(body)


def decode_write_request(buf: bytes) -> list[dict]:
    """Parses a prompb.WriteRequest; unknown fields are skipped per spec."""
    import struct

    def skip(buf: bytes, pos: int, wire: int) -> int:
        if wire == 0:
            _, pos = decode_varint(buf, pos)
        elif wire == 1:
            pos += 8
        elif wire == 2:
            ln, pos = decode_varint(buf, pos)
            pos += ln
        elif wire == 5:
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        return pos

    def parse_label(b: bytes) -> tuple[str, str]:
        pos, name, value = 0, "", ""
        while pos < len(b):
            tag, pos = decode_varint(b, pos)
            field, wire = tag >> 3, tag & 7
            if field == 1 and wire == 2:
                ln, pos = decode_varint(b, pos)
                name = b[pos : pos + ln].decode()
                pos += ln
            elif field == 2 and wire == 2:
                ln, pos = decode_varint(b, pos)
                value = b[pos : pos + ln].decode()
                pos += ln
            else:
                pos = skip(b, pos, wire)
        return name, value

    def parse_sample(b: bytes) -> tuple[float, int]:
        pos, value, ts = 0, 0.0, 0
        while pos < len(b):
            tag, pos = decode_varint(b, pos)
            field, wire = tag >> 3, tag & 7
            if field == 1 and wire == 1:
                value = struct.unpack_from("<d", b, pos)[0]
                pos += 8
            elif field == 2 and wire == 0:
                ts, pos = decode_varint(b, pos)
                if ts >= 1 << 63:  # two's-complement int64
                    ts -= 1 << 64
            else:
                pos = skip(b, pos, wire)
        return value, ts

    def parse_timeseries(b: bytes) -> dict:
        pos = 0
        labels: dict[str, str] = {}
        samples: list[tuple[float, int]] = []
        while pos < len(b):
            tag, pos = decode_varint(b, pos)
            field, wire = tag >> 3, tag & 7
            if field == 1 and wire == 2:
                ln, pos = decode_varint(b, pos)
                name, value = parse_label(b[pos : pos + ln])
                labels[name] = value
                pos += ln
            elif field == 2 and wire == 2:
                ln, pos = decode_varint(b, pos)
                samples.append(parse_sample(b[pos : pos + ln]))
                pos += ln
            else:
                pos = skip(b, pos, wire)
        return {"labels": labels, "samples": samples}

    pos = 0
    out: list[dict] = []
    while pos < len(buf):
        tag, pos = decode_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:
            ln, pos = decode_varint(buf, pos)
            out.append(parse_timeseries(buf[pos : pos + ln]))
            pos += ln
        else:
            pos = skip(buf, pos, wire)
    return out
