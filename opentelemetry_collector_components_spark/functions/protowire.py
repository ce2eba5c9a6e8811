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


# ---------------------------------------------------------------------------
# OTLP logs protobuf (opentelemetry-proto logs/v1 + collector/logs/v1,
# public schema) — the binary wire the JSON mapping in sources/otlp.py
# shadows.  Field numbers from the public logs.proto:
#   ExportLogsServiceRequest { repeated ResourceLogs resource_logs = 1; }
#   ResourceLogs { Resource resource = 1; repeated ScopeLogs scope_logs = 2; }
#   Resource     { repeated KeyValue attributes = 1; }
#   ScopeLogs    { InstrumentationScope scope = 1;
#                  repeated LogRecord log_records = 2; }
#   InstrumentationScope { string name = 1; string version = 2; }
#   LogRecord { fixed64 time_unix_nano = 1; SeverityNumber severity_number
#               = 2; string severity_text = 3; AnyValue body = 5;
#               repeated KeyValue attributes = 6; uint32
#               dropped_attributes_count = 7; fixed32 flags = 8;
#               bytes trace_id = 9; bytes span_id = 10;
#               fixed64 observed_time_unix_nano = 11; }
#   KeyValue { string key = 1; AnyValue value = 2; }
#   AnyValue { string=1 | bool=2 | int=3 | double=4 | ... }
# ---------------------------------------------------------------------------

import struct as _struct


def _fixed64(field: int, value: int) -> bytes:
    return encode_varint(field << 3 | 1) + _struct.pack("<Q", value & (2**64 - 1))


def _vint(field: int, value: int) -> bytes:
    return encode_varint(field << 3 | 0) + encode_varint(value)


def _any_string(s: str) -> bytes:
    return _ld(1, s.encode("utf-8"))


def _kv(key: str, value: str) -> bytes:
    return _ld(1, key.encode("utf-8")) + _ld(2, _any_string(value))


def encode_otlp_logs_request(
    resource_attrs: dict,
    scope_name: str,
    records: list[dict],
) -> bytes:
    """One ExportLogsServiceRequest with a single resource/scope entry.
    Record dict keys: time_unix_nano, observed_unix_nano,
    severity_number, severity_text, body (string), trace_id/span_id
    (lowercase hex), attributes (str->str dict, emitted key-sorted)."""
    res = b"".join(
        _kv(k, str(v)) for k, v in sorted(resource_attrs.items())
    )
    recs = b""
    for r in records:
        body = b""
        body += _fixed64(1, int(r["time_unix_nano"]))
        if r.get("severity_number"):
            body += _vint(2, int(r["severity_number"]))
        if r.get("severity_text"):
            body += _ld(3, str(r["severity_text"]).encode("utf-8"))
        if r.get("body") is not None:
            body += _ld(5, _any_string(str(r["body"])))
        for k, v in sorted((r.get("attributes") or {}).items()):
            body += _ld(6, _kv(k, str(v)))
        if r.get("trace_id"):
            body += _ld(9, bytes.fromhex(r["trace_id"]))
        if r.get("span_id"):
            body += _ld(10, bytes.fromhex(r["span_id"]))
        if r.get("observed_unix_nano") is not None:
            body += _fixed64(11, int(r["observed_unix_nano"]))
        recs += _ld(2, body)
    scope = _ld(1, str(scope_name).encode("utf-8"))
    scope_logs = _ld(1, scope) + recs
    resource = _ld(1, res)
    resource_logs = _ld(1, resource) + _ld(2, scope_logs)
    return _ld(1, resource_logs)


def _skip(buf: bytes, pos: int, wire: int) -> int:
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


def _parse_fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        tag, pos = decode_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 2:
            ln, pos = decode_varint(buf, pos)
            yield field, wire, buf[pos:pos + ln]
            pos += ln
        elif wire == 0:
            v, pos = decode_varint(buf, pos)
            yield field, wire, v
        elif wire == 1:
            yield field, wire, _struct.unpack("<Q", buf[pos:pos + 8])[0]
            pos += 8
        elif wire == 5:
            yield field, wire, _struct.unpack("<I", buf[pos:pos + 4])[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _parse_any(buf: bytes):
    for f, w, v in _parse_fields(buf):
        if f == 1:
            return v.decode("utf-8")
        if f == 2:
            return "true" if v else "false"
        if f == 3:
            # int64 rides as a 64-bit two's-complement varint
            return str(v - 2**64 if v >= 2**63 else v)
        if f == 4:
            return str(_struct.unpack("<d", _struct.pack("<Q", v))[0])
    return None


def _parse_kv(buf: bytes):
    key, val = None, None
    for f, w, v in _parse_fields(buf):
        if f == 1:
            key = v.decode("utf-8")
        elif f == 2:
            val = _parse_any(v)
    return key, val


def decode_otlp_logs_request(buf: bytes) -> list[dict]:
    """ExportLogsServiceRequest bytes -> one dict per LogRecord (same
    keys as the encoder), resource/scope fields flattened on."""
    out = []
    for f0, _, rl in _parse_fields(buf):
        if f0 != 1:
            continue
        res_attrs: dict = {}
        scope_entries = []
        for f1, _, v1 in _parse_fields(rl):
            if f1 == 1:  # Resource
                for f2, _, v2 in _parse_fields(v1):
                    if f2 == 1:
                        k, v = _parse_kv(v2)
                        if k is not None:
                            res_attrs[k] = v
            elif f1 == 2:  # ScopeLogs
                scope_entries.append(v1)
        for sl in scope_entries:
            scope_name = ""
            for f2, _, v2 in _parse_fields(sl):
                if f2 == 1:  # InstrumentationScope
                    for f3, _, v3 in _parse_fields(v2):
                        if f3 == 1:
                            scope_name = v3.decode("utf-8")
                elif f2 == 2:  # LogRecord
                    rec = {
                        "time_unix_nano": None,
                        "observed_unix_nano": None,
                        "severity_number": 0,
                        "severity_text": None,
                        "body": None,
                        "trace_id": None,
                        "span_id": None,
                        "attributes": {},
                    }
                    for f3, w3, v3 in _parse_fields(v2):
                        if f3 == 1:
                            rec["time_unix_nano"] = v3
                        elif f3 == 2:
                            rec["severity_number"] = v3
                        elif f3 == 3:
                            rec["severity_text"] = v3.decode("utf-8")
                        elif f3 == 5:
                            rec["body"] = _parse_any(v3)
                        elif f3 == 6:
                            k, v = _parse_kv(v3)
                            if k is not None:
                                rec["attributes"][k] = v
                        elif f3 == 9:
                            rec["trace_id"] = v3.hex()
                        elif f3 == 10:
                            rec["span_id"] = v3.hex()
                        elif f3 == 11:
                            rec["observed_unix_nano"] = v3
                    rec["resource_attrs"] = dict(res_attrs)
                    rec["scope_name"] = scope_name
                    out.append(rec)
    return out
