"""Pure-Python Apache Arrow IPC *stream* decoder.

The third columnar interchange beside parquet (``sources/parquet_pages``)
and Avro OCF (``avro_codec``): Arrow IPC is what Flight services, Feather
dumps, and cross-process Arrow handoffs ship.  Implemented from the
public Arrow columnar specification (arrow.apache.org/docs/format) like
the repo's other wire codecs — no generated flatbuffers code; the
flatbuffer walk below is a minimal reader for the three tables the
stream format needs (Message, Schema/Field, RecordBatch).

Flatbuffers wire rules (public flatbuffers internals doc):

- root/table references are little-endian int32 offsets RELATIVE TO the
  field's own position; a table starts with an int32 soffset BACK to its
  vtable;
- vtable: uint16 vtable_size, uint16 table_size, then one uint16 per
  field slot — the field's offset inside the table, 0 = absent/default;
- vectors: uoffset → int32 length + elements; strings: uoffset → int32
  length + utf8 bytes; structs are inline; a union occupies TWO slots
  (uint8 type tag, table offset).

Stream framing: each message is ``0xFFFFFFFF`` continuation + int32
flatbuffer size + Message flatbuffer + 8-padded body; a size of 0 ends
the stream.  Supported column types: signed Int 8/16/32/64, Float32/64,
Bool, Utf8, Timestamp — validity bitmaps honored (LSB order).  Anything
else (dictionary batches, compression, nested types) raises with the
shape in the message — honestly out of scope, not silently wrong.

The natural oracle is an independent implementation reading the same
bytes (pyarrow wrote them; DuckDB recomputes the expected values
closed-form) — same cross-validation stance as the parquet page reader.
"""

from __future__ import annotations

import struct

import numpy as np

CONTINUATION = 0xFFFFFFFF

# Type union member indices (Schema.fbs enum Type)
_T_INT, _T_FLOAT, _T_UTF8, _T_BOOL, _T_TIMESTAMP = 2, 3, 5, 6, 10


class _FB:
    """Minimal flatbuffer table reader."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos  # table start
        (soff,) = struct.unpack_from("<i", buf, pos)
        self.vt = pos - soff
        (self.vt_size,) = struct.unpack_from("<H", buf, self.vt)

    def _field(self, slot: int) -> int:
        """Absolute position of field ``slot``'s value, or 0 if absent."""
        off = 4 + 2 * slot
        if off >= self.vt_size:
            return 0
        (v,) = struct.unpack_from("<H", self.buf, self.vt + off)
        return self.pos + v if v else 0

    def scalar(self, slot: int, fmt: str, default=0):
        p = self._field(slot)
        return struct.unpack_from(fmt, self.buf, p)[0] if p else default

    def indirect(self, slot: int) -> int:
        """Follow a uoffset field to its target; 0 if absent."""
        p = self._field(slot)
        if not p:
            return 0
        (u,) = struct.unpack_from("<I", self.buf, p)
        return p + u

    def table(self, slot: int) -> "_FB | None":
        t = self.indirect(slot)
        return _FB(self.buf, t) if t else None

    def string(self, slot: int) -> str | None:
        t = self.indirect(slot)
        if not t:
            return None
        (n,) = struct.unpack_from("<I", self.buf, t)
        return self.buf[t + 4 : t + 4 + n].decode("utf-8")

    def vector(self, slot: int) -> tuple[int, int]:
        """(element-0 position, length); (0, 0) if absent."""
        t = self.indirect(slot)
        if not t:
            return 0, 0
        (n,) = struct.unpack_from("<I", self.buf, t)
        return t + 4, n

    def vector_table(self, slot: int, i: int) -> "_FB":
        base, n = self.vector(slot)
        if not 0 <= i < n:
            raise IndexError("flatbuffer vector index out of range")
        (u,) = struct.unpack_from("<I", self.buf, base + 4 * i)
        return _FB(self.buf, base + 4 * i + u)


def _parse_field(f: _FB) -> dict:
    name = f.string(0)
    ttype = f.scalar(2, "<B")  # union type tag
    t = f.table(3)
    if ttype == _T_INT:
        bw = t.scalar(0, "<i", 0) if t else 0
        signed = bool(t.scalar(1, "<B", 0)) if t else False
        if not signed or bw not in (8, 16, 32, 64):
            raise ValueError(f"unsupported Int type (bitWidth={bw}, signed={signed})")
        return {"name": name, "kind": "int", "bits": bw}
    if ttype == _T_FLOAT:
        prec = t.scalar(0, "<h", 0) if t else 0
        if prec not in (1, 2):  # SINGLE / DOUBLE
            raise ValueError(f"unsupported FloatingPoint precision {prec}")
        return {"name": name, "kind": "float", "bits": 32 if prec == 1 else 64}
    if ttype == _T_UTF8:
        return {"name": name, "kind": "utf8"}
    if ttype == _T_BOOL:
        return {"name": name, "kind": "bool"}
    if ttype == _T_TIMESTAMP:
        unit = t.scalar(0, "<h", 0) if t else 0
        return {"name": name, "kind": "timestamp", "unit": unit}
    raise ValueError(f"unsupported arrow type tag {ttype} for field {name!r}")


def _bitmap(buf: bytes, off: int, ln: int, n: int):
    if ln == 0:
        return None  # no validity buffer: all valid
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8, count=(n + 7) // 8, offset=off),
        bitorder="little",
    )[:n]
    return bits.astype(bool)


def decode_arrow_stream(data: bytes) -> dict[str, list]:
    """IPC stream bytes -> {column: row-ordered Python values} across all
    record batches (None for nulls)."""
    pos = 0
    fields: list[dict] = []
    out: dict[str, list] = {}
    saw_schema = False
    while pos + 8 <= len(data):
        (cont,) = struct.unpack_from("<I", data, pos)
        if cont != CONTINUATION:
            raise ValueError("missing arrow continuation marker")
        (msize,) = struct.unpack_from("<i", data, pos + 4)
        pos += 8
        if msize == 0:
            break  # end-of-stream
        if msize < 0:  # a negative size would walk the cursor backwards
            raise ValueError(f"negative arrow message size {msize}")
        msg = _FB(data, pos + struct.unpack_from("<I", data, pos)[0])
        htype = msg.scalar(1, "<B")
        header_t = msg.table(2)
        body_len = msg.scalar(3, "<q")
        if body_len < 0:  # ditto: the loop must always advance
            raise ValueError(f"negative arrow body length {body_len}")
        body = pos + msize
        if header_t is None and htype in (1, 3):
            raise ValueError("arrow message missing its header table")
        if htype == 1:  # Schema
            base, n = header_t.vector(1)
            fields = [_parse_field(header_t.vector_table(1, i)) for i in range(n)]
            out = {f["name"]: [] for f in fields}
            saw_schema = True
        elif htype == 3:  # RecordBatch
            if not saw_schema:
                raise ValueError("record batch before schema")
            if header_t.table(3) is not None:
                raise ValueError("unsupported arrow body compression")
            _decode_batch(data, body, header_t, fields, out)
        elif htype == 2:
            raise ValueError("unsupported arrow dictionary batch")
        else:
            raise ValueError(f"unsupported arrow message type {htype}")
        pos = body + ((body_len + 7) & ~7)
    if not saw_schema:
        raise ValueError("not an arrow IPC stream (no schema message)")
    return out


def _decode_batch(data, body, rb: _FB, fields, out) -> None:
    nodes_base, n_nodes = rb.vector(1)
    bufs_base, n_bufs = rb.vector(2)
    if n_nodes != len(fields):
        raise ValueError("field-node count does not match schema")
    bi = 0

    def nxt():
        nonlocal bi
        off, ln = struct.unpack_from("<qq", data, bufs_base + 16 * bi)
        bi += 1
        if bi > n_bufs:
            raise ValueError("buffer index past record-batch buffer list")
        return body + off, ln

    for fi, f in enumerate(fields):
        n, _null_count = struct.unpack_from(
            "<qq", data, nodes_base + 16 * fi
        )
        v_off, v_len = nxt()
        valid = _bitmap(data, v_off, v_len, n)
        if f["kind"] == "utf8":
            o_off, _ = nxt()
            d_off, _ = nxt()
            offs = np.frombuffer(data, dtype="<i4", count=n + 1, offset=o_off)
            vals = [
                data[d_off + offs[i] : d_off + offs[i + 1]].decode("utf-8")
                for i in range(n)
            ]
        elif f["kind"] == "bool":
            d_off, d_len = nxt()
            bits = _bitmap(data, d_off, d_len, n)
            vals = [bool(b) for b in bits] if bits is not None else [False] * n
        else:
            d_off, _ = nxt()
            bits = f.get("bits", 64)
            dt = {"int": f"<i{bits // 8}", "float": f"<f{bits // 8}",
                  "timestamp": "<i8"}[f["kind"]]
            arr = np.frombuffer(data, dtype=dt, count=n, offset=d_off)
            vals = [v.item() for v in arr]
        if valid is not None:
            vals = [v if ok else None for v, ok in zip(vals, valid)]
        out[f["name"]].extend(vals)
