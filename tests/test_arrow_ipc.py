"""Arrow IPC stream decoder: pyarrow parity across types/nulls/batches,
framing and unsupported-shape rejection, distributed intake round trip."""

from __future__ import annotations

import io

import pyarrow as pa
import pytest

from opentelemetry_collector_components_spark.functions.arrow_ipc import (
    decode_arrow_stream,
)


def _stream(table: pa.Table, chunk: int = 1 << 20) -> bytes:
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table, max_chunksize=chunk)
    return sink.getvalue()


def _table():
    return pa.table(
        {
            "i64": pa.array([1, None, -5, 2**60, 0], type=pa.int64()),
            "i32": pa.array([7, None, -1, 2**30, 0], type=pa.int32()),
            "i16": pa.array([1, 2, None, -4, 5], type=pa.int16()),
            "f64": pa.array([1.5, None, -0.25, 1e300, 0.0]),
            "f32": pa.array([1.5, 2.5, None, -8.0, 0.0], type=pa.float32()),
            "b": pa.array([True, False, None, True, False]),
            "s": pa.array(["a", "bb", None, "", "ccc"]),
            "ts": pa.array([10, None, 30, 40, 50], type=pa.timestamp("us")),
        }
    )


def test_parity_single_and_multi_batch():
    t = _table()
    for chunk in (1 << 20, 2):  # one batch, then three
        got = decode_arrow_stream(_stream(t, chunk))
        for c in t.column_names:
            exp = t[c].to_pylist()
            if c == "ts":
                exp = [None if v is None else [10, None, 30, 40, 50][i]
                       for i, v in enumerate(exp)]
            assert got[c] == exp, (c, chunk)


def test_no_nulls_column_without_validity_buffer():
    t = pa.table({"v": pa.array([1, 2, 3], type=pa.int64())})
    assert decode_arrow_stream(_stream(t))["v"] == [1, 2, 3]


def test_rejections():
    t = _table()
    data = _stream(t)
    with pytest.raises(ValueError, match="continuation"):
        decode_arrow_stream(b"\x00\x00\x00\x00" + data[4:])
    with pytest.raises(ValueError, match="no schema"):
        decode_arrow_stream(b"\xff\xff\xff\xff\x00\x00\x00\x00")
    # dictionary-encoded column -> dictionary batch message
    d = pa.table({"d": pa.array(["x", "y", "x"]).dictionary_encode()})
    with pytest.raises(ValueError, match="unsupported arrow"):
        decode_arrow_stream(_stream(d))
    # unsigned ints are out of scope, loudly
    u = pa.table({"u": pa.array([1, 2], type=pa.uint64())})
    with pytest.raises(ValueError, match="unsupported Int"):
        decode_arrow_stream(_stream(u))
    # nested types are out of scope, loudly
    n = pa.table({"l": pa.array([[1], [2, 3]], type=pa.list_(pa.int64()))})
    with pytest.raises(ValueError, match="unsupported arrow type"):
        decode_arrow_stream(_stream(n))


def test_distributed_intake_roundtrip(spark):
    from opentelemetry_collector_components_spark.sources.arrow_stream import (
        decode_arrow_streams,
        generate_arrow_streams,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dec = decode_arrow_streams(generate_arrow_streams(ev))
    assert dec.where("NOT valid").count() == 0
    assert dec.count() == ev.count()
    assert (
        dec.agg({"eid": "sum"}).first()[0]
        == ev.agg({"event_id": "sum"}).first()[0]
    )


def test_negative_size_rejected_not_looped():
    import struct as _s

    with pytest.raises(ValueError, match="negative arrow message size"):
        decode_arrow_stream(b"\xff\xff\xff\xff" + _s.pack("<i", -5))
