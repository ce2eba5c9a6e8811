"""Thrift compact codec + jaeger batch decode."""

import pytest

from opentelemetry_collector_components_spark.functions.thrift_compact import (
    FieldWriter,
    read_struct,
    read_varint,
    write_varint,
)
from opentelemetry_collector_components_spark.sources.jaeger import (
    decode_jaeger_batches,
    generate_jaeger_batches,
)


def test_varint_roundtrip():
    for n in [0, 1, 127, 128, 300, 2**32, 2**63 - 1]:
        out = bytearray()
        write_varint(out, n)
        got, pos = read_varint(bytes(out), 0)
        assert got == n and pos == len(out)
    with pytest.raises(ValueError):
        write_varint(bytearray(), -1)
    with pytest.raises(ValueError):
        read_varint(b"\x80", 0)  # truncated continuation


def test_struct_field_roundtrip():
    w = FieldWriter()
    w.i64(1, -5)
    w.i64(2, 2**62)
    w.i32(3, -100)
    w.string(5, "héllo")          # delta 2
    w.double(7, 1.25)
    w.boolean(8, True)
    w.boolean(9, False)
    w.binary(25, b"\x00\xff")      # delta 16 -> long-form header
    body = w.stop()
    got, pos = read_struct(body, 0)
    assert pos == len(body)
    assert got[1] == -5 and got[2] == 2**62 and got[3] == -100
    assert got[5] == "héllo".encode()
    assert got[7] == 1.25 and got[8] is True and got[9] is False
    assert got[25] == b"\x00\xff"


def test_nested_structs_and_long_lists():
    inner = FieldWriter()
    inner.string(1, "k")
    inner_b = inner.stop()
    w = FieldWriter()
    w.struct(1, inner_b)
    w.list_of_structs(2, [inner_b] * 20)  # > 14 -> long-form size
    body = w.stop()
    got, _ = read_struct(body, 0)
    assert got[1] == {1: b"k"}
    assert len(got[2]) == 20 and got[2][19] == {1: b"k"}


def test_decode_errors():
    with pytest.raises(ValueError):
        read_struct(b"\x16", 0)  # field header then truncated
    with pytest.raises(ValueError):
        read_struct(b"\x1d\x00", 0)  # unknown type 13


def test_spark_roundtrip(spark):
    from opentelemetry_collector_components_spark.queries import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    dec = decode_jaeger_batches(generate_jaeger_batches(ev)).cache()
    assert dec.count() == ev.count()
    assert dec.where(~dec.valid).count() == 0
    row = ev.orderBy("event_id").first()
    eid = row["event_id"]
    got = dec.where(dec.span_id == f"{eid + 1:016x}").first()
    assert got["service"] == "svc-" + row["event_type"]
    low = row["user_id"] * 100000 + eid
    high = 42 if eid % 2 == 0 else 0
    assert got["trace_id"] == f"{high:016x}{low:016x}"
    assert got["parent_span_id"] == (None if eid % 4 == 0 else f"{eid % 4:016x}")
    assert got["dur_us"] == round(row["value"] * 1000) + 1
    assert got["tags"]["process.host"].startswith("h")
    if eid % 2 == 0:
        assert got["tags"]["code"] == str(eid % 4)
        assert got["tags"]["ok"] in ("true", "false")
    dec.unpersist()


def test_spark_invalid_batch(spark):
    df = spark.createDataFrame([(b"\xff\xff\xff",)], "body binary")
    out = decode_jaeger_batches(df).toPandas()
    assert len(out) == 1 and not out["valid"][0]
