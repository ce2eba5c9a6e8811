"""Avro codec + container files: roundtrip, codecs, torn blocks, Spark."""

import pytest

from opentelemetry_collector_components_spark.functions.avro_codec import (
    decode_value,
    encode_value,
    read_container,
    read_long,
    write_container,
    write_long,
)
from opentelemetry_collector_components_spark.sources.avro_ocf import (
    EVENT_SCHEMA,
    decode_avro_containers,
    generate_avro_containers,
)

SYNC = b"0123456789abcdef"


def test_zigzag_varint_edges():
    for n in [0, 1, -1, 63, 64, -64, -65, 2**31, -(2**31), 2**63 - 1, -(2**63)]:
        out = bytearray()
        write_long(out, n)
        got, pos = read_long(bytes(out), 0)
        assert got == n and pos == len(out)
    # spec examples: 0->00, -1->01, 1->02, -2->03, 2->04
    for n, wire in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"), (2, b"\x04")]:
        out = bytearray()
        write_long(out, n)
        assert bytes(out) == wire


def test_value_roundtrip_all_types():
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "n", "type": "null"},
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "fx", "type": {"type": "fixed", "name": "F4", "size": 4}},
            {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["x", "y"]}},
            {"name": "a", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "u", "type": ["null", "long", "string"]},
        ],
    }
    for u in [None, 42, "hi"]:
        rec = {
            "n": None, "b": True, "i": -7, "l": 2**40, "f": 0.5, "d": -1.25,
            "s": "héllo", "by": b"\x00\xff", "fx": b"abcd", "e": "y",
            "a": [1, -2, 3], "m": {"k1": "v1", "k2": "v2"}, "u": u,
        }
        out = bytearray()
        encode_value(out, schema, rec)
        got, pos = decode_value(bytes(out), 0, schema)
        assert pos == len(out) and got == rec


def test_negative_count_block_form():
    # readers must accept the size-prefixed negative-count array form
    schema = {"type": "array", "items": "long"}
    body = bytearray()
    items = bytearray()
    for v in [5, 6]:
        write_long(items, v)
    write_long(body, -2)
    write_long(body, len(items))
    body += items
    write_long(body, 0)
    got, _ = decode_value(bytes(body), 0, schema)
    assert got == [5, 6]


def test_container_roundtrip_and_errors():
    schema = {"type": "record", "name": "T",
              "fields": [{"name": "x", "type": "long"}]}
    recs = [{"x": i} for i in range(257)]
    for codec in ("null", "deflate"):
        blob = write_container(schema, recs, SYNC, codec=codec, block_records=100)
        s, got = read_container(blob)
        assert got == recs and s["name"] == "T"
    blob = write_container(schema, recs, SYNC)
    with pytest.raises(ValueError):
        read_container(b"NOPE" + blob[4:])  # bad magic
    torn = bytearray(blob)
    torn[-1] ^= 0xFF  # corrupt final sync marker
    with pytest.raises(ValueError):
        read_container(bytes(torn))
    with pytest.raises(ValueError):
        write_container(schema, recs, b"short")
    with pytest.raises(ValueError):
        write_container(schema, recs, SYNC, codec="snappy")


def test_spark_roundtrip(spark):
    from opentelemetry_collector_components_spark.queries import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    blobs = generate_avro_containers(ev, shards=8)
    dec = decode_avro_containers(blobs).cache()
    assert dec.count() == ev.count()
    assert dec.where(~dec.valid).count() == 0
    row = ev.orderBy("event_id").first()
    got = dec.where(dec.eid == row["event_id"]).first()
    assert got["uid"] == row["user_id"] and got["etype"] == row["event_type"]
    assert got["vm"] == round(row["value"] * 100)
    if row["event_id"] % 7 == 0:
        assert got["knum"] is None
    if row["event_id"] % 2 == 0:
        assert got["tags"] == {"u": f"u{row['user_id'] % 10}"}
    else:
        assert got["tags"] == {}
    dec.unpersist()


def test_spark_invalid_blob(spark):
    df = spark.createDataFrame([(b"not avro",)], "body binary")
    out = decode_avro_containers(df).toPandas()
    assert len(out) == 1 and not out["valid"][0]


def test_review_regressions(spark):
    """Corrupt deflate payloads and truncated fields -> valid=false rows;
    out-of-range enum indexes raise instead of wrapping."""
    schema = {"type": "record", "name": "T",
              "fields": [{"name": "x", "type": "double"}]}
    blob = bytearray(write_container(schema, [{"x": 1.5}] * 3, SYNC,
                                     codec="deflate"))
    # corrupt a byte INSIDE the deflate payload (framing intact)
    blob[-20] ^= 0xFF
    enum_schema = {"type": "enum", "name": "E", "symbols": ["a", "b"]}
    with pytest.raises(ValueError):
        decode_value(b"\x01", 0, enum_schema)  # zigzag -1 -> must not wrap
    with pytest.raises(ValueError):
        decode_value(b"\x04", 0, enum_schema)  # index 2 -> out of range
    df = spark.createDataFrame([(bytes(blob),)], "body binary")
    out = decode_avro_containers(df).toPandas()
    assert len(out) == 1 and not out["valid"][0]


# --- schema resolution ------------------------------------------------------
from opentelemetry_collector_components_spark.functions.avro_codec import (  # noqa: E402
    read_container_resolved,
    resolve_read,
    write_container,
)


def _enc(schema, value):
    from opentelemetry_collector_components_spark.functions.avro_codec import (
        encode_value,
    )

    out = bytearray()
    encode_value(out, schema, value)
    return bytes(out)


def test_resolution_skip_default_promote():
    writer = {
        "type": "record", "name": "R",
        "fields": [
            {"name": "a", "type": "int"},
            {"name": "drop_me", "type": "string"},
            {"name": "b", "type": "long"},
        ],
    }
    reader = {
        "type": "record", "name": "R",
        "fields": [
            {"name": "a", "type": "double"},       # int -> double promotion
            {"name": "b", "type": "long"},
            {"name": "added", "type": "string", "default": "dflt"},
        ],
    }
    buf = _enc(writer, {"a": 7, "drop_me": "gone", "b": 2**40})
    v, pos = resolve_read(buf, 0, writer, reader)
    assert v == {"a": 7.0, "b": 2**40, "added": "dflt"} and pos == len(buf)
    assert isinstance(v["a"], float)


def test_resolution_union_and_enum():
    writer = {
        "type": "record", "name": "R",
        "fields": [
            {"name": "u", "type": ["null", "int"]},
            {"name": "e", "type": {"type": "enum", "name": "E",
                                   "symbols": ["x", "y", "z"]}},
        ],
    }
    reader = {
        "type": "record", "name": "R",
        "fields": [
            {"name": "u", "type": ["null", "long"]},  # promoted inside union
            {"name": "e", "type": {"type": "enum", "name": "E",
                                   "symbols": ["x", "y"], "default": "x"}},
        ],
    }
    buf = _enc(writer, {"u": 5, "e": "z"})  # z unknown to reader -> default
    v, _ = resolve_read(buf, 0, writer, reader)
    assert v == {"u": 5, "e": "x"}
    buf2 = _enc(writer, {"u": None, "e": "y"})
    v2, _ = resolve_read(buf2, 0, writer, reader)
    assert v2 == {"u": None, "e": "y"}


def test_resolution_string_bytes_and_errors():
    import pytest as _pt

    assert resolve_read(_enc("string", "hi"), 0, "string", "bytes")[0] == b"hi"
    assert resolve_read(_enc("bytes", b"hi"), 0, "bytes", "string")[0] == "hi"
    with _pt.raises(ValueError, match="cannot promote"):
        resolve_read(_enc("double", 1.5), 0, "double", "int")
    writer = {"type": "record", "name": "R",
              "fields": [{"name": "a", "type": "int"}]}
    reader = {"type": "record", "name": "R",
              "fields": [{"name": "a", "type": "int"},
                         {"name": "no_default", "type": "int"}]}
    with _pt.raises(ValueError, match="no default"):
        resolve_read(_enc(writer, {"a": 1}), 0, writer, reader)


def test_container_resolved_roundtrip():
    writer = {
        "type": "record", "name": "R",
        "fields": [{"name": "a", "type": "int"},
                   {"name": "s", "type": "string"}],
    }
    reader = {
        "type": "record", "name": "R",
        "fields": [{"name": "a", "type": "long"},
                   {"name": "extra", "type": "long", "default": 9}],
    }
    blob = write_container(
        writer, [{"a": i, "s": f"r{i}"} for i in range(250)],
        sync=b"0123456789abcdef", codec="deflate", block_records=64,
    )
    meta, recs = read_container_resolved(blob, reader)
    assert meta["codec"] == "deflate" and len(recs) == 250
    assert recs[0] == {"a": 0, "extra": 9} and recs[249]["a"] == 249


def test_union_named_branch_matching():
    import pytest as _pt

    rec_a = {"type": "record", "name": "A",
             "fields": [{"name": "x", "type": "int"}]}
    rec_b = {"type": "record", "name": "B",
             "fields": [{"name": "y", "type": "string"}]}
    buf = _enc(rec_a, {"x": 7})
    # reader union lists B first: resolution must match by NAME, not by
    # the 'record' keyword
    v, _ = resolve_read(buf, 0, rec_a, [rec_b, rec_a])
    assert v == {"x": 7}
    with _pt.raises(ValueError, match="no reader union branch"):
        resolve_read(buf, 0, rec_a, [rec_b])


def test_container_resolved_rejects_trailing_bytes():
    import pytest as _pt

    writer = {"type": "record", "name": "R",
              "fields": [{"name": "a", "type": "int"}]}
    blob = write_container(writer, [{"a": 1}], sync=b"0123456789abcdef")
    # find the data block and append garbage INSIDE it (before the sync)
    sync = b"0123456789abcdef"
    head_end = blob.index(sync) + 16
    body = bytearray(blob)
    tail = body[head_end:]
    i = tail.rindex(sync)
    corrupt = bytes(body[:head_end]) + bytes(tail[:i]) + b"\x00" + bytes(tail[i:])
    # block size field now disagrees with content; accept either the
    # explicit trailing-bytes raise or the sync mismatch it causes
    from opentelemetry_collector_components_spark.functions.avro_codec import (
        read_container_resolved,
    )
    with _pt.raises(ValueError):
        read_container_resolved(corrupt, writer)


def test_confluent_frames(spark):
    from opentelemetry_collector_components_spark.functions.avro_codec import (
        encode_value,
    )
    from opentelemetry_collector_components_spark.sources.avro_ocf import (
        decode_confluent_frames,
    )

    sch = {"type": "record", "name": "R",
           "fields": [{"name": "a", "type": "long"},
                      {"name": "s", "type": "string"}]}
    reader = {"type": "record", "name": "R",
              "fields": [{"name": "a", "type": "long"},
                         {"name": "extra", "type": "string",
                          "default": "dflt"}]}

    def frame(sid, rec, schema=sch):
        out = bytearray(b"\x00" + sid.to_bytes(4, "big"))
        encode_value(out, schema, rec)
        return bytes(out)

    good = frame(5, {"a": 42, "s": "hi"})
    df = spark.createDataFrame(
        [(good,), (b"\x01bad-magic",), (frame(99, {"a": 1, "s": "x"}),),
         (good[:-1],)],  # torn payload
        "body binary",
    )
    dec = decode_confluent_frames(df, {5: sch}).collect()
    ok = [r for r in dec if r.valid]
    assert len(ok) == 1 and ok[0].schema_id == 5
    assert ok[0].record == {"a": "42", "s": "hi"}
    assert sum(1 for r in dec if not r.valid) == 3
    # evolution through a reader schema: s skipped, extra defaulted
    res = decode_confluent_frames(
        spark.createDataFrame([(good,)], "body binary"), {5: sch}, reader_schema=reader
    ).collect()[0]
    assert res.record == {"a": "42", "extra": "dflt"}
