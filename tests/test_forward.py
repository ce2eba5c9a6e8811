"""Msgpack codec + Fluentd forward protocol: roundtrip, modes, errors."""

import gzip

import pytest

from opentelemetry_collector_components_spark.functions.msgpack_codec import (
    Ext,
    event_time,
    ext_to_time,
    pack,
    unpack,
    unpack_stream,
)
from opentelemetry_collector_components_spark.sources.forward import (
    decode_forward,
    generate_forward_messages,
)


def test_msgpack_scalar_roundtrip():
    for v in [
        None, True, False,
        0, 1, 127, 128, 255, 256, 65535, 65536, 2**32 - 1, 2**32, 2**63 - 1,
        -1, -32, -33, -128, -129, -32768, -32769, -(2**31), -(2**31) - 1, -(2**63),
        0.0, 1.5, -2.25, 1e300,
        "", "a", "x" * 31, "x" * 32, "x" * 255, "x" * 256, "héllo",
        b"", b"\x00\xff", b"y" * 300,
    ]:
        assert unpack(pack(v)) == v


def test_msgpack_container_roundtrip():
    v = [1, "two", [3, None], {"k": [True, b"\x01"]}, {"n": {"m": -5}}]
    assert unpack(pack(v)) == v
    big = list(range(70000))
    assert unpack(pack(big)) == big
    bigmap = {f"k{i}": i for i in range(70000)}
    assert unpack(pack(bigmap)) == bigmap


def test_msgpack_ext_and_eventtime():
    e = event_time(1700000000, 123456789)
    raw = pack(e)
    assert raw[0] == 0xD7 and raw[1] == 0x00  # fixext8, type 0
    assert ext_to_time(unpack(raw)) == (1700000000, 123456789)
    for n in (1, 2, 4, 8, 16, 5, 300):
        e = Ext(42, bytes(range(min(n, 256))) * (n // 256 + 1))
        e = Ext(42, e.data[:n])
        assert unpack(pack(e)) == e


def test_msgpack_errors():
    with pytest.raises(ValueError):
        unpack(pack(1) + b"\x01")  # trailing bytes
    with pytest.raises(ValueError):
        unpack(b"\xd9")  # truncated str8 header
    with pytest.raises(ValueError):
        unpack(b"\xc1")  # never-used type byte
    with pytest.raises(TypeError):
        pack(object())
    assert unpack_stream(pack(1) + pack("a") + pack([2])) == [1, "a", [2]]


def test_forward_roundtrip_all_modes(spark):
    from opentelemetry_collector_components_spark.queries import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    msgs = generate_forward_messages(ev, shards=6).cache()
    modes = {int(r["shard"]) % 3 for r in msgs.select("shard").distinct().collect()}
    assert modes == {0, 1, 2}
    dec = decode_forward(msgs).cache()
    n = ev.count()
    assert dec.count() == n
    assert dec.where(~dec.valid).count() == 0
    # spot-check one event end-to-end
    row = ev.orderBy("event_id").first()
    got = dec.where(dec.record["eid"].cast("long") == row["event_id"]).first()
    assert got["tag"] == "app." + row["event_type"]
    assert got["record"]["uid"] == str(row["user_id"])
    us = int(row["ts"].timestamp() * 1_000_000 + 0.5)
    assert got["time_s"] == us // 1_000_000
    if row["event_id"] % 2 == 0:
        assert got["time_ns"] == us % 1_000_000 * 1000
    else:
        assert got["time_ns"] == 0
    msgs.unpersist()
    dec.unpersist()


def test_forward_invalid_body(spark):
    df = spark.createDataFrame([(b"\xc1garbage",), (bytes(pack(["t", [], {}])),)],
                               "body binary")
    out = decode_forward(df).toPandas()
    assert (~out["valid"]).sum() == 1  # bad body -> one error row
    assert len(out) == 1  # empty entries contribute no rows


def test_compressed_packed_is_gzip(spark):
    from opentelemetry_collector_components_spark.queries import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    msgs = generate_forward_messages(ev, shards=3)
    body = bytes(msgs.where(msgs.shard == 2).first()["body"])
    decoded = unpack(body)
    assert decoded[2]["compressed"] == "gzip"
    stream = gzip.decompress(decoded[1])
    assert len(unpack_stream(stream)) == decoded[2]["size"]


def test_review_regressions(spark):
    """Corrupt payloads must become valid=false rows, never task crashes;
    records with string values (the normal fluentd 'message') decode."""
    import struct

    from opentelemetry_collector_components_spark.functions.msgpack_codec import (
        pack as mp,
    )

    whole = gzip.compress(mp([1, {"m": "x"}]), mtime=0)
    bodies = [
        # truncated gzip in CompressedPackedForward -> EOFError path
        mp(["t", whole[:-4], {"compressed": "gzip", "size": 1}]),
        # option is not a map -> AttributeError path (now ValueError)
        mp(["t", [[1, {"k": 1}]], "not-a-map"]),
        # string-valued record: protocol-correct, must decode
        mp(["t", [[7, {"message": "GET /x 200", "code": 200}]], {"size": 1}]),
    ]
    out = decode_forward(
        spark.createDataFrame([(b,) for b in bodies], "body binary")
    ).toPandas()
    assert (~out["valid"]).sum() == 2
    good = out[out["valid"]].iloc[0]
    assert good["record"] == {"message": "GET /x 200", "code": "200"}
    assert good["time_s"] == 7
