"""CBOR codec: RFC 8949 Appendix A vectors both directions, indefinite
forms, canonical rules (map-key order, shortest float), error contracts,
and the distributed intake round trip."""

from __future__ import annotations

import math

import pytest

from opentelemetry_collector_components_spark.functions.cbor_codec import (
    Tag,
    decode,
    decode_prefix,
    encode,
)

# (hex, value) — RFC 8949 Appendix A rows for the supported model
VECTORS = [
    ("00", 0), ("01", 1), ("0a", 10), ("17", 23), ("1818", 24), ("18ff", 255),
    ("190100", 256), ("1a000f4240", 1000000),
    ("1b000000e8d4a51000", 1000000000000),
    ("1bffffffffffffffff", 18446744073709551615),
    ("20", -1), ("29", -10), ("3863", -100), ("3903e7", -1000),
    ("f90000", 0.0), ("f93c00", 1.0), ("fb3ff199999999999a", 1.1),
    ("f93e00", 1.5), ("f97bff", 65504.0), ("fa47c35000", 100000.0),
    ("fb7e37e43c8800759c", 1e300), ("f90001", 5.960464477539063e-8),
    ("f9c400", -4.0), ("fbc010666666666666", -4.1),
    ("f97c00", float("inf")), ("f9fc00", float("-inf")),
    ("f4", False), ("f5", True), ("f6", None),
    ("40", b""), ("4401020304", bytes([1, 2, 3, 4])),
    ("60", ""), ("6161", "a"), ("6449455446", "IETF"), ("62c3bc", "ü"),
    ("80", []), ("83010203", [1, 2, 3]),
    ("8301820203820405", [1, [2, 3], [4, 5]]),
    ("a0", {}), ("a201020304", {1: 2, 3: 4}),
    ("a26161016162820203", {"a": 1, "b": [2, 3]}),
    ("826161a161626163", ["a", {"b": "c"}]),
]


@pytest.mark.parametrize("hx,v", VECTORS)
def test_rfc_appendix_a_roundtrip(hx, v):
    assert decode(bytes.fromhex(hx)) == v
    assert encode(v).hex() == hx


def test_indefinite_forms_decode():
    assert decode(bytes.fromhex("5f42010243030405ff")) == bytes(range(1, 6))
    assert decode(bytes.fromhex("7f657374726561646d696e67ff")) == "streaming"
    assert decode(bytes.fromhex("9fff")) == []
    assert decode(bytes.fromhex("9f018202039f0405ffff")) == [1, [2, 3], [4, 5]]
    assert decode(bytes.fromhex("bf61610161629f0203ffff")) == {"a": 1, "b": [2, 3]}


def test_tags_and_canonical_rules():
    t = decode(bytes.fromhex("c11a514b67b0"))
    assert t == Tag(1, 1363896240)
    assert encode(t).hex() == "c11a514b67b0"
    assert encode(float("nan")).hex() == "f97e00"  # canonical NaN
    # §4.2.1: map keys sort by encoded bytes, not python insertion order
    assert encode({"b": 1, "a": 2}).hex() == encode({"a": 2, "b": 1}).hex()
    assert encode({10: 0, 1: 0}).hex() == "a201000a00"


def test_error_contracts():
    with pytest.raises(ValueError, match="truncated"):
        decode(bytes.fromhex("1b0000"))
    with pytest.raises(ValueError, match="trailing"):
        decode(bytes.fromhex("0000"))
    with pytest.raises(ValueError, match="break"):
        decode(bytes.fromhex("ff"))
    with pytest.raises(ValueError, match="reserved"):
        decode(bytes.fromhex("1c"))
    with pytest.raises(TypeError):
        encode(object())
    # streams of items walk with decode_prefix
    buf = encode(1) + encode("x") + encode([2])
    v1, p = decode_prefix(buf, 0)
    v2, p = decode_prefix(buf, p)
    v3, p = decode_prefix(buf, p)
    assert (v1, v2, v3) == (1, "x", [2]) and p == len(buf)


def test_half_float_nan_passthrough():
    v = decode(bytes.fromhex("f97e00"))
    assert isinstance(v, float) and math.isnan(v)


def test_distributed_intake_roundtrip(spark):
    from opentelemetry_collector_components_spark.sources.cbor_records import (
        decode_cbor_bodies,
        generate_cbor_bodies,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dec = decode_cbor_bodies(generate_cbor_bodies(ev))
    assert dec.where("NOT valid").count() == 0
    assert dec.count() == ev.count()
    assert (
        dec.agg({"uid": "sum"}).first()[0]
        == ev.agg({"user_id": "sum"}).first()[0]
    )
