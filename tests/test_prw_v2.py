"""Remote-Write 2.0: symbol table, labels_refs, metadata, v1 parity."""

import pytest

from opentelemetry_collector_components_spark.functions.protowire import (
    decode_write_request,
    decode_write_request_v2,
    encode_write_request,
    encode_write_request_v2,
)

SERIES = [
    {
        "labels": {"__name__": "http_requests", "job": "api", "instance": "i1"},
        "samples": [(1.5, 1700000000000), (2.5, 1700000001000)],
        "metadata": {"type": 1, "help": "Requests.", "unit": "1"},
    },
    {
        "labels": {"__name__": "http_requests", "job": "api", "instance": "i2"},
        "samples": [(-3.25, -5)],
        "metadata": {"type": 2, "help": "Requests.", "unit": "1"},
    },
]


def test_v2_roundtrip_and_symbol_dedup():
    wire = encode_write_request_v2(SERIES)
    got = decode_write_request_v2(wire)
    assert [g["labels"] for g in got] == [s["labels"] for s in SERIES]
    assert got[0]["samples"] == SERIES[0]["samples"]
    assert got[1]["samples"] == [(-3.25, -5)]
    assert got[0]["metadata"] == {"type": 1, "help": "Requests.", "unit": "1"}
    assert got[1]["metadata"]["type"] == 2
    # symbol dedup: the repeated job/api/help strings appear ONCE on the
    # wire; v2 must be smaller than v1 for this shared-label shape
    v1 = encode_write_request(
        [{k: s[k] for k in ("labels", "samples")} for s in SERIES]
    )
    assert len(wire) < len(v1)
    assert wire.count(b"http_requests") == 1
    assert wire.count(b"Requests.") == 1


def test_v2_error_paths():
    wire = bytearray(encode_write_request_v2(SERIES))
    # corrupt: drop the symbol table (keep only series field-5 records)
    from opentelemetry_collector_components_spark.functions.protowire import (
        decode_varint,
    )

    pos, out = 0, bytearray()
    while pos < len(wire):
        tag, p2 = decode_varint(bytes(wire), pos)
        ln, p3 = decode_varint(bytes(wire), p2)
        end = p3 + ln
        if tag >> 3 == 5:
            out += wire[pos:end]
        pos = end
    with pytest.raises(ValueError):
        decode_write_request_v2(bytes(out))  # refs out of range


def test_spark_e2e(spark):
    from opentelemetry_collector_components_spark.sources.decoders import (
        decode_prw_write_request_v2,
        generate_prw_v2_bodies,
    )

    dec = decode_prw_write_request_v2(generate_prw_v2_bodies(spark, 200)).cache()
    assert dec.count() == 400
    r = dec.where(dec.labels["job"] == "job_1").first()
    assert r["meta_type"] in (1, 2) and r["unit"] in ("seconds", "bytes")
    assert r["help"].startswith("Help for metric_")
    assert len(r["samples"]) == 2
    dec.unpersist()


def test_decode_varint_torn_input_raises_value_error():
    # shared wire primitive: bounded + capped, uniform ValueError on
    # corrupt transport data (same contract as thrift_compact.read_varint)
    from opentelemetry_collector_components_spark.functions.protowire import (
        decode_varint,
        encode_varint,
    )

    with pytest.raises(ValueError, match="truncated"):
        decode_varint(b"", 0)
    with pytest.raises(ValueError, match="truncated"):
        decode_varint(b"\x80\x80", 0)  # continuation bit at EOF
    with pytest.raises(ValueError, match="too long"):
        decode_varint(b"\xff" * 11 + b"\x01", 0)
    v, pos = decode_varint(encode_varint(2**63 - 1), 0)
    assert v == 2**63 - 1 and pos == 9
