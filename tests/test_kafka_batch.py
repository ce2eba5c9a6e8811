"""Kafka RecordBatch v2: wire framing, codecs, CRC32C, Spark roundtrip."""

import pytest

from opentelemetry_collector_components_spark.sources.kafka_batch import (
    crc32c,
    decode_kafka_batches,
    decode_record_batch,
    encode_record_batch,
    generate_kafka_batches,
)

RECS = [
    {"ts_ms": 1700000000000 + i, "key": f"k{i}".encode(),
     "value": f"v{i}".encode() if i % 3 else None,
     "headers": [("h", b"x"), ("n", None)] if i % 2 else []}
    for i in range(50)
]


def test_crc32c_vector():
    # the public Castagnoli check vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


@pytest.mark.parametrize("codec", ["none", "gzip", "snappy"])
def test_roundtrip_codecs(codec):
    blob = encode_record_batch(7, 1700000000000, RECS, codec=codec)
    out = decode_record_batch(blob)
    assert out["codec"] == codec and out["base_offset"] == 7
    assert len(out["records"]) == 50
    r5 = out["records"][5]
    assert r5["offset"] == 12 and r5["ts_ms"] == 1700000000005
    assert out["records"][3]["value"] is None
    assert out["records"][1]["headers"] == [("h", b"x"), ("n", None)]


def test_wire_errors():
    blob = bytearray(encode_record_batch(0, 0, RECS))
    torn = bytearray(blob)
    torn[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_record_batch(bytes(torn))
    bad_magic = bytearray(blob)
    bad_magic[16] = 1
    with pytest.raises(ValueError, match="magic"):
        decode_record_batch(bytes(bad_magic))
    with pytest.raises(ValueError, match="batchLength"):
        decode_record_batch(bytes(blob[:-3]))
    with pytest.raises(ValueError):
        encode_record_batch(0, 0, RECS, codec="zstd")


def test_spark_roundtrip(spark):
    from opentelemetry_collector_components_spark.queries import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    dec = decode_kafka_batches(generate_kafka_batches(ev, shards=6)).cache()
    assert dec.count() == ev.count()
    assert dec.where(~dec.valid).count() == 0
    assert {r["codec"] for r in dec.select("codec").distinct().collect()} == {
        "none", "gzip", "snappy"
    }
    row = ev.orderBy("event_id").first()
    eid = row["event_id"]
    got = dec.where(dec.value == f"{eid}:{round(row['value'] * 100)}").first()
    assert got["key"] == str(row["user_id"])
    assert got["headers"] == {"etype": row["event_type"]}
    assert got["offset"] == (eid % 6) * 10**9 + (eid // 6)
    dec.unpersist()


def test_spark_invalid_blob(spark):
    df = spark.createDataFrame([(b"\x00" * 80,)], "body binary")
    out = decode_kafka_batches(df).toPandas()
    assert len(out) == 1 and not out["valid"][0]
