"""GELF datagram decode: chunk reassembly, compressions, corruption rows."""

from opentelemetry_collector_components_spark.sources.gelf import (
    decode_gelf_datagrams,
    encode_gelf_datagrams,
)


def _msg(i):
    return {
        "version": "1.1",
        "host": f"h{i % 3}",
        "short_message": f"event {i} " + "pad" * (i % 5),
        "timestamp": 1767225600.0 + i,
        "level": i % 8,
        "_facility": f"f{i % 2}",
    }


def _mid(i):
    return i.to_bytes(8, "big")


def _df(spark, datagrams):
    return spark.createDataFrame([(bytearray(d),) for d in datagrams], "body binary")


def test_chunked_gzip_reassembly(spark):
    msgs = [_msg(i) for i in range(20)]
    grams = encode_gelf_datagrams(msgs, [_mid(i) for i in range(20)], chunk_size=16)
    assert len(grams) > 40  # definitely chunked
    out = decode_gelf_datagrams(_df(spark, grams)).toPandas()
    assert len(out) == 20
    assert out["valid"].all()
    got = out.sort_values("message_id").reset_index(drop=True)
    assert got["host"].tolist() == [f"h{i % 3}" for i in range(20)]
    assert got["level"].tolist() == [i % 8 for i in range(20)]
    assert (got["parts"] == got["total"]).all()
    assert (got["total"] > 1).all()


def test_single_datagram_paths(spark):
    msgs = [_msg(1), _msg(2), _msg(3)]
    grams = (
        encode_gelf_datagrams(msgs[:1], [_mid(1)], compression="gzip")
        + encode_gelf_datagrams(msgs[1:2], [_mid(2)], compression="zlib")
        + encode_gelf_datagrams(msgs[2:], [_mid(3)], compression="none")
    )
    out = decode_gelf_datagrams(_df(spark, grams)).toPandas()
    assert len(out) == 3 and out["valid"].all()
    assert out["message_id"].isna().all()  # single datagrams carry no id
    assert set(out["host"]) == {"h0", "h1", "h2"}


def test_missing_chunk_is_invalid_not_dropped(spark):
    grams = encode_gelf_datagrams([_msg(7)], [_mid(7)], chunk_size=12)
    assert len(grams) >= 3
    out = decode_gelf_datagrams(_df(spark, grams[:-1])).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert not row["valid"]
    assert row["parts"] == row["total"] - 1
    assert row["host"] is None


def test_garbage_payload_invalid(spark):
    # complete chunk set but the payload isn't a known document format
    mid = _mid(9)
    grams = [b"\x1e\x0f" + mid + bytes([0, 2]) + b"\x00\x01",
             b"\x1e\x0f" + mid + bytes([1, 2]) + b"\x02\x03"]
    out = decode_gelf_datagrams(_df(spark, grams)).toPandas()
    assert len(out) == 1 and not out.iloc[0]["valid"]


def test_128_chunk_cap():
    import pytest

    big = {"version": "1.1", "host": "h", "short_message": "x" * 4000}
    with pytest.raises(ValueError):
        encode_gelf_datagrams([big], [_mid(1)], chunk_size=8, compression="none")
