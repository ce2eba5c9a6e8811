"""Chunked transfer-coding + RFC 6587 octet framing."""

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.sources.framing import (
    decode_chunked_body,
    encode_chunked_body,
    encode_octet_frames,
    split_octet_frames,
)


def test_chunked_decode_handwritten(spark):
    cases = [
        (b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n", b"hello world"),
        (b"b;ext=1\r\nhello world\r\n0\r\n\r\n", b"hello world"),  # extension
        (b"0\r\n\r\n", b""),
        (b"5\r\nhel", None),       # truncated chunk
        (b"zz\r\nhello\r\n", None),  # bad hex
        (b"5\r\nhelloXX0\r\n\r\n", None),  # missing chunk CRLF
        (b"2\r\nok\r\n0\r\n", b"ok"),  # trailer section absent at EOF
        (b"2\r\nok\r\n0\r\nX-T: 1\r\n\r\n", b"ok"),  # well-formed trailer
        (b"2\r\nok\r\n0\r\n\r\ngarbage", None),  # bytes after terminator
        (b"2\r\nok\r\n0\r\nnot-a-header\r\n\r\n", None),  # no colon
        (b"2\r\nok\r\n0\r\nX-T: 1\r\n", None),  # trailer never terminated
    ]
    df = spark.createDataFrame([(b,) for b, _ in cases], "body binary")
    got = [
        bytes(r[0]) if r[0] is not None else None
        for r in df.select(decode_chunked_body("body")).collect()
    ]
    assert got == [w for _, w in cases]


def test_chunked_roundtrip_jvm_encoder(spark):
    df = spark.createDataFrame(
        [(1, b"The quick brown fox jumps over the lazy dog"), (2, b""), (3, b"xy")],
        "id long, data binary",
    )
    enc = df.select(
        "id",
        encode_chunked_body(F.col("data"), F.lit(7)).alias("body"),
        "data",
    )
    out = enc.select("id", decode_chunked_body("body").alias("back"), "data").collect()
    for r in out:
        assert bytes(r["back"]) == bytes(r["data"])


def test_octet_framing_roundtrip_and_resync(spark):
    msgs = ["<34>1 msg one", "second message", "x"]
    df = spark.createDataFrame([(msgs,)], "msgs array<string>")
    stream = df.select(encode_octet_frames("msgs").alias("s"))
    got = stream.select(split_octet_frames("s").alias("r")).first()["r"]
    assert list(got["frames"]) == msgs
    assert got["leftover"] == "" and got["n_bad"] == 0
    # partial trailing frame stays in leftover; garbage resyncs
    raw = "5 hello3 ab"  # second frame claims 3 bytes but only 2 remain
    df2 = spark.createDataFrame([(raw,), ("junk 5 hello",), (None,)], "s string")
    rows = [r["r"] for r in df2.select(split_octet_frames("s").alias("r")).collect()]
    assert list(rows[0]["frames"]) == ["hello"] and rows[0]["leftover"] == "3 ab"
    assert list(rows[1]["frames"]) == ["hello"] and rows[1]["n_bad"] == 1
    assert rows[2]["frames"] is None
