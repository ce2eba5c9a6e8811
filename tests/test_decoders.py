"""Decoder sources: beats json/text/csv codecs + NDJSON intake dispatch."""

from opentelemetry_collector_components_spark.sources.decoders import (
    decode_csv,
    decode_json,
    decode_ndjson_intake,
    decode_text,
)


def test_decode_text(spark):
    lines = spark.createDataFrame([("hello",), ("world",)], ["value"])
    out = decode_text(lines, tags=["t1"]).collect()
    assert out[0]["message"] == "hello"
    assert out[0]["input_type"] == "text"
    assert out[0]["tags"] == ["t1"]


def test_decode_json_unwrap_and_mapping(spark):
    lines = spark.createDataFrame(
        [('{"event": {"msg": "a", "lvl": 3}}',), ('{"event": {"msg": "b", "lvl": 7}}',)],
        ["value"],
    )
    out = decode_json(
        lines,
        "event struct<msg:string, lvl:int>",
        unwrap="event",
        mappings={"msg": "message"},
    )
    rows = {r["message"]: r["lvl"] for r in out.collect()}
    assert rows == {"a": 3, "b": 7}


def test_decode_csv(spark):
    lines = spark.createDataFrame([("x,1",), ("y,2",)], ["value"])
    out = decode_csv(lines, "name string, n int")
    rows = {r["name"]: r["n"] for r in out.collect()}
    assert rows == {"x": 1, "y": 2}


def test_ndjson_intake_dispatch(spark):
    lines = spark.createDataFrame(
        [
            ('{"metadata": {"service": "s1"}}',),
            ('{"transaction": {"id": "t1", "duration": 5}, "metadata": {"service": "s1"}}',),
            ('{"span": {"id": "sp1"}}',),
            ('{"error": {"id": "e1"}}',),
            ('{"bogus": 1}',),
        ],
        ["value"],
    )
    out = decode_ndjson_intake(lines)
    types = [r["event_type"] for r in out.collect()]
    assert types == ["unknown", "transaction", "span", "error", "unknown"]
    tx = out.filter("event_type = 'transaction'").collect()[0]
    assert '"id":"t1"' in tx["payload"].replace(" ", "")
    assert "s1" in tx["metadata"]
