"""LEEF 1.0/2.0 encode/decode: headers, delimiter forms, escapes."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.sources.decoders import (
    decode_leef,
    encode_leef,
)

LINES = [
    "LEEF:2.0|IBM|QRadar|1.0|SIG-1|x09|src=10.0.0.1\tdst=10.0.0.2\tmsg=hello world",
    "LEEF:2.0|IBM|QRadar|1.0|SIG-2|^|src=1.2.3.4^msg=a=b escaped",
    "LEEF:1.0|Vendor\\|Pipe|Prod|2.0|SIG-3|src=9.9.9.9\tmsg=tab 1.0",
    "LEEF:2.0|IBM|QRadar|1.0|SIG-4|0x7c|src=4.4.4.4|msg=pipe delim",
    "not a leef line",
]


def _decode(spark, keys=("src", "dst", "msg")):
    df = spark.createDataFrame([(ln,) for ln in LINES], "value string")
    return decode_leef(df, list(keys)).toPandas().set_index("value")


def test_decode_versions_and_delims(spark):
    out = _decode(spark)
    a = out.loc[LINES[0]]
    assert a["leef_version"] == "2.0" and a["vendor"] == "IBM"
    assert a["event_id"] == "SIG-1"
    assert a["src"] == "10.0.0.1" and a["dst"] == "10.0.0.2"
    assert a["msg"] == "hello world"  # spaces legal inside values
    b = out.loc[LINES[1]]
    assert b["src"] == "1.2.3.4" and b["msg"] == "a=b escaped"
    c = out.loc[LINES[2]]
    assert c["leef_version"] == "1.0" and c["vendor"] == "Vendor|Pipe"
    assert c["src"] == "9.9.9.9" and c["msg"] == "tab 1.0"
    d = out.loc[LINES[3]]
    assert d["src"] == "4.4.4.4" and d["msg"] == "pipe delim"
    bad = out.loc["not a leef line"]
    assert bad["leef_version"] is None and bad["src"] is None


def test_absent_key_null(spark):
    out = _decode(spark)
    assert out.loc[LINES[1]]["dst"] is None


def test_encode_decode_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "va|l", "k=v", "plain")], "id long, a string, b string, c string"
    )
    line = encode_leef(
        F.lit("V"), F.col("a"), F.lit("1"), F.lit("E1"),
        {"x": F.col("b"), "y": F.col("c"), "z": F.lit(None)},
        leef_version="2.0", delim="^",
    )
    enc = df.select(line.alias("value"))
    got = decode_leef(enc, ["x", "y", "z"]).first()
    assert got["product"] == "va|l"
    assert got["x"] == "k=v" and got["y"] == "plain" and got["z"] is None


def test_encode_validation():
    with pytest.raises(ValueError):
        encode_leef(F.lit("v"), F.lit("p"), F.lit("1"), F.lit("e"), {},
                    leef_version="3.0")
    with pytest.raises(ValueError):
        encode_leef(F.lit("v"), F.lit("p"), F.lit("1"), F.lit("e"), {},
                    leef_version="1.0", delim="^")
    with pytest.raises(ValueError):
        encode_leef(F.lit("v"), F.lit("p"), F.lit("1"), F.lit("e"),
                    {"bad key": F.lit("x")})
