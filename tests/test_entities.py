"""HTML entity decoding: named/decimal/hex references, full-codepoint
UTF-8 construction, malformed references stay literal."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.functions.webtext import (
    decode_entities,
)


def _decode(spark, cases):
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    return [r.d for r in df.select(decode_entities(F.col("t")).alias("d")).collect()]


def test_named_decimal_hex_and_multibyte(spark):
    got = _decode(
        spark,
        [
            "Tom &amp; Jerry",
            "caf&#233; &#x20AC;9&nbsp;x",
            "&lt;b&gt; &quot;q&quot; &apos;a&apos;",
            "cjk &#x4E2D; emoji &#128512;",  # 3- and 4-byte UTF-8
        ],
    )
    assert got == [
        "Tom & Jerry",
        "café €9 x",
        "<b> \"q\" 'a'",
        "cjk 中 emoji \U0001f600",
    ]


def test_malformed_and_out_of_range_stay_literal(spark):
    cases = [
        "bad &unknown; trail &",
        "&#55296; &#1114112; &#0; keep",  # surrogate, > U+10FFFF, NUL
        "no entities at all",
        "&amp no semicolon",
        "",
    ]
    assert _decode(spark, cases) == cases[:1] + cases[1:2] + cases[2:]


def test_single_pass_semantics(spark):
    # standard reference semantics: decoding is one pass, '&amp;#65;'
    # yields the text '&#65;', not 'A'
    assert _decode(spark, ["&amp;#65;"]) == ["&#65;"]


def test_plan_python_free(spark):
    df = spark.createDataFrame([("x&amp;y",)], "t string")
    plan = (
        df.select(decode_entities(F.col("t")).alias("d"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
