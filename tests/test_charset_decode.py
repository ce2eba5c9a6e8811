"""Charset-aware HTML byte decoding: BOM precedence, WHATWG label folds,
unknown-label fallback, NULL propagation, Arrow-only plan."""

from __future__ import annotations

from opentelemetry_collector_components_spark.sources.decoders import (
    _python_codec,
    decode_html_text,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, html binary")


def test_bom_beats_declared_label(spark):
    rows = [
        # UTF-8 BOM but meta claims latin1: BOM wins, é decodes as UTF-8
        (0, b'\xef\xbb\xbf<meta charset="latin1">caf\xc3\xa9'),
        (1, "﻿wide".encode("utf-16-le")),  # FF FE BOM
        (2, "﻿WIDE".encode("utf-16-be")),  # FE FF BOM
    ]
    got = {
        r.doc_id: r.text
        for r in decode_html_text(_docs(spark, rows)).collect()
    }
    assert got[0] == '<meta charset="latin1">café'
    assert got[1] == "wide"
    assert got[2] == "WIDE"


def test_unknown_label_falls_back_to_utf8_and_null_propagates(spark):
    rows = [
        (0, b'<meta charset="klingon-8">ok \xc3\xa9'),
        (1, None),
    ]
    got = {
        r.doc_id: r.text
        for r in decode_html_text(_docs(spark, rows)).collect()
    }
    assert got[0] == '<meta charset="klingon-8">ok é'
    assert got[1] is None


def test_explicit_charset_column_wins_over_sniffing(spark):
    df = spark.createDataFrame(
        [(0, b"caf\xe9", "iso-8859-1")],
        "doc_id long, html binary, enc string",
    )
    out = decode_html_text(df, charset_col="enc")
    assert out.collect()[0].text == "café"


def test_whatwg_label_folds():
    assert _python_codec("ISO-8859-1") == "cp1252"
    assert _python_codec("latin1") == "cp1252"
    assert _python_codec("US-ASCII") == "cp1252"
    assert _python_codec("UTF-8") == "utf-8"
    assert _python_codec(None) == "utf-8"
    assert _python_codec("no-such-codec") == "utf-8"


def test_plan_is_arrow_batched(spark):
    df = decode_html_text(_docs(spark, [(0, b"x")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
