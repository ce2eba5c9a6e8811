"""Magic-byte sniffing: real signature bytes, RIFF form-type dispatch,
tag-sniffed html, unknown fallback, and Python-free plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.functions.magic import content_type


def _blobs(spark, items):
    return spark.createDataFrame(
        [(k, bytearray(v)) for k, v in items], "k string, blob binary"
    )


def test_known_signatures(spark):
    items = [
        ("png", b"\x89PNG\r\n\x1a\npayload"),
        ("jpeg", b"\xff\xd8\xff\xe1exif"),
        ("gif87", b"GIF87apix"),
        ("pdf", b"%PDF-1.4 obj"),
        ("gzip", b"\x1f\x8b\x08rest"),
        ("zip", b"PK\x03\x04data"),
        ("bmp", b"BMxxxx"),
        ("wav", b"RIFF\x10\x00\x00\x00WAVEfmt "),
        ("webp", b"RIFF\x10\x00\x00\x00WEBPVP8 "),
        ("avi", b"RIFF\x10\x00\x00\x00AVI LIST"),
        ("riff-other", b"RIFF\x10\x00\x00\x00XXXX"),
        ("mp4", b"\x00\x00\x00\x18ftypisom"),
        ("html-doctype", b"  <!DOCTYPE HTML><html>"),
        ("html-tag", b"<HTML><body>"),
        ("unknown", b"\x00\x01\x02\x03plain?"),
        ("short", b"PK"),  # truncated signature: not a zip
    ]
    out = {r.k: r.t for r in _blobs(spark, items).select(
        "k", content_type("blob").alias("t")).collect()}
    assert out == {
        "png": "png", "jpeg": "jpeg", "gif87": "gif", "pdf": "pdf",
        "gzip": "gzip", "zip": "zip", "bmp": "bmp", "wav": "wav",
        "webp": "webp", "avi": "avi", "riff-other": "riff", "mp4": "mp4",
        "html-doctype": "html", "html-tag": "html",
        "unknown": "unknown", "short": "unknown",
    }


def test_plan_is_python_free(spark):
    df = _blobs(spark, [("x", b"PK\x03\x04")]).select(content_type("blob"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
