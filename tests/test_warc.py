"""WARC + nested HTTP parsing: header case-insensitivity, header maps,
payload byte boundaries, malformed records."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.sources.warc import (
    generate_warc_records,
    parse_http_response,
    parse_warc_records,
)

REC = (
    b"WARC/1.0\r\n"
    b"warc-type: response\r\n"            # lowercase field name
    b"WARC-Target-URI: https://h.io/a\r\n"
    b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
    b"Content-Length: 58\r\n"
    b"\r\n"
    b"HTTP/1.1 301 Moved\r\n"
    b"LOCATION: https://h.io/b\r\n"       # uppercase HTTP header
    b"Content-Type: TEXT/HTML; charset=x\r\n"
    b"\r\n"
    b"<p>body with\r\n\r\nblank line</p>"  # blank line INSIDE the body
)


def _df(spark, recs):
    return spark.createDataFrame(
        [(i, bytearray(r)) for i, r in enumerate(recs)], "rec_id long, record binary"
    )


def test_warc_fields_and_payload_boundary(spark):
    out = parse_warc_records(_df(spark, [REC])).collect()[0]
    assert out.warc_type == "response"
    assert out.target_uri == "https://h.io/a"
    assert str(out.warc_date) == "2026-01-02 03:04:05"
    assert out.content_length == 58
    # payload starts right after the FIRST blank line and keeps its own
    assert bytes(out.payload).startswith(b"HTTP/1.1 301")
    assert b"\r\n\r\nblank line" in bytes(out.payload)
    # header map: lowercased names, values kept verbatim
    assert out.warc_headers["warc-target-uri"] == "https://h.io/a"
    assert out.warc_headers["content-length"] == "58"


def test_http_response_fields_and_header_map(spark):
    rec = parse_warc_records(_df(spark, [REC]))
    out = parse_http_response(rec).collect()[0]
    assert out.http_status == 301
    assert out.http_content_type == "text/html"  # params stripped, lowered
    assert out.http_headers["location"] == "https://h.io/b"
    assert bytes(out.body) == b"<p>body with\r\n\r\nblank line</p>"


def test_duplicate_headers_first_wins_not_error(spark):
    # two Set-Cookie lines are legal (RFC 9110) and common; a naive
    # map_from_arrays raises DUPLICATED_MAP_KEY and kills the job
    rec = REC.replace(
        b"LOCATION: https://h.io/b\r\n",
        b"Set-Cookie: a=1\r\nSet-Cookie: b=2\r\nLOCATION: https://h.io/b\r\n",
    )
    out = parse_http_response(parse_warc_records(_df(spark, [rec]))).collect()[0]
    assert out.http_headers["set-cookie"] == "a=1"  # first occurrence wins
    assert out.http_headers["location"] == "https://h.io/b"


def test_malformed_record_yields_nulls_not_errors(spark):
    out = parse_warc_records(_df(spark, [b"not a warc record at all"])).collect()[0]
    assert out.warc_type is None and out.target_uri is None
    assert out.content_length is None and bytes(out.payload) == b""


def test_fixture_content_length_matches_payload(spark):
    rec = parse_warc_records(generate_warc_records(spark, 500))
    bad = rec.where(F.length("payload") != F.col("content_length")).count()
    assert bad == 0


def test_plans_python_free(spark):
    rec = parse_http_response(parse_warc_records(generate_warc_records(spark, 10)))
    plan = rec._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
