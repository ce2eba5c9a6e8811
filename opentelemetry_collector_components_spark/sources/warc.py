"""WARC record parsing: the Common Crawl wire format -> columns.

The corpus the pipeline is built over (BASELINE.json input_hint) is
distributed as WARC (ISO 28500): each record is a ``WARC/1.0`` header
block, CRLF-CRLF, then the payload — and for ``response`` records the
payload is itself an HTTP/1.1 message (status line, headers, CRLF-CRLF,
body).  Ingestion lands one record per row (the archive reader's natural
unit — splitting a raw .warc.gz by Content-Length is the reader's job,
not the engine's); this module turns those record blobs into the typed
columns the rest of the pipeline consumes: target URI, capture
timestamp, record type, the HTTP status / content-type, and the body
bytes.

All parsing is JVM column expressions — ``split_part`` at the first
blank line, ``regexp_extract`` per named header (header names are
case-insensitive per RFC 9110 / ISO 28500), one ``str_to_map`` for the
full header map — scan-fused, no UDF, embarrassingly parallel.  Header
VALUES keep their case; header NAMES are matched case-insensitively and
the map keys are lowercased (the HTTP/2 convention, stable for lookups).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"
_BLANK = "\r\n\r\n"


def _header_block(rec: Column) -> Column:
    return F.split_part(rec, F.lit(_BLANK), F.lit(1))


def _after_headers(rec: Column) -> Column:
    # everything past the FIRST blank line; split_part would also cut the
    # payload's own blank lines, so slice by the header block's length
    return F.substring(
        rec, F.length(_header_block(rec)) + len(_BLANK) + 1, F.lit(2147483647)
    )


def _header(block: Column, name: str) -> Column:
    got = F.regexp_extract(
        block, rf"(?im)^{name}:[ \t]*(.*?)[ \t\r]*$", 1
    )
    return F.when(got != "", got)


def header_map(block: Column) -> Column:
    """All headers of a CRLF block as map<lowercased name, value> (first
    line — the WARC version / HTTP status line — excluded).

    Repeated header names (two ``Set-Cookie`` lines, duplicated
    ``WARC-Concurrent-To``) are legal and common in real crawls; a bare
    ``map_from_arrays`` would throw DUPLICATED_MAP_KEY at the first such
    record and fail the job.  First occurrence wins (matching
    ``_header``'s anchored-regex behavior); the dedup fold is O(n^2) in
    the header count, which is tiny per record.
    """
    rest = F.substring(
        block,
        F.length(F.split_part(block, F.lit(CRLF), F.lit(1))) + len(CRLF) + 1,
        F.lit(2147483647),
    )
    pairs = F.filter(F.split(rest, CRLF), lambda l: l.contains(":"))
    entries = F.transform(
        pairs,
        lambda l: F.struct(
            F.lower(F.trim(F.split_part(l, F.lit(":"), F.lit(1)))).alias("key"),
            F.trim(
                F.substring(l, F.instr(l, ":") + 1, F.lit(2147483647))
            ).alias("value"),
        ),
    )
    deduped = F.aggregate(
        entries,
        F.expr("CAST(array() AS array<struct<key:string,value:string>>)"),
        lambda acc, e: F.when(
            F.exists(acc, lambda p: p["key"] == e["key"]), acc
        ).otherwise(F.concat(acc, F.array(e))),
    )
    return F.map_from_entries(deduped)


def parse_warc_records(
    df: DataFrame,
    record_col: str = "record",
) -> DataFrame:
    """One WARC record blob per row -> typed columns.

    Adds: ``warc_type``, ``target_uri``, ``warc_date`` TIMESTAMP,
    ``record_id``, ``content_length`` BIGINT (as declared),
    ``warc_headers`` map<string,string>, ``payload`` BINARY (bytes after
    the header block).  ``record_col`` may be binary or string.
    """
    rec = F.col(record_col).cast("string")
    block = _header_block(rec)
    return df.withColumns(
        {
            "warc_type": _header(block, "WARC-Type"),
            "target_uri": _header(block, "WARC-Target-URI"),
            "warc_date": F.to_timestamp(
                _header(block, "WARC-Date"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
            ),
            "record_id": _header(block, "WARC-Record-ID"),
            "content_length": _header(block, "Content-Length").cast("long"),
            "warc_headers": header_map(block),
            "payload": _after_headers(rec).cast("binary"),
        }
    )


def parse_http_response(
    df: DataFrame,
    payload_col: str = "payload",
) -> DataFrame:
    """HTTP/1.1 response payloads (WARC ``response`` records) -> columns.

    Adds: ``http_status`` INT, ``http_content_type`` (the media type
    only, parameters stripped, lowercased), ``http_headers``
    map<string,string>, ``body`` BINARY.
    """
    payload = F.col(payload_col).cast("string")
    block = _header_block(payload)
    status = F.regexp_extract(
        F.split_part(block, F.lit(CRLF), F.lit(1)), r"^HTTP/[0-9.]+ (\d{3})", 1
    )
    ctype = _header(block, "Content-Type")
    return df.withColumns(
        {
            "http_status": F.when(status != "", status).cast("int"),
            "http_content_type": F.lower(
                F.trim(F.split_part(ctype, F.lit(";"), F.lit(1)))
            ),
            "http_headers": header_map(block),
            "body": _after_headers(payload).cast("binary"),
        }
    )


def generate_warc_records(spark, n_rows: int) -> DataFrame:
    """Deterministic WARC fixture: every row is a real two-layer record
    (WARC headers + HTTP response + html body), fields pure functions of
    ``id``; every 10th record is a ``request`` record (no HTTP response
    inside), every 7th response carries a 404 and text/plain."""
    df = spark.range(n_rows)
    id_ = F.col("id")
    uri = F.concat(
        F.lit("https://d"), F.pmod(id_, F.lit(40)), F.lit(".example.org/p/"), id_
    )
    date = F.concat(
        F.lit("2026-01-01T"),
        F.lpad(F.pmod(id_, F.lit(24)), 2, "0"),
        F.lit(":00:"),
        F.lpad(F.pmod(id_, F.lit(60)), 2, "0"),
        F.lit("Z"),
    )
    body = F.concat(F.lit("<!DOCTYPE html><p>doc "), id_, F.lit("</p>"))
    is_request = F.pmod(id_, F.lit(10)) == 9
    is_404 = F.pmod(id_, F.lit(7)) == 0
    http = F.concat(
        F.when(is_404, F.lit("HTTP/1.1 404 Not Found\r\n")).otherwise(
            F.lit("HTTP/1.1 200 OK\r\n")
        ),
        F.when(is_404, F.lit("Content-Type: text/plain\r\n")).otherwise(
            F.lit("Content-Type: text/html; charset=UTF-8\r\n")
        ),
        # repeated header name (legal per RFC 9110, common in real
        # crawls) — header_map must first-wins, not throw
        F.when(
            F.pmod(id_, F.lit(5)) == 2,
            F.lit("Set-Cookie: a=1\r\nSet-Cookie: b=2\r\n"),
        ).otherwise(F.lit("")),
        F.lit("Server: fixture\r\n\r\n"),
        body,
    )
    request = F.concat(
        F.lit("GET /p/"), id_, F.lit(" HTTP/1.1\r\nHost: d"),
        F.pmod(id_, F.lit(40)), F.lit(".example.org\r\n\r\n"),
    )
    payload = F.when(is_request, request).otherwise(http)
    record = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: "),
        F.when(is_request, F.lit("request")).otherwise(F.lit("response")),
        F.lit("\r\nWARC-Target-URI: "), uri,
        F.lit("\r\nWARC-Date: "), date,
        F.lit("\r\nWARC-Record-ID: <urn:uuid:"), id_,
        F.lit(">\r\nContent-Length: "), F.length(payload),
        F.lit(_BLANK),
        payload,
    )
    return df.select(id_.alias("rec_id"), record.cast("binary").alias("record"))
