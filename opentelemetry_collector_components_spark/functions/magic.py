"""Content-type sniffing from magic bytes — the first gate of any
multimodal ingestion path.

A Common-Crawl-style corpus's ``html: binary`` column (BASELINE.json
input_hint) is only *nominally* html: real crawls interleave images,
PDFs, media containers, and compressed payloads, and the decode router
(``operators/multimodal.py``) must dispatch on what the bytes ARE, not
what the URL claims.  Sniffing is the standard first step (the same
file-signature table `file`/libmagic and browsers use — public,
well-known byte prefixes).

Everything is JVM column expressions over a fixed-width prefix:
``substring`` on BINARY, one ``hex`` transcription, literal prefix
compares — scan-fused, codegen'd, no UDF, and the parquet scan reads
only the binary column's first bytes worth of pages it would read
anyway (binary columns are not chunk-prunable, but no Python ever sees
the payload).

Detected: png jpeg gif pdf gzip zip bmp wav webp avi mp4 riff html
(tag-sniffed text) — 'unknown' otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_type(blob) -> Column:
    """Sniffed label for a binary column (column or name)."""
    b = F.col(blob) if isinstance(blob, str) else blob
    # first 16 bytes as uppercase hex: all signature tests index into this
    head = F.hex(F.substring(b, 1, 16))
    riff_tag = F.substring(head, 17, 8)  # bytes 9-12 (RIFF form type)
    ftyp = F.substring(head, 9, 8)  # bytes 5-8 (ISO-BMFF 'ftyp')
    text_head = F.lower(F.ltrim(F.substring(b, 1, 64).cast("string")))
    return (
        F.when(head.startswith("89504E470D0A1A0A"), F.lit("png"))
        .when(head.startswith("FFD8FF"), F.lit("jpeg"))
        .when(
            head.startswith("474946383761") | head.startswith("474946383961"),
            F.lit("gif"),
        )
        .when(head.startswith("25504446"), F.lit("pdf"))
        .when(head.startswith("1F8B"), F.lit("gzip"))
        .when(
            head.startswith("504B0304")
            | head.startswith("504B0506")
            | head.startswith("504B0708"),
            F.lit("zip"),
        )
        .when(
            head.startswith("52494646"),
            F.when(riff_tag == "57415645", F.lit("wav"))
            .when(riff_tag == "57454250", F.lit("webp"))
            .when(riff_tag == "41564920", F.lit("avi"))
            .otherwise(F.lit("riff")),
        )
        .when(ftyp == "66747970", F.lit("mp4"))
        .when(head.startswith("424D"), F.lit("bmp"))
        .when(
            text_head.startswith("<!doctype html") | text_head.startswith("<html"),
            F.lit("html"),
        )
        .otherwise(F.lit("unknown"))
    )
