"""gzip content-encoding for HTTP transport bodies (stdlib zlib).

OTLP/HTTP and most collector receivers accept ``Content-Encoding: gzip``
bodies; the PRW path's snappy (``snappy_codec.py``) has a hand-rolled
codec because snappy is not in the stdlib — gzip IS (zlib), so these are
thin deterministic wrappers, kept in one module so every decoder imports
the same pair and the wire contract has a single home.

Decompression is byte-exact regardless of zlib version; COMPRESSED bytes
are only guaranteed stable for a fixed zlib build, so nothing hashes
compressed output — gates and tests always round-trip."""

from __future__ import annotations

import gzip as _gzip


def gzip_compress(data: bytes, level: int = 6) -> bytes:
    # mtime pinned to 0: the gzip header embeds a timestamp otherwise,
    # making identical payloads produce different bytes across runs
    return _gzip.compress(data, compresslevel=level, mtime=0)


def gzip_decompress(data: bytes) -> bytes:
    return _gzip.decompress(data)
