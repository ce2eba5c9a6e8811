"""Byte-stream framings — HTTP/1.1 chunked transfer + RFC 6587 syslog.

Two framings that sit UNDER decoders this repo already has:

- **HTTP/1.1 chunked transfer-coding** (public RFC 9112 §7.1): crawled
  responses frequently arrive ``Transfer-Encoding: chunked`` — hex
  chunk-size line (optionally ``;ext=...`` extensions) CRLF, chunk
  bytes, CRLF, repeated, terminated by a 0-size chunk and optional
  trailer fields.  The WARC path (sources/warc.py) hands bodies
  through verbatim; this decoder reconstitutes the entity bytes so
  the html/text stages see the real payload.

- **RFC 6587 octet-counting**: syslog over TCP frames each message as
  ``MSG-LEN SP MSG`` back-to-back on the stream; a receiver must split
  frames before ``decode_syslog`` can parse lines.  (The RFC's other
  mode — LF trailer framing — is a plain ``split('\\n')``, already
  covered by line readers.)

Both are inherently sequential WITHIN one value (each frame's length
is data the previous frame reveals) and embarrassingly parallel across
values — so the right Spark shape is an Arrow-batched pandas UDF per
body/stream, zero shuffles, with malformed framing surfacing as NULL
(chunked) or a partial-frames + ``leftover`` split (octet counting),
never a task crash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def decode_chunked_body(col) -> Column:
    """chunked-coded bytes -> entity bytes; NULL on malformed framing
    (bad size line, truncated chunk, missing final 0-chunk).  The UDF
    is built lazily — pandas_udf schemas need a live session, so no
    decoration at import time."""
    import pandas as pd

    def one(b):
        if b is None:
            return None
        buf = bytes(b)
        out = bytearray()
        pos = 0
        while True:
            eol = buf.find(b"\r\n", pos)
            if eol < 0:
                return None
            size_token = buf[pos:eol].split(b";", 1)[0].strip()
            try:
                n = int(size_token, 16)
            except ValueError:
                return None
            pos = eol + 2
            if n == 0:
                # trailer section: either absent at EOF, or zero or more
                # "name: value" CRLF lines closed by the blank-line CRLF
                # with nothing after it — anything else is malformed
                # framing and yields NULL like every other torn body
                rest = buf[pos:]
                if rest == b"":
                    return bytes(out)
                tpos = 0
                while True:
                    teol = rest.find(b"\r\n", tpos)
                    if teol < 0:
                        return None
                    if teol == tpos:  # blank line terminates trailers
                        return bytes(out) if teol + 2 == len(rest) else None
                    if b":" not in rest[tpos:teol]:
                        return None
                    tpos = teol + 2
            if pos + n + 2 > len(buf):
                return None
            out += buf[pos : pos + n]
            if buf[pos + n : pos + n + 2] != b"\r\n":
                return None
            pos += n + 2

    @pandas_udf("binary")
    def _udf(bodies):
        return pd.Series([one(b) for b in bodies])

    return _udf(col)


def encode_chunked_body(data: Column, chunk_size: Column) -> Column:
    """The inverse, as pure JVM expressions (fixture/exporter side):
    split ``data`` (binary) into ``chunk_size``-byte chunks rendered as
    hex-size CRLF chunk CRLF ... 0 CRLF CRLF."""
    n = F.length(data)
    idxs = F.sequence(
        F.lit(0), F.when(n > 0, (n - 1) / chunk_size).otherwise(F.lit(0)).cast("int")
    )
    chunks = F.transform(
        idxs,
        lambda i: F.concat(
            F.encode(
                F.concat(
                    F.lower(
                        F.conv(
                            F.least(chunk_size, n - i * chunk_size).cast("string"),
                            10,
                            16,
                        )
                    ),
                    F.lit("\r\n"),
                ),
                "UTF-8",
            ),
            F.substring(data, (i * chunk_size + 1).cast("int"), chunk_size.cast("int")),
            F.encode(F.lit("\r\n"), "UTF-8"),
        ),
    )
    tail = F.encode(F.lit("0\r\n\r\n"), "UTF-8")
    empty = F.when(n == 0, tail)
    # binary-safe fold (concat_ws is a STRING join and would mangle bytes)
    joined = F.aggregate(
        chunks, F.lit(b""), lambda acc, x: F.concat(acc, x)
    )
    return F.coalesce(empty, F.concat(joined, tail))


def split_octet_frames(col) -> Column:
    """RFC 6587 octet-counted stream -> complete frames + trailing
    partial ("leftover", the next read's prefix) + count of framing
    errors skipped by resynchronizing at the next digit run."""
    import pandas as pd

    def one(s):
        if s is None:
            return {"frames": None, "leftover": None, "n_bad": 0}
        frames, bad = [], 0
        pos = 0
        while pos < len(s):
            sp = s.find(" ", pos)
            head = s[pos:sp] if sp > 0 else ""
            if sp < 0:
                break  # partial length header -> leftover
            if not head.isdigit() or len(head) > 9:
                bad += 1
                # resync: skip to the next space-delimited digit run
                nxt = pos + 1
                while nxt < len(s) and not s[nxt].isdigit():
                    nxt += 1
                pos = nxt
                continue
            n = int(head)
            if sp + 1 + n > len(s):
                break  # incomplete frame -> leftover
            frames.append(s[sp + 1 : sp + 1 + n])
            pos = sp + 1 + n
        return {"frames": frames, "leftover": s[pos:], "n_bad": bad}

    @pandas_udf("struct<frames: array<string>, leftover: string, n_bad: int>")
    def _udf(streams):
        return pd.DataFrame([one(s) for s in streams])

    return _udf(col)


def encode_octet_frames(msgs: Column) -> Column:
    """array<string> messages -> one RFC 6587 octet-counted stream
    (pure JVM: length SP message concatenated)."""
    return F.concat_ws(
        "",
        F.transform(
            msgs,
            lambda m: F.concat(F.length(m).cast("string"), F.lit(" "), m),
        ),
    )
