"""Grok pattern compiler: %{SYNTAX:semantic[:type]} -> one combined regex.

The Logstash/Elastic-Agent parse front-end the reference's users write
their pipelines in (the collector docs express filelog/transform regex
extraction in grok terms; beats' dissect/grok processors are the same
surface).  ``functions/extract.py`` applies a hand-written combined regex;
this module COMPILES the grok notation users actually maintain into that
regex, so the existing JVM ``regexp_extract`` path (and its oracle-SQL
replay) stays the execution engine — the compiler is driver-side string
work, nothing per-row.

Compilation contract:

- ``%{NAME}``            -> the library pattern, non-capturing
- ``%{NAME:field}``      -> a capture group bound to ``field`` (string)
- ``%{NAME:field:int}``  -> same, cast to BIGINT (``:float`` -> DOUBLE)
- text outside ``%{}``   -> passed through verbatim (it is regex, as in
  grok; escape literals yourself — and prefer ``(?:`` for grouping:
  user-written capture groups shift nothing here because group indexes
  are resolved by compiling the FINAL regex, but they do surface in
  ``regexp_extract`` numbering on other consumers of the raw pattern)

The library below is deliberately RE2-safe — no backreferences, no
lookaround, no atomic groups (classic grok's QS uses them) — so one
compiled regex runs identically on Spark's Java regex engine, DuckDB's
RE2, and Python ``re``: the property every oracle gate in this repo
depends on.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2-safe core library.  Values may reference other entries with %{NAME}
# (expanded recursively, cycles rejected).
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NONNEGINT": r"\d+",
    "POSINT": r"[1-9]\d*",
    "BASE10NUM": r"[+-]?(?:\d+\.\d+|\d+|\.\d+)",
    "NUMBER": r"%{BASE10NUM}",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "EMAILADDRESS": r"[a-zA-Z0-9._%+-]+@%{HOSTNAME}",
    "IPV4": r"(?:25[0-5]|2[0-4]\d|[01]?\d?\d)(?:\.(?:25[0-5]|2[0-4]\d|[01]?\d?\d)){3}",
    "HOSTNAME": (
        r"[A-Za-z0-9](?:[A-Za-z0-9-]{0,62}[A-Za-z0-9])?"
        r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,62}[A-Za-z0-9])?)*"
    ),
    "IPORHOST": r"(?:%{IPV4}|%{HOSTNAME})",
    "LOGLEVEL": (
        r"(?:TRACE|DEBUG|INFO|NOTICE|WARN|WARNING|ERROR|ERR|CRIT|CRITICAL"
        r"|ALERT|FATAL|EMERG)"
    ),
    "TIMESTAMP_ISO8601": (
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:[.,]\d+)?"
        r"(?:Z|[+-]\d{2}:?\d{2})?"
    ),
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "QS": r'"[^"]*"',
    "QUOTEDSTRING": r"%{QS}",
    "URIPATH": r"/[^\s?#]*",
    "URIPARAM": r"\?[^\s#]*",
    "HTTPMETHOD": r"(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH|TRACE|CONNECT)",
    "UUID": r"[0-9a-fA-F]{8}(?:-[0-9a-fA-F]{4}){3}-[0-9a-fA-F]{12}",
}

_TOKEN_RE = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}")
_CAST = {"int": "long", "float": "double", "long": "long", "double": "double"}


def _expand(name: str, library: dict[str, str], seen: tuple[str, ...]) -> str:
    """Resolve a library pattern to plain regex, recursively, cycle-safe."""
    if name not in library:
        raise ValueError(f"unknown grok pattern %{{{name}}}")
    if name in seen:
        raise ValueError(
            f"grok pattern cycle: {' -> '.join(seen)} -> {name}"
        )

    def sub(m: re.Match) -> str:
        if m.group(2):
            raise ValueError(
                f"library pattern %{{{name}}} may not bind fields"
            )
        return f"(?:{_expand(m.group(1), library, seen + (name,))})"

    return _TOKEN_RE.sub(sub, library[name])


def grok_compile(
    pattern: str,
    extra_patterns: dict[str, str] | None = None,
) -> tuple[str, list[tuple[str, int, str]]]:
    """Compile a grok expression to ``(regex, fields)`` where ``fields`` is
    ``[(field_name, capture_group_index, spark_type), ...]``.

    Group indexes are authoritative: the final regex is compiled with
    Python ``re`` using named groups, indexes read from ``groupindex``
    (so user-written ``(`` groups in pass-through text are counted), then
    names are stripped — the returned regex uses plain ``(`` groups and
    runs on Java regex, RE2, and ``re`` alike.
    """
    library = {**GROK_PATTERNS, **(extra_patterns or {})}
    fields: list[tuple[str, str]] = []  # (field, type)

    def sub(m: re.Match) -> str:
        name, field, typ = m.group(1), m.group(2), m.group(3)
        body = _expand(name, library, ())
        if field is None:
            return f"(?:{body})"
        if typ is not None and typ not in _CAST:
            raise ValueError(f"unsupported grok cast :{typ}")
        if any(f == field for f, _ in fields):
            raise ValueError(f"duplicate grok field {field!r}")
        fields.append((field, _CAST.get(typ or "", "string")))
        return f"(?P<{field}>{body})"

    named = _TOKEN_RE.sub(sub, pattern)
    compiled = re.compile(named)  # validates; counts ALL capture groups
    out = [
        (field, compiled.groupindex[field], typ) for field, typ in fields
    ]
    # strip names: Java accepts (?<n>...) but not (?P<n>...); plain groups
    # keep the numbering groupindex already resolved
    plain = re.sub(r"\(\?P<\w+>", "(", named)
    return plain, out


def grok_compile_named(
    pattern: str,
    extra_patterns: dict[str, str] | None = None,
) -> tuple[str, list[tuple[str, int, str]]]:
    """Like ``grok_compile`` but keeps the Python/RE2 named groups —
    the form ``pandas.Series.str.extract`` consumes."""
    plain, fields = grok_compile(pattern, extra_patterns)  # validates once
    library = {**GROK_PATTERNS, **(extra_patterns or {})}

    def sub(m: re.Match) -> str:
        name, field, _typ = m.group(1), m.group(2), m.group(3)
        body = _expand(name, library, ())
        return f"(?:{body})" if field is None else f"(?P<{field}>{body})"

    return _TOKEN_RE.sub(sub, pattern), fields


def grok_extract(
    text: Column,
    pattern: str,
    extra_patterns: dict[str, str] | None = None,
) -> Column:
    """Apply a grok pattern as a JVM struct expression: one
    ``regexp_extract`` per bound field (whole-stage codegen, no Python),
    '' normalized to NULL, ``:int``/``:float`` casts applied.

    Same execution shape as ``extract.extract_log_sql`` — grok is the
    authoring notation, not a new engine.  The compiled regex replays
    byte-identically in DuckDB ``regexp_extract(col, regex, idx)``.

    Cost note: the compiled regex is applied in ONE JVM pass for the
    whole field list (``extract.regexp_extract_multi`` — the
    delimiter-replacement trick), not one ``regexp_extract`` pass per
    field: on the 11-field Apache pattern that is ~11x less regex work
    per row with an identical first-match result (r6; guide §1.2).
    ``grok_extract_pandas`` remains for deployments that prefer the
    Arrow batch path; both engines stay byte-identical.
    """
    from .extract import struct_extract_multi

    regex, fields = grok_compile(pattern, extra_patterns)
    if not fields:
        raise ValueError("grok pattern binds no fields")
    return struct_extract_multi(text, regex, fields)


def grok_extract_pandas(
    pattern: str,
    extra_patterns: dict[str, str] | None = None,
):
    """The single-pass Arrow path for WIDE grok patterns: one compiled
    regex applied once per batch (``Series.str.extract``), all fields
    captured together — O(1) regex passes instead of one per field.
    Returns a ``pandas_udf`` producing the same typed struct as
    ``grok_extract`` (``:int`` -> nullable BIGINT, ``:float`` -> DOUBLE,
    no-match -> all-NULL row).  Prefer the JVM form below ~6 fields;
    prefer this one above (bench: BENCH/BASELINE.md session g).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    named, fields = grok_compile_named(pattern, extra_patterns)
    if not fields:
        raise ValueError("grok pattern binds no fields")
    compiled = re.compile(named)
    spark_types = {"string": StringType(), "long": LongType(), "double": DoubleType()}
    schema = StructType(
        [StructField(f, spark_types[t]) for f, _, t in fields]
    )

    def _extract(text):
        out = text.str.extract(compiled)[[f for f, _, _ in fields]]
        for f, _, t in fields:
            if t == "long":
                out[f] = pd.to_numeric(out[f], errors="coerce").astype("Int64")
            elif t == "double":
                out[f] = pd.to_numeric(out[f], errors="coerce").astype("float64")
        return out.where(pd.notna(out), None)

    # annotate with live objects: the module uses `from __future__ import
    # annotations`, so inline hints would reach pandas_udf as unresolvable
    # strings
    _extract.__annotations__ = {"text": pd.Series, "return": pd.DataFrame}
    return pandas_udf(schema)(_extract)
