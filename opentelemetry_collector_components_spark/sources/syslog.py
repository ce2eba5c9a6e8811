"""Syslog line decode — RFC 5424 and RFC 3164 (BSD) wire formats.

The one log wire format the reference's beats codecs (extension/
beatsencodingextension/extension.go:112 text codec) hand downstream
undecoded: a collector deployed against network gear, appliances, or
rsyslog relays receives `<PRI>`-framed lines, and the parse stage must
split PRI into facility/severity, recover the timestamp (RFC 3164 has
no year — callers supply one), and expose host/app/procid/msgid/
structured-data/message as typed columns before enrich/route.

Format dispatch is per line: `<PRI>VERSION ` (digit + space after the
PRI bracket) selects RFC 5424, anything else falls back to the BSD
shape `<PRI>MMM dd HH:mm:ss host tag[pid]: msg`.  Lines matching
neither shape survive with ``valid = false`` and every parsed column
NULL except ``raw`` — a log pipeline never drops undecodable input
silently (same contract as the intake NDJSON decoder's error rows).

Timestamp semantics:
- RFC 5424 TIMESTAMP is ISO 8601; the JVM string→timestamp cast
  accepts the full profile (T separator, fractional seconds, Z or
  numeric offsets), yielding microsecond precision.
- RFC 3164 carries `MMM dd HH:mm:ss` only — second precision, no
  year.  ``default_year`` (caller-supplied, e.g. the ingest date's
  year) completes it; the day may be space-padded per the RFC.

NILVALUE ``-`` in 5424 HOSTNAME/APP-NAME/PROCID/MSGID/SD decodes to
NULL (SD keeps the raw bracket text otherwise — param parsing is a
downstream ``from_json``-style concern, not the line decoder's).

Scale shape: pure column expressions — two ``regexp_extract`` passes
fused into the scan, zero shuffle, zero UDF; whole-stage codegen keeps
the regex in the JVM.  At 10^12 lines this is embarrassingly parallel
and bounded by scan bandwidth, exactly like ``decode_csv``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEVERITY_NAMES = [
    "emerg", "alert", "crit", "err",
    "warning", "notice", "info", "debug",
]

FACILITY_NAMES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "audit", "alert", "clock",
    "local0", "local1", "local2", "local3",
    "local4", "local5", "local6", "local7",
]

# RFC 5424: <PRI>VERSION SP TIMESTAMP SP HOSTNAME SP APP-NAME SP PROCID
# SP MSGID SP STRUCTURED-DATA [SP MSG].  SD is `-` or one-or-more
# `[...]` elements whose param values escape `]` as `\]` (hence the
# (?:[^\]\\]|\\.)* body — RE2-safe, no backreferences).
_RE_5424 = (
    r"^<(\d{1,3})>(\d{1,2}) (\S+) (\S+) (\S+) (\S+) (\S+) "
    r"(-|(?:\[(?:[^\]\\]|\\.)*\])+)(?: (.*))?$"
)

# RFC 3164: <PRI>MMM dd HH:mm:ss host tag[pid]: msg (day space-padded;
# tag is alnum up to the optional [pid] and the colon).
_RE_3164 = (
    r"^<(\d{1,3})>([A-Z][a-z]{2}) +(\d{1,2}) (\d{2}:\d{2}:\d{2}) "
    r"(\S+) ([^\s:\[]+)(?:\[(\d+)\])?: ?(.*)$"
)


def _nil(col: Column) -> Column:
    return F.when(col == "-", F.lit(None).cast("string")).otherwise(col)


def _name_lookup(names: list[str], idx: Column) -> Column:
    return F.element_at(F.array(*[F.lit(n) for n in names]), idx + 1)


def decode_syslog(
    lines: DataFrame,
    text_col: str = "value",
    default_year: int = 2024,
) -> DataFrame:
    """Decode syslog lines into typed columns.

    Output: raw, valid, format ('rfc5424'|'rfc3164'|NULL), pri,
    facility, severity, facility_name, severity_name, version (NULL
    for 3164), ts, host, app, procid, msgid, sd, msg.
    """
    from ..functions.extract import regexp_extract_multi

    # Both anchored patterns are applied in ONE regex pass each
    # (regexp_extract_multi, r6) and staged as array columns — the
    # multi-referenced non-cheap aliases are not inlined by
    # CollapseProject, so the per-line regex cost is 2 passes, not one
    # per extracted field (was ~10; guide §1.2).
    lines = lines.withColumns(
        {
            "_g5": regexp_extract_multi(
                F.col(text_col), _RE_5424, list(range(1, 10))
            ),
            "_g3": regexp_extract_multi(
                F.col(text_col), _RE_3164, list(range(1, 9))
            ),
        }
    )
    raw = F.col(text_col)
    is_5424 = raw.rlike(r"^<\d{1,3}>\d{1,2} ")

    def g5(i: int) -> Column:
        return F.element_at(F.col("_g5"), i)

    def g3(i: int) -> Column:
        return F.element_at(F.col("_g3"), i)

    # regexp_extract returns '' on no-match; PRI group is non-empty iff
    # the whole anchored pattern matched.
    m5 = g5(1) != ""
    m3 = g3(1) != ""
    matched = F.when(is_5424, m5).otherwise(m3)

    pri = F.when(is_5424, g5(1)).otherwise(g3(1)).cast("int")
    pri = F.when(matched & (pri <= 191), pri)  # 191 = 23*8+7, RFC cap
    valid = pri.isNotNull()
    facility = (pri / 8).cast("int")
    severity = pri % 8

    ts_5424 = g5(3).cast("timestamp")
    ts_3164 = F.to_timestamp(
        F.concat_ws(
            " ", F.lit(str(default_year)), g3(2), g3(3), g3(4)
        ),
        "yyyy MMM d HH:mm:ss",
    )

    return lines.select(
        raw.alias("raw"),
        valid.alias("valid"),
        F.when(
            pri.isNotNull(),
            F.when(is_5424, F.lit("rfc5424")).otherwise(F.lit("rfc3164")),
        ).alias("format"),
        pri.alias("pri"),
        facility.alias("facility"),
        severity.alias("severity"),
        _name_lookup(FACILITY_NAMES, facility).alias("facility_name"),
        _name_lookup(SEVERITY_NAMES, severity).alias("severity_name"),
        F.when(pri.isNotNull() & is_5424, g5(2).cast("int")).alias("version"),
        F.when(
            pri.isNotNull(),
            F.when(is_5424, ts_5424).otherwise(ts_3164),
        ).alias("ts"),
        F.when(
            pri.isNotNull(),
            F.when(is_5424, _nil(g5(4))).otherwise(g3(5)),
        ).alias("host"),
        F.when(
            pri.isNotNull(),
            F.when(is_5424, _nil(g5(5))).otherwise(g3(6)),
        ).alias("app"),
        F.when(
            pri.isNotNull(),
            F.when(is_5424, _nil(g5(6))).otherwise(
                F.when(g3(7) != "", g3(7))
            ),
        ).alias("procid"),
        F.when(pri.isNotNull() & is_5424, _nil(g5(7))).alias("msgid"),
        F.when(pri.isNotNull() & is_5424, _nil(g5(8))).alias("sd"),
        F.when(
            pri.isNotNull(),
            F.when(is_5424, g5(9)).otherwise(g3(8)),
        ).alias("msg"),
    )


def encode_syslog_5424(
    pri: Column,
    ts: Column,
    host: Column,
    app: Column,
    procid: Column,
    msgid: Column,
    sd: Column,
    msg: Column,
) -> Column:
    """The exporter direction: render columns as an RFC 5424 line
    (version 1, microsecond UTC timestamp, NULL fields as NILVALUE
    ``-``) — what a file/debug/syslog-relay sink writes.  Pure concat;
    ``decode_syslog(encode_syslog_5424(x))`` round-trips every field
    (message NULL becomes the absent-msg form).  The timestamp is
    rendered as the instant's UTC wall time regardless of the session
    timezone (date_format alone would emit LOCAL wall time under a
    hard-coded 'Z' — wrong by the zone offset in any non-UTC session);
    the 3164 encoder below deliberately keeps session-local wall time,
    because that format has no zone field and local time IS its
    convention."""
    nil = F.lit("-")

    def field(c: Column) -> Column:
        return F.coalesce(c.cast("string"), nil)

    utc_wall = F.to_utc_timestamp(ts, F.current_timezone())
    line = F.concat(
        F.lit("<"), pri.cast("int").cast("string"), F.lit(">1 "),
        F.date_format(utc_wall, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
        F.lit(" "),
        field(host), F.lit(" "), field(app), F.lit(" "),
        field(procid), F.lit(" "), field(msgid), F.lit(" "),
        F.coalesce(sd, nil),
    )
    return F.when(msg.isNull(), line).otherwise(
        F.concat(line, F.lit(" "), msg)
    )


def encode_syslog_3164(
    pri: Column,
    ts: Column,
    host: Column,
    tag: Column,
    procid: Column,
    msg: Column,
) -> Column:
    """BSD form: ``<PRI>MMM dd HH:mm:ss host tag[pid]: msg`` with the
    RFC's space-padded day; year and sub-second precision are dropped
    (that is the format — decode with the matching ``default_year``)."""
    return F.concat(
        F.lit("<"), pri.cast("int").cast("string"), F.lit(">"),
        F.date_format(ts, "MMM "),
        F.lpad(F.dayofmonth(ts).cast("string"), 2, " "), F.lit(" "),
        F.date_format(ts, "HH:mm:ss "),
        host, F.lit(" "), tag,
        F.when(
            procid.isNotNull(),
            F.concat(F.lit("["), procid.cast("string"), F.lit("]")),
        ).otherwise(F.lit("")),
        F.lit(": "), F.coalesce(msg, F.lit("")),
    )
