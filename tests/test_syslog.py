from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _decode(spark, lines):
    from opentelemetry_collector_components_spark.sources.syslog import decode_syslog

    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    return {r["raw"]: r.asDict() for r in decode_syslog(df).collect()}


def test_rfc5424_full(spark):
    ln = (
        '<165>1 2024-01-05T10:11:12.123456Z host7 app 4242 ID47 '
        '[ex@32473 k="v" esc="a\\]b"] hello world'
    )
    r = _decode(spark, [ln])[ln]
    assert r["valid"] and r["format"] == "rfc5424"
    assert (r["pri"], r["facility"], r["severity"]) == (165, 20, 5)
    assert r["facility_name"] == "local4" and r["severity_name"] == "notice"
    assert r["version"] == 1
    assert r["ts"] == dt.datetime(2024, 1, 5, 10, 11, 12, 123456)
    assert (r["host"], r["app"], r["procid"], r["msgid"]) == (
        "host7", "app", "4242", "ID47")
    assert r["sd"] == '[ex@32473 k="v" esc="a\\]b"]'
    assert r["msg"] == "hello world"


def test_rfc5424_nilvalues_no_msg(spark):
    ln = "<0>1 2024-02-01T00:00:00Z - - - - -"
    r = _decode(spark, [ln])[ln]
    assert r["valid"]
    assert (r["facility"], r["severity"]) == (0, 0)
    assert r["severity_name"] == "emerg" and r["facility_name"] == "kern"
    assert r["host"] is None and r["app"] is None
    assert r["procid"] is None and r["msgid"] is None and r["sd"] is None


def test_rfc3164_padded_day_and_pid(spark):
    ln = "<34>Jan  5 06:07:08 myhost su[123]: auth failure"
    r = _decode(spark, [ln])[ln]
    assert r["valid"] and r["format"] == "rfc3164"
    assert (r["facility"], r["severity"]) == (4, 2)
    assert r["severity_name"] == "crit" and r["facility_name"] == "auth"
    assert r["version"] is None and r["msgid"] is None and r["sd"] is None
    assert r["ts"] == dt.datetime(2024, 1, 5, 6, 7, 8)
    assert (r["host"], r["app"], r["procid"]) == ("myhost", "su", "123")
    assert r["msg"] == "auth failure"


def test_rfc3164_no_pid(spark):
    ln = "<13>Dec 25 23:59:59 h cron: tick"
    r = _decode(spark, [ln])[ln]
    assert r["valid"] and r["app"] == "cron" and r["procid"] is None
    assert r["msg"] == "tick"


def test_invalid_lines_survive(spark):
    lines = ["not syslog at all", "<192>1 2024-01-01T00:00:00Z h a p m -"]
    rows = _decode(spark, lines)
    for ln in lines:
        r = rows[ln]
        assert r["valid"] is False
        assert r["pri"] is None and r["ts"] is None and r["msg"] is None
        assert r["raw"] == ln


def test_default_year(spark):
    from opentelemetry_collector_components_spark.sources.syslog import decode_syslog

    df = spark.createDataFrame(
        [("<14>Mar  1 00:00:00 h app: x",)], "value string"
    )
    r = decode_syslog(df, default_year=1999).collect()[0]
    assert r["ts"] == dt.datetime(1999, 3, 1, 0, 0, 0)


def test_encode_decode_round_trip(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.sources.syslog import (
        decode_syslog,
        encode_syslog_3164,
        encode_syslog_5424,
    )

    src = spark.createDataFrame(
        [
            (165, "2024-03-05 10:11:12.123456", "h1", "app", "42",
             "ID7", '[ex@1 k="v"]', "hello world"),
            (14, "2024-03-05 10:11:12.123456", "h2", "cron", None,
             None, None, None),
        ],
        "pri int, ts_s string, host string, app string, procid string,"
        " msgid string, sd string, msg string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    enc = src.select(
        encode_syslog_5424(
            F.col("pri"), F.col("ts"), F.col("host"), F.col("app"),
            F.col("procid"), F.col("msgid"), F.col("sd"), F.col("msg"),
        ).alias("value")
    )
    dec = {r["host"]: r for r in decode_syslog(enc).collect()}
    r = dec["h1"]
    assert r["valid"] and r["pri"] == 165 and r["msg"] == "hello world"
    assert r["sd"] == '[ex@1 k="v"]' and r["procid"] == "42"
    import datetime as dt

    assert r["ts"] == dt.datetime(2024, 3, 5, 10, 11, 12, 123456)
    r = dec["h2"]
    assert r["valid"] and r["app"] == "cron"
    assert r["procid"] is None and r["sd"] is None

    enc3 = src.where(F.col("procid").isNotNull()).select(
        encode_syslog_3164(
            F.col("pri"), F.col("ts"), F.col("host"), F.col("app"),
            F.col("procid"), F.col("msg"),
        ).alias("value")
    )
    r3 = decode_syslog(enc3, default_year=2024).collect()[0]
    assert r3["valid"] and r3["format"] == "rfc3164"
    assert r3["ts"] == dt.datetime(2024, 3, 5, 10, 11, 12)
    assert r3["msg"] == "hello world" and r3["procid"] == "42"


def test_encode_5424_utc_under_non_utc_session(spark):
    """The exporter must emit the instant's UTC wall time even when the
    session timezone is not UTC (a bare date_format would emit local
    wall time under a hard-coded 'Z')."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.sources.syslog import (
        encode_syslog_5424,
    )

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        df = spark.createDataFrame([("2024-03-05T10:11:12.000000Z",)],
                                   "iso string")
        out = df.select(
            encode_syslog_5424(
                F.lit(14), F.col("iso").cast("timestamp"), F.lit("h"),
                F.lit("app"), F.lit(None), F.lit(None),
                F.lit(None).cast("string"), F.lit("x"),
            ).alias("line")
        ).collect()[0]["line"]
        assert "2024-03-05T10:11:12.000000Z" in out
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
