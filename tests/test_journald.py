"""journald export format: framing round trips incl. binary values,
torn-blob rejection per framing rule, distributed intake."""

from __future__ import annotations

import struct

import pytest

from opentelemetry_collector_components_spark.sources.journald import (
    parse_export,
)


def test_text_and_binary_fields():
    blob = (
        b"__REALTIME_TIMESTAMP=1000\nPRIORITY=3\nMESSAGE=hello\n\n"
        b"__REALTIME_TIMESTAMP=2000\nMESSAGE\n"
        + struct.pack("<Q", 11) + b"line1\nline2" + b"\n\n"
    )
    e = parse_export(blob)
    assert len(e) == 2
    assert e[0]["MESSAGE"] == b"hello" and e[0]["PRIORITY"] == b"3"
    assert e[1]["MESSAGE"] == b"line1\nline2"  # newline survives framing


def test_value_with_equals_and_final_entry_without_blank():
    e = parse_export(b"A=x=y\nB=1\n")
    assert e == [{"A": b"x=y", "B": b"1"}]


def test_framing_rejections():
    with pytest.raises(ValueError, match="truncated mid-line"):
        parse_export(b"A=1\nNOEOL")
    with pytest.raises(ValueError, match="size prefix"):
        parse_export(b"MESSAGE\n\x05\x00")
    with pytest.raises(ValueError, match="overruns"):
        parse_export(b"MESSAGE\n" + struct.pack("<Q", 99) + b"short\n")
    with pytest.raises(ValueError, match="missing newline"):
        parse_export(b"MESSAGE\n" + struct.pack("<Q", 2) + b"okX")


def test_distributed_roundtrip(spark):
    from opentelemetry_collector_components_spark.sources.journald import (
        decode_journal_export,
        generate_journal_export,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dec = decode_journal_export(generate_journal_export(ev))
    assert dec.where("NOT valid").count() == 0
    assert dec.count() == ev.count()
    assert (
        dec.where("msg_was_binary").count()
        == ev.where("event_id % 11 = 0").count()
    )


def test_tear_preserves_prior_entries(spark):
    from opentelemetry_collector_components_spark.sources.journald import (
        decode_journal_export,
    )

    good = b"__REALTIME_TIMESTAMP=1000\nMESSAGE=ok\n\n"
    torn = good * 3 + b"MESSAGE\n\x05\x00"  # truncated size prefix
    badentry = good + b"PRIORITY=3\nMESSAGE=no-ts\n\n" + good
    df = spark.createDataFrame([(torn,), (badentry,)], "body binary")
    rows = decode_journal_export(df).collect()
    ok = [r for r in rows if r.valid]
    bad = [r for r in rows if not r.valid]
    # torn blob: 3 yielded entries survive + 1 tear row;
    # bad-entry blob: 2 good survive + 1 invalid for the ts-less entry
    assert len(ok) == 5 and len(bad) == 2
