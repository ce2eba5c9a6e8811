"""Lateness/watermark audit: planted disorder, percentile convention,
single-event keys, tie determinism."""

from datetime import datetime, timedelta

import pytest

from opentelemetry_collector_components_spark.operators.lateness import (
    lateness_profile,
)

BASE = datetime(2026, 1, 1)


def _rows(key, offsets):
    return [(key, i, BASE + timedelta(seconds=s)) for i, s in enumerate(offsets)]


def test_planted_disorder_reference(spark):
    offsets = [0, 10, 20, 30, -90, 50, 60, 31, 80, 90]
    df = spark.createDataFrame(
        _rows("k", offsets) + [("single", 0, BASE)], ["k", "arr", "ts"]
    )
    out = {r["k"]: r for r in lateness_profile(df, ["k"], "arr", "ts").collect()}

    lat, m = [], None
    for s in offsets:
        lat.append(max(0, m - s) if m is not None else 0)
        m = s if m is None else max(m, s)
    sl = sorted(lat)
    n = len(sl)
    r = out["k"]
    assert r["n"] == n and r["n_late"] == sum(1 for x in lat if x > 0)
    assert r["late_ppm"] == (r["n_late"] * 1_000_000) // n
    assert r["max_late_s"] == max(lat)
    assert r["p95_late_s"] == sl[-(-n * 95 // 100) - 1]
    assert r["p99_late_s"] == sl[-(-n * 99 // 100) - 1]
    assert out["single"] == (
        out["single"].__class__(
            k="single",
            n=1,
            n_late=0,
            late_ppm=0,
            max_late_s=0,
            p95_late_s=0,
            p99_late_s=0,
        )
    )


def test_in_order_stream_all_zero(spark):
    df = spark.createDataFrame(_rows("ok", list(range(0, 500, 5))), ["k", "arr", "ts"])
    r = lateness_profile(df, ["k"], "arr", "ts").collect()[0]
    assert (r["n_late"], r["max_late_s"], r["p99_late_s"]) == (0, 0, 0)


def test_percentile_is_admitting_watermark(spark):
    # 100 events: 97 on time, 3 late by 60/120/600 -> p99 lateness is the
    # 99th-smallest = 120; a 120 s watermark admits 99 of 100
    offsets = list(range(0, 970, 10))
    offsets += [offsets[-1] - 60, offsets[-1] - 120, offsets[-1] - 600]
    df = spark.createDataFrame(_rows("k", offsets), ["k", "arr", "ts"])
    r = lateness_profile(df, ["k"], "arr", "ts").collect()[0]
    assert r["n"] == 100 and r["n_late"] == 3
    assert r["p99_late_s"] == 120 and r["max_late_s"] == 600


def test_validation(spark):
    df = spark.createDataFrame([("a", 1, BASE)], ["k", "arr", "ts"])
    with pytest.raises(ValueError, match="key_cols"):
        lateness_profile(df, [], "arr", "ts")
