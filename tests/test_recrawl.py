"""Crawl snapshot delta semantics: presence via join side, null-safe
fingerprint compare, exact integer host change rates."""

from __future__ import annotations

from opentelemetry_collector_components_spark.operators.recrawl import (
    crawl_delta,
    host_change_rates,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, fp long")


def test_delta_statuses_and_null_safe_fp(spark):
    old = _snap(spark, [
        ("https://a.com/1", 10),     # unchanged
        ("https://a.com/2", 20),     # changed
        ("https://a.com/3", 30),     # removed
        ("https://a.com/4", None),   # present with NULL fp, still NULL -> unchanged
        ("https://a.com/5", None),   # NULL -> value = changed
    ])
    new = _snap(spark, [
        ("https://a.com/1", 10),
        ("https://a.com/2", 21),
        ("https://a.com/4", None),
        ("https://a.com/5", 55),
        ("https://a.com/6", 60),     # added
    ])
    got = {r.url: r.status for r in crawl_delta(old, new).collect()}
    assert got == {
        "https://a.com/1": "unchanged",
        "https://a.com/2": "changed",
        "https://a.com/3": "removed",
        "https://a.com/4": "unchanged",
        "https://a.com/5": "changed",
        "https://a.com/6": "added",
    }


def test_host_rates_exact_division(spark):
    old = _snap(spark, [("https://h.io/%d" % i, i) for i in range(3)])
    new = _snap(spark, [("https://h.io/0", 0), ("https://h.io/1", 99),
                        ("https://h.io/3", 3)])
    row = host_change_rates(crawl_delta(old, new)).collect()[0]
    # urls 0 unchanged, 1 changed, 2 removed, 3 added -> churn 3 of 4
    assert (row.host, row.n_added, row.n_removed, row.n_changed,
            row.n_unchanged, row.n_urls) == ("h.io", 1, 1, 1, 1, 4)
    assert row.change_ppm == 750_000


def test_schedule_fetches_slots_delays_and_default(spark):
    from opentelemetry_collector_components_spark.operators.recrawl import (
        schedule_fetches,
    )

    frontier = spark.createDataFrame(
        [
            (1, "https://a.com/x", 5),
            (2, "https://a.com/y", 9),
            (3, "https://a.com/z", 5),  # priority tie with 1 -> id breaks
            (4, "https://b.com/only", 1),
        ],
        "url_id long, url string, priority long",
    )
    delays = spark.createDataFrame(
        [("a.com", 10)], "host string, crawl_delay_s long"
    )
    out = schedule_fetches(
        frontier, delays, start_ts="2026-06-01 00:00:00", default_delay_s=2
    )
    rows = {r.url_id: r for r in out.collect()}
    # a.com: 2 (prio 9) slot 0, 1 slot 1, 3 slot 2 at 10s spacing
    assert [rows[i].slot for i in (2, 1, 3)] == [0, 1, 2]
    assert str(rows[1].scheduled_at) == "2026-06-01 00:00:10"
    assert str(rows[3].scheduled_at) == "2026-06-01 00:00:20"
    # b.com has no delay row -> default applies, slot 0 at start
    assert rows[4].slot == 0
    assert str(rows[4].scheduled_at) == "2026-06-01 00:00:00"


def test_refetch_decision_branches(spark):
    from opentelemetry_collector_components_spark.operators.recrawl import (
        refetch_decision,
    )

    from datetime import datetime

    one_hour_old = datetime(2026, 6, 1, 23, 0, 0)
    two_days_old = datetime(2026, 5, 31, 0, 0, 0)
    rows = [
        # (cache_control, etag, last_modified, fetched_at, expected)
        ("public, max-age=7200", None, None, one_hour_old, "fresh"),
        ("max-age=60", '"e1"', None, one_hour_old, "revalidate"),
        ("max-age=60", None, None, one_hour_old, "refetch"),
        ("no-store, max-age=999999", '"e2"', None, one_hour_old, "refetch"),
        ("no-cache, max-age=999999", None, "Sun, 31 May 2026", one_hour_old,
         "revalidate"),
        (None, None, None, two_days_old, "refetch"),
        # token boundary: 'no-storefront' is NOT the no-store directive
        ("no-storefront, max-age=7200", None, None, one_hour_old, "fresh"),
    ]
    df = spark.createDataFrame(
        [(f"u{i}", r[3], r[0], r[1], r[2]) for i, r in enumerate(rows)],
        "url string, fetched_at timestamp, cache_control string, "
        "etag string, last_modified string",
    )
    out = refetch_decision(df, now_ts="2026-06-02 00:00:00")
    got = {r.url: (r.decision, r.age_s) for r in out.collect()}
    for i, r in enumerate(rows):
        assert got[f"u{i}"][0] == r[4], f"u{i}: {got[f'u{i}']} != {r[4]}"
    assert got["u0"][1] == 3600


def test_allocate_crawl_budget_exact_and_ties(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.recrawl import (
        allocate_crawl_budget,
    )

    small = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1)], "host string, weight long"
    )
    got = {
        r.host: r.allocation
        for r in allocate_crawl_budget(small, 10).collect()
    }
    # 10/3: floors 3+3+3, one leftover; all remainders tie -> host asc
    assert got == {"a": 4, "b": 3, "c": 3}

    # even division: no leftover branch
    even = {
        r.host: r.allocation
        for r in allocate_crawl_budget(small, 9).collect()
    }
    assert even == {"a": 3, "b": 3, "c": 3}

    # budget x weight beyond LONG range must not overflow (decimal path)
    big = spark.createDataFrame(
        [("a", 10**15), ("b", 3 * 10**15), ("c", 10**14)],
        "host string, weight long",
    )
    out = allocate_crawl_budget(big, 10**9)
    assert out.agg(F.sum("allocation")).collect()[0][0] == 10**9

    # zero-weight hosts participate but can only receive from remainders
    withzero = spark.createDataFrame(
        [("a", 0), ("b", 5)], "host string, weight long"
    )
    gz = {
        r.host: r.allocation
        for r in allocate_crawl_budget(withzero, 7).collect()
    }
    assert gz == {"a": 0, "b": 7}


def test_allocate_crawl_budget_rejects_zero_total_weight(spark):
    import pytest

    from opentelemetry_collector_components_spark.operators.recrawl import (
        allocate_crawl_budget,
    )

    zero = spark.createDataFrame(
        [("a", 0), ("b", 0)], "host string, weight long"
    )
    with pytest.raises(ValueError, match="sum > 0"):
        allocate_crawl_budget(zero, 10)


def test_schedule_fetches_fractional_delay_millisecond_spacing(spark):
    from opentelemetry_collector_components_spark.operators.recrawl import (
        schedule_fetches,
    )

    # 'Crawl-delay: 0.5' must space fetches 500ms apart, not truncate to
    # zero spacing
    frontier = spark.createDataFrame(
        [(1, "https://a.com/x", 2), (2, "https://a.com/y", 1)],
        "url_id long, url string, priority long",
    )
    delays = spark.createDataFrame(
        [("a.com", 0.5)], "host string, crawl_delay_s double"
    )
    out = schedule_fetches(frontier, delays, start_ts="2026-06-01 00:00:00")
    rows = {r.url_id: str(r.scheduled_at) for r in out.collect()}
    assert rows[1] == "2026-06-01 00:00:00"
    assert rows[2] == "2026-06-01 00:00:00.500000"
