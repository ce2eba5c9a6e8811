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
