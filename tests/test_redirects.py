"""Redirect chain walking: hop counting, relative Location resolution,
dangling targets, cycles at the hop bound, unfollowable redirects."""

from __future__ import annotations

import pytest

from opentelemetry_collector_components_spark.operators.redirects import (
    resolve_redirects,
)


def _log(spark, rows):
    return spark.createDataFrame(rows, "url string, status int, location string")


def test_chain_walk_and_outcomes(spark):
    rows = [
        ("https://h.io/a", 301, "/b"),                # relative hop
        ("https://h.io/b", 302, "https://h.io/c"),    # absolute hop
        ("https://h.io/c", 200, None),                # terminal
        ("https://h.io/d", 301, "https://other.net/x"),  # leaves the log
        ("https://h.io/e", 200, None),
    ]
    out = {r.url: (r.final_url, r.hops, r.outcome)
           for r in resolve_redirects(_log(spark, rows)).collect()}
    assert out["https://h.io/a"] == ("https://h.io/c", 2, "ok")
    assert out["https://h.io/b"] == ("https://h.io/c", 1, "ok")
    assert out["https://h.io/c"] == ("https://h.io/c", 0, "ok")
    assert out["https://h.io/d"] == ("https://other.net/x", 1, "dangling")
    assert out["https://h.io/e"] == ("https://h.io/e", 0, "ok")


def test_cycle_hits_hop_bound(spark):
    rows = [
        ("https://h.io/x", 301, "/y"),
        ("https://h.io/y", 301, "/x"),
    ]
    out = {r.url: (r.hops, r.outcome)
           for r in resolve_redirects(_log(spark, rows), max_hops=4).collect()}
    assert out == {"https://h.io/x": (4, "too_many"), "https://h.io/y": (4, "too_many")}
    with pytest.raises(ValueError):
        resolve_redirects(_log(spark, rows), max_hops=0)


def test_unfollowable_location_is_terminal_ok(spark):
    # a 301 with a missing or non-web Location cannot be followed
    rows = [
        ("https://h.io/m", 301, None),
        ("https://h.io/n", 301, "mailto:x@y.z"),
    ]
    out = {r.url: (r.final_url, r.hops, r.outcome)
           for r in resolve_redirects(_log(spark, rows)).collect()}
    assert out["https://h.io/m"] == ("https://h.io/m", 0, "ok")
    assert out["https://h.io/n"] == ("https://h.io/n", 0, "ok")


def test_null_status_with_location_terminates_ok(spark):
    # failed fetch: NULL status but a parseable Location — must terminate,
    # not be walked to the Location (and a chain INTO it must stop there)
    rows = [
        ("https://h.io/a", 301, "/f"),
        ("https://h.io/f", None, "/x"),
        ("https://h.io/x", 200, None),
    ]
    out = {r.url: (r.final_url, r.hops, r.outcome)
           for r in resolve_redirects(_log(spark, rows)).collect()}
    assert out["https://h.io/f"] == ("https://h.io/f", 0, "ok")
    assert out["https://h.io/a"] == ("https://h.io/f", 1, "ok")


def test_binary_decomposition_hop_caps(spark):
    # r6 pointer doubling: a linear 6-chain exercised at every cap 1..7 —
    # non-power-of-2 caps apply several power tables (T4 then T2 then T1),
    # and the cap boundary must label 'too_many' exactly when the walk is
    # still on a redirect row after `cap` followed redirects.
    chain = [
        (f"https://h.io/{i}", 301, f"/{i + 1}") for i in range(6)
    ] + [("https://h.io/6", 200, None)]
    for cap in range(1, 8):
        out = {
            r.url: (r.final_url, r.hops, r.outcome)
            for r in resolve_redirects(_log(spark, chain), max_hops=cap).collect()
        }
        for start in range(7):
            dist = 6 - start  # redirects between start and the terminal
            if dist <= cap:
                assert out[f"https://h.io/{start}"] == (
                    "https://h.io/6", dist, "ok"
                ), (cap, start)
            else:
                assert out[f"https://h.io/{start}"] == (
                    f"https://h.io/{start + cap}", cap, "too_many"
                ), (cap, start)
