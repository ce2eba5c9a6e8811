"""Skew report: hand-checked fixed-point numbers on a planted skewed
frame, multi-column keys, summary row, validation."""

from __future__ import annotations

import pytest


def test_skew_report_hand_checked(spark):
    from opentelemetry_collector_components_spark.operators.partition import (
        skew_report,
    )

    # 4 keys, 100 rows total: hot=70, b=20, c=6, d=4 -> mean 25
    rows = (
        [("hot",)] * 70 + [("b",)] * 20 + [("c",)] * 6 + [("d",)] * 4
    )
    df = spark.createDataFrame(rows, "k string")
    out = {r.key: r for r in skew_report(df, ["k"], top=2).collect()}
    assert set(out) == {"hot", "b", "(all)"}
    hot = out["hot"]
    assert (hot.n_rows, hot.n_keys, hot.share_ppm) == (70, 4, 700_000)
    # 70 vs mean 25 -> ratio 2.8 -> x100 = 280; rec_salts = ceil(2.8) = 3
    assert hot.skew_ratio_x100 == 280 and hot.rec_salts == 3
    b = out["b"]
    assert b.skew_ratio_x100 == 80 and b.rec_salts == 1
    allr = out["(all)"]
    assert (allr.n_rows, allr.n_keys, allr.share_ppm) == (100, 4, 1_000_000)

    with pytest.raises(ValueError):
        skew_report(df, ["k"], top=0)


def test_skew_report_composite_keys(spark):
    from opentelemetry_collector_components_spark.operators.partition import (
        skew_report,
    )

    rows = [("a", 1)] * 6 + [("a", 2)] * 2 + [("b", 1)] * 2
    df = spark.createDataFrame(rows, "x string, y int")
    out = {r.key: r.n_rows for r in skew_report(df, ["x", "y"], top=3).collect()}
    assert out["a\x011"] == 6 and out["a\x012"] == 2 and out["b\x011"] == 2


def test_fd_violations(spark):
    from opentelemetry_collector_components_spark.operators.validate import (
        fd_violations,
    )

    rows = [
        ("a", "x"), ("a", "x"), ("a", "y"),     # violated: x,y
        ("b", "z"), ("b", "z"),                 # holds
        ("c", None), ("c", "w"),                # NULL is a second mapping
    ]
    df = spark.createDataFrame(rows, "k string, v string")
    out = {r.k: r for r in fd_violations(df, ["k"], "v").collect()}
    assert set(out) == {"a", "c"}
    assert (out["a"].distinct_rhs, out["a"].n_rows) == (2, 3)
    assert (out["a"].rhs_min, out["a"].rhs_max) == ("x", "y")
    assert out["a"].rhs_has_null == 0
    # NULL mapping: min/max skip it, so the flag is the only witness
    assert out["c"].distinct_rhs == 2 and out["c"].rhs_min == "w"
    assert out["c"].rhs_has_null == 1
    # a dependency that holds yields the empty frame
    holds = df.where("k = 'b'")
    assert fd_violations(holds, ["k"], "v").count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        fd_violations(df, [], "v")
