"""Interval filling: hand-checked LOCF and linear interpolation,
leading/trailing gap fallbacks, multi-step grids, validation."""

from __future__ import annotations

import pytest


def _fill(spark, rows, method, step=1):
    from opentelemetry_collector_components_spark.operators.resample import (
        fill_intervals,
    )

    df = spark.createDataFrame(rows, "k string, t long, y double")
    out = fill_intervals(df, ["k"], "t", "y", step=step, method=method)
    return {(r.k, r.t): (r.y, r.filled) for r in out.collect()}


def test_fill_locf(spark):
    rows = [("a", 0, 10.0), ("a", 3, 40.0), ("a", 5, 60.0)]
    got = _fill(spark, rows, "locf")
    assert got[("a", 0)] == (10.0, 0)
    assert got[("a", 1)] == (10.0, 1)     # carried forward
    assert got[("a", 2)] == (10.0, 1)
    assert got[("a", 3)] == (40.0, 0)
    assert got[("a", 4)] == (40.0, 1)
    assert got[("a", 5)] == (60.0, 0)
    assert len(got) == 6


def test_fill_linear_and_edges(spark):
    rows = [("a", 0, 10.0), ("a", 4, 50.0)]
    got = _fill(spark, rows, "linear")
    assert got[("a", 1)] == (20.0, 1)
    assert got[("a", 2)] == (30.0, 1)
    assert got[("a", 3)] == (40.0, 1)
    # grid spans only [min, max]: no extrapolated rows exist
    assert set(t for _, t in got) == {0, 1, 2, 3, 4}
    # a NULL observation mid-series is treated as a missing bin
    rows2 = [("a", 0, 0.0), ("a", 1, None), ("a", 2, 8.0)]
    got2 = _fill(spark, rows2, "linear")
    assert got2[("a", 1)] == (4.0, 1)


def test_fill_step_and_validation(spark):
    rows = [("a", 0, 1.0), ("a", 20, 3.0)]
    got = _fill(spark, rows, "locf", step=10)
    assert set(t for _, t in got) == {0, 10, 20}
    assert got[("a", 10)] == (1.0, 1)
    from opentelemetry_collector_components_spark.operators.resample import (
        fill_intervals,
    )

    df = spark.createDataFrame(rows, "k string, t long, y double")
    with pytest.raises(ValueError):
        fill_intervals(df, ["k"], "t", "y", step=0)
    with pytest.raises(ValueError):
        fill_intervals(df, ["k"], "t", "y", step=1, method="spline")
