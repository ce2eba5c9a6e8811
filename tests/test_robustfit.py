"""Theil-Sen: exact recovery on a clean line, outlier immunity vs the
mean-based fit, lower-median convention, duplicate-x rejection."""

from __future__ import annotations

import pytest


def test_theil_sen_recovers_line_through_outlier(spark):
    from opentelemetry_collector_components_spark.operators.robustfit import (
        theil_sen,
    )

    # y = 2x + 1 with one wild outlier at x=5
    pts = [(x, 2.0 * x + 1.0) for x in range(9) if x != 5] + [(5, 500.0)]
    df = spark.createDataFrame(
        [("k", float(x), y) for x, y in pts], "k string, x double, y double"
    ).repartition(4)
    row = theil_sen(df, ["k"], "x", "y").collect()[0]
    assert row.n_points == 9
    assert row.slope == 2.0          # median slope ignores the outlier
    assert row.intercept == 1.0
    # sanity: an OLS fit on the same data would NOT give slope 2
    xs = [float(x) for x, _ in pts]
    ys = [y for _, y in pts]
    mx, my = sum(xs) / 9, sum(ys) / 9
    ols = sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / sum(
        (a - mx) ** 2 for a in xs
    )
    assert abs(ols - 2.0) > 1.0


def test_theil_sen_lower_median_and_guards(spark):
    from opentelemetry_collector_components_spark.operators.robustfit import (
        theil_sen,
    )

    # two points: single pair slope
    df = spark.createDataFrame(
        [("k", 0.0, 1.0), ("k", 2.0, 5.0)], "k string, x double, y double"
    )
    row = theil_sen(df, ["k"], "x", "y").collect()[0]
    assert (row.slope, row.intercept) == (2.0, 1.0)
    # single point: dropped
    one = spark.createDataFrame([("k", 0.0, 1.0)],
                                "k string, x double, y double")
    assert theil_sen(one, ["k"], "x", "y").count() == 0
    # duplicate x: loud failure
    dup = spark.createDataFrame(
        [("k", 1.0, 1.0), ("k", 1.0, 2.0)], "k string, x double, y double"
    )
    with pytest.raises(Exception, match="duplicate x"):
        theil_sen(dup, ["k"], "x", "y").collect()
