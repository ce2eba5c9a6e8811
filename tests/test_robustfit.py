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


# ---------------------------------------------------------------------------
# trimmed_stats
# ---------------------------------------------------------------------------
def test_trimmed_stats_python_reference(spark):
    import random

    from opentelemetry_collector_components_spark.operators.robustfit import (
        trimmed_stats,
    )

    rng = random.Random(2)
    vals = [rng.randint(0, 100) for _ in range(37)] + [100000]  # one outlier
    df = spark.createDataFrame([("a", v) for v in vals], ["k", "v"])
    r = trimmed_stats(df, ["k"], "v", 1, 10).collect()[0]

    sv = sorted(vals)
    n = len(sv)
    k = n // 10
    mid = sv[k : n - k]
    assert (r["n"], r["k_tail"]) == (n, k)
    assert (r["trimmed_sum"], r["trimmed_n"]) == (sum(mid), len(mid))
    assert r["winsor_sum"] == sum(mid) + k * (mid[0] + mid[-1])
    assert r["trimmed_mean"] == round(sum(mid) / len(mid), 4)
    # the outlier was trimmed: robust mean far below the plain mean
    assert r["trimmed_mean"] < sum(vals) / n


def test_trimmed_stats_small_keys_and_ties(spark):
    from opentelemetry_collector_components_spark.operators.robustfit import (
        trimmed_stats,
    )

    rows = [("one", 7)] + [("tie", v) for v in [5, 5, 5, 1, 9, 5, 5, 5, 5, 5]]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {r["k"]: r for r in trimmed_stats(df, ["k"], "v", 1, 10).collect()}
    assert out["one"]["k_tail"] == 0 and out["one"]["trimmed_mean"] == 7.0
    # n=10, k=1: drop exactly one 1 and one 9 regardless of tie order
    assert out["tie"]["trimmed_sum"] == 40 and out["tie"]["trimmed_n"] == 8
    assert out["tie"]["winsor_sum"] == 40 + 5 + 5


def test_trimmed_stats_validation(spark):
    import pytest

    from opentelemetry_collector_components_spark.operators.robustfit import (
        trimmed_stats,
    )

    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    with pytest.raises(ValueError, match="trim"):
        trimmed_stats(df, ["k"], "v", 1, 2)
    with pytest.raises(ValueError, match="key_cols"):
        trimmed_stats(df, [], "v", 1, 10)
