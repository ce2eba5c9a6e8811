"""Quantile CI: ranks against hand computation, interval brackets the
point and the true quantile on known data, z helper accuracy,
validation."""

from __future__ import annotations

import math

import pytest


def test_normal_z_matches_reference_values():
    from opentelemetry_collector_components_spark.operators.quantile_ci import (
        normal_z,
    )

    assert normal_z(0.95) == pytest.approx(1.959963984540054, abs=1e-8)
    assert normal_z(0.99) == pytest.approx(2.5758293035489004, abs=1e-8)
    assert normal_z(0.80) == pytest.approx(1.2815515655446004, abs=1e-8)
    with pytest.raises(ValueError):
        normal_z(1.0)


def test_ci_ranks_hand_checked():
    from opentelemetry_collector_components_spark.operators.quantile_ci import (
        ci_ranks,
    )

    n, q, z = 1000, 0.95, 1.959963984540054
    s = math.sqrt(n * q * (1 - q))
    lo, point, hi = ci_ranks(n, q, z)
    assert point == 950
    assert lo == math.floor(950 - z * s) == 936
    assert hi == math.ceil(950 + z * s) + 1 == 965
    # clamping at the edges
    assert ci_ranks(5, 0.99, z) == (4, 5, 5)


def test_quantile_ci_on_known_permutation(spark):
    from opentelemetry_collector_components_spark.operators.quantile_ci import (
        ci_ranks,
        quantile_ci,
    )

    # values are a permutation of 1..2000: the r-th order statistic IS r,
    # so the interval can be checked against the rank arithmetic directly
    n, z = 2000, 1.959963984540054
    df = spark.range(n).selectExpr("CAST((id * 1117) % 2000 + 1 AS DOUBLE) AS v")
    out = quantile_ci(df, "v", q=0.9, z=z).collect()[0]
    lo, point, hi = ci_ranks(n, 0.9, z)
    assert (out.n, out.lo, out.point, out.hi) == (n, float(lo), float(point), float(hi))
    assert out.lo < out.point < out.hi

    with pytest.raises(ValueError):
        quantile_ci(df, "v", q=0.0, z=z)
    with pytest.raises(ValueError):
        quantile_ci(df.where("v < 0"), "v", q=0.5, z=z)
