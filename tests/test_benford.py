"""Benford audit: digit extraction rules, zero-count digits kept,
chi-square arithmetic, conforming vs non-conforming data."""

from __future__ import annotations

import math

import pytest


def test_digit_extraction_and_zero_digits_kept(spark):
    from opentelemetry_collector_components_spark.operators.benford import (
        benford_audit,
    )

    # leading digit must skip '0' and the decimal point: 0.042 -> 4
    vals = [1.5, 0.042, 120.0, 0.9, 9000.0, -3.0, None, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r.digit: r for r in benford_audit(df, "v").collect()}
    assert set(out) == set(range(1, 10))  # all 9 digits present
    assert out[1].obs == 2          # 1.5 and 120.0
    assert out[4].obs == 1          # 0.042
    assert out[9].obs == 2          # 0.9 and 9000.0
    assert out[2].obs == 0          # kept with zero observations
    assert all(r.total == 5 for r in out.values())  # -3, None, 0 excluded


def test_chi2_and_conformance(spark):
    from opentelemetry_collector_components_spark.operators.benford import (
        BENFORD_PPM,
        benford_audit,
    )

    # exponentially spread values follow Benford well: every per-digit
    # chi-square contribution stays small
    vals = [1.0001 * (1.1 ** i) for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = benford_audit(df, "v").collect()
    assert sum(r.chi2 for r in out) < 17.0  # chi2(8 dof) ~ no rejection
    # uniform values concentrated on one digit scream non-conformance
    bad = spark.createDataFrame([(5.0 + i / 1000,) for i in range(500)],
                                "v double")
    bout = {r.digit: r for r in benford_audit(bad, "v").collect()}
    assert bout[5].obs == 500
    expected5 = 500 * BENFORD_PPM[5] / 1e6
    want = (500 - expected5) ** 2 / expected5
    assert bout[5].chi2 == pytest.approx(round(want, 4))
    assert sum(r.chi2 for r in bout.values()) > 100.0
