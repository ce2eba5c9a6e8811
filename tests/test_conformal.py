"""Split-conformal band: hand-checked order statistic, coverage
accounting on a planted split, tie handling, guarantee sanity on
exchangeable data, validation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _hash_bucket(i, seed="v1"):
    import hashlib

    h = hashlib.md5(f"{i}:conf:{seed}".encode()).hexdigest()[:15]
    return int(h, 16) % 100


def test_threshold_is_kth_smallest_and_coverage_counts(spark):
    from opentelemetry_collector_components_spark.operators.conformal import (
        split_conformal,
    )

    # residuals |y - 0| = id value; split replicated in pure Python
    rows = [(i, 0, i % 37) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, p long, y long")
    out = split_conformal(df, "id", "p", "y", alpha=0.2, calib_pct=50).collect()[0]

    calib = sorted(r[2] for r in rows if _hash_bucket(r[0]) < 50)
    test = [r[2] for r in rows if _hash_bucket(r[0]) >= 50]
    n = len(calib)
    k = min(n, math.ceil((n + 1) * 0.8))
    thr = calib[k - 1]
    assert out.n_calib == n and out.k == k and out.threshold == thr
    assert out.n_test == len(test)
    assert out.covered == sum(1 for v in test if v <= thr)
    assert out.coverage == round(out.covered / out.n_test, 4)


def test_threshold_ties_resolve_to_the_value(spark):
    from opentelemetry_collector_components_spark.operators.conformal import (
        split_conformal,
    )

    # every residual identical -> threshold must be that value and
    # coverage must be 1.0 regardless of where k lands in the tie run
    df = spark.createDataFrame(
        [(i, 10, 17) for i in range(200)], "id long, p long, y long"
    )
    out = split_conformal(df, "id", "p", "y", alpha=0.1).collect()[0]
    assert out.threshold == 7 and out.coverage == 1.0


def test_coverage_tracks_target_on_exchangeable_data(spark):
    from opentelemetry_collector_components_spark.operators.conformal import (
        split_conformal,
    )

    # deterministic pseudo-noise, exchangeable across the md5 split:
    # realized coverage must be within a few points of 1 - alpha
    df = spark.range(4000).select(
        F.col("id"),
        F.lit(0).alias("p"),
        F.pmod(F.conv(F.substring(F.md5(F.concat(F.col("id").cast("string"),
            F.lit(":noise"))), 1, 15), 16, 10).cast("long"), F.lit(1000))
        .alias("y"),
    )
    out = split_conformal(df, "id", "p", "y", alpha=0.1).collect()[0]
    assert 0.87 <= out.coverage <= 0.93
    # and the band is not vacuous: threshold well inside the value range
    assert out.threshold < 1000


def test_conformal_validation(spark):
    from opentelemetry_collector_components_spark.operators.conformal import (
        split_conformal,
    )

    df = spark.createDataFrame([(1, 0, 1)], "id long, p long, y long")
    with pytest.raises(ValueError):
        split_conformal(df, "id", "p", "y", alpha=0.0)
    with pytest.raises(ValueError):
        split_conformal(df, "id", "p", "y", calib_pct=100)
    # a single row lands in exactly one slice; if it's the test slice the
    # calibration set is empty and the operator must say so
    empty_calib = df.where(F.lit(False))
    with pytest.raises(ValueError):
        split_conformal(empty_calib, "id", "p", "y")
