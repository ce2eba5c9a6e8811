"""Weighted exact quantiles: hand-checked weight-rank semantics,
reduction to the unweighted form at weight 1, narrowing recursion on
larger frames vs a brute-force reference, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _brute(pairs, q):
    total = sum(w for _, w in pairs)
    q_ppm = round(q * 1_000_000)
    target = max(1, min(total, (q_ppm * total + 999_999) // 1_000_000))
    cum = 0
    for v, w in sorted(pairs):
        cum += w
        if cum >= target:
            return v
    return pairs[-1][0]


def test_weighted_rank_hand_checked(spark):
    from opentelemetry_collector_components_spark.operators.quantiles import (
        weighted_quantiles,
    )

    # value 100 carries 90% of the weight: weighted p50 is 100 while the
    # row-wise median would be 3 — the distinction this operator exists for
    pairs = [(1.0, 1), (2.0, 1), (3.0, 1), (4.0, 1), (100.0, 36)]
    df = spark.createDataFrame(pairs, "v double, w long")
    out = {r.quantile: r.value for r in
           weighted_quantiles(df, "v", "w", [0.5, 0.1]).collect()}
    assert out[0.5] == 100.0
    # q=0.1 of W=40 -> 4th weight unit -> value 4.0 (NOT the row p10)
    assert out[0.1] == _brute(pairs, 0.1) == 4.0


def test_weight_one_reduces_to_unweighted(spark):
    from opentelemetry_collector_components_spark.operators.quantiles import (
        exact_quantiles,
        weighted_quantiles,
    )

    df = spark.range(997).select(
        ((F.col("id") * 839) % 997).cast("double").alias("v"),
        F.lit(1).cast("long").alias("w"),
    )
    qs = [0.25, 0.5, 0.9, 0.99]
    w = {r.quantile: r.value for r in
         weighted_quantiles(df, "v", "w", qs, buckets=8,
                            final_threshold=20).collect()}
    u = {r.quantile: r.value for r in
         exact_quantiles(df, "v", qs, buckets=8,
                         final_threshold=20).collect()}
    assert w == u


def test_weighted_narrowing_matches_brute_force(spark):
    from opentelemetry_collector_components_spark.operators.quantiles import (
        weighted_quantiles,
    )

    pairs = [(float((i * 613) % 1009), (i % 7) + 1) for i in range(1009)]
    df = spark.createDataFrame(pairs, "v double, w long")
    qs = [0.05, 0.5, 0.95, 1.0]
    out = {r.quantile: r.value for r in
           weighted_quantiles(df, "v", "w", qs, buckets=8,
                              final_threshold=30).collect()}
    for q in qs:
        assert out[q] == _brute(pairs, q), q


def test_weighted_infinity_plateau_stays_exact(spark):
    from opentelemetry_collector_components_spark.operators.quantiles import (
        weighted_quantiles,
    )

    # +inf defeats every bucket width (all rows land in bucket 0, no
    # narrowing progress); the final fetch must still resolve exactly
    # via the distributed cumulative-weight join, never a full-range
    # driver collect
    pairs = [(1.0, 1), (2.0, 1), (float("inf"), 1)]
    df = spark.createDataFrame(pairs, "v double, w long")
    out = {r.quantile: r.value for r in
           weighted_quantiles(df, "v", "w", [0.5, 1.0],
                              final_threshold=1).collect()}
    assert out[0.5] == 2.0
    assert out[1.0] == float("inf")
    # max_rounds=0 drives EVERY quantile through the final fetch on
    # the full un-narrowed range — the exact path the bound protects
    out0 = {r.quantile: r.value for r in
            weighted_quantiles(df, "v", "w", [0.5, 1.0],
                               max_rounds=0).collect()}
    assert out0 == out


def test_weighted_quantiles_validation(spark):
    from opentelemetry_collector_components_spark.operators.quantiles import (
        weighted_quantiles,
    )

    df = spark.createDataFrame([(1.0, 0)], "v double, w long")
    with pytest.raises(ValueError):
        weighted_quantiles(df, "v", "w", [0.5])  # zero weight
    with pytest.raises(ValueError):
        weighted_quantiles(df, "v", "w", [])
    empty = df.where("v < 0")
    with pytest.raises(ValueError):
        weighted_quantiles(empty, "v", "w", [0.5])
