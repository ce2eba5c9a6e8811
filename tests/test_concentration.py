"""Gini + Lorenz top-share concentration: Python reference, equality
floor, zero-total drop, negative-weight raise."""

import random

import pytest

from opentelemetry_collector_components_spark.operators.profile import (
    concentration_stats,
)


def test_python_reference(spark):
    rng = random.Random(4)
    weights = [rng.randint(0, 50) for _ in range(200)] + [5000]
    df = spark.createDataFrame(
        [("g", i, w) for i, w in enumerate(weights)], ["k", "unit", "w"]
    )
    r = concentration_stats(df, ["k"], "w").collect()[0]

    sv = sorted(weights)
    n, total = len(sv), sum(sv)
    gnum = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(sv))
    t1, t10 = -(-n // 100), -(-n // 10)
    assert (r["n"], r["total"], r["gini_num"]) == (n, total, gnum)
    assert (r["top1pct_n"], r["top1pct_sum"]) == (t1, sum(sv[n - t1 :]))
    assert (r["top10pct_n"], r["top10pct_sum"]) == (t10, sum(sv[n - t10 :]))
    assert r["gini"] == round(gnum / (n * total), 6)
    # one unit carrying half the mass: heavy concentration
    assert r["top1pct_share"] > 0.4


def test_equal_distribution_gini_zero(spark):
    df = spark.createDataFrame([("eq", i, 10) for i in range(50)], ["k", "u", "w"])
    r = concentration_stats(df, ["k"], "w").collect()[0]
    assert r["gini_num"] == 0 and r["gini"] == 0.0
    assert r["top10pct_share"] == pytest.approx(0.1)


def test_zero_total_dropped_and_negative_raises(spark):
    df = spark.createDataFrame(
        [("zero", 1, 0), ("ok", 1, 5), ("ok", 2, 5)], ["k", "u", "w"]
    )
    out = {r["k"] for r in concentration_stats(df, ["k"], "w").collect()}
    assert out == {"ok"}
    bad = spark.createDataFrame([("n", 1, -3)], ["k", "u", "w"])
    with pytest.raises(Exception, match="negative weight"):
        concentration_stats(bad, ["k"], "w").collect()


def test_tie_order_cannot_change_sums(spark):
    # many equal weights: gini_num is invariant to which tied row gets
    # which rank — run twice under different partitioning
    rows = [("t", i, w) for i, w in enumerate([7, 7, 7, 7, 1, 13, 7, 7])]
    a = concentration_stats(
        spark.createDataFrame(rows, ["k", "u", "w"]), ["k"], "w"
    ).collect()[0]
    b = concentration_stats(
        spark.createDataFrame(list(reversed(rows)), ["k", "u", "w"]).repartition(7),
        ["k"],
        "w",
    ).collect()[0]
    assert a == b
