"""Priority sampling: estimator invariants, oracle parity, unbiasedness."""

import duckdb
import pytest

from opentelemetry_collector_components_spark.operators.sampling import (
    priority_sample,
    priority_sample_oracle_sql,
)


def _weights(spark, n=300):
    # heavy-tailed weights: w = 1 + (7i^2 mod 997)
    rows = [(i, 1 + (7 * i * i) % 997) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, w long")


def test_sample_size_and_estimator_floor(spark):
    df = _weights(spark)
    out = priority_sample(df, k=40, weight_col="w").toPandas()
    assert len(out) == 40
    # every estimate >= max(weight, tau) in milli-units
    tau = out["tau_milli"].iloc[0]
    assert (out["tau_milli"] == tau).all()
    assert (out["est_milli"] >= out["w"] * 1000).all()
    assert (out["est_milli"] >= tau).all()


def test_small_population_keeps_all_exact(spark):
    df = _weights(spark, n=10)
    out = priority_sample(df, k=50, weight_col="w").toPandas()
    assert len(out) == 10
    assert (out["tau_milli"] == 0).all()
    assert (out["est_milli"] == out["w"] * 1000).all()  # tau=0 -> exact


def test_nonpositive_weights_excluded_and_validation(spark):
    rows = [(1, 5), (2, 0), (3, -4), (4, 9)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = priority_sample(df, k=10, weight_col="w").toPandas()
    assert sorted(out["doc_id"]) == [1, 4]
    with pytest.raises(ValueError):
        priority_sample(df, k=0, weight_col="w")


def test_oracle_parity(spark):
    df = _weights(spark, n=250)
    got = (
        priority_sample(df, k=30, weight_col="w", seed=3)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("pop", df.toPandas())
    want = (
        con.sql(
            priority_sample_oracle_sql("SELECT * FROM pop", 30, "w", seed=3)
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["est_milli"].tolist() == want["est_milli"].tolist()
    assert got["tau_milli"].tolist() == want["tau_milli"].tolist()


def test_subset_sum_unbiasedness_over_seeds(spark):
    # the estimator is unbiased over the u-draw; with 40 deterministic
    # seeds the mean total estimate must land near the true total
    df = _weights(spark, n=200)
    pdf = df.toPandas()
    true_total = int(pdf["w"].sum()) * 1000
    totals = []
    for seed in range(40):
        out = priority_sample(df, k=25, weight_col="w", seed=seed).toPandas()
        totals.append(int(out["est_milli"].sum()))
    mean = sum(totals) / len(totals)
    assert abs(mean - true_total) / true_total < 0.12
