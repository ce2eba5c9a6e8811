from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.quantiles import (
    exact_quantiles,
)


def _truth(vals, q):
    """quantile_disc semantics: k-th smallest, k = clamp(ceil(q*n), 1, n)."""
    import math

    s = sorted(vals)
    k = min(len(s), max(1, math.ceil(q * len(s))))
    return s[k - 1]


def test_matches_sorted_truth_multi_round(spark):
    """Small buckets + tiny threshold force several narrowing rounds;
    answers must still be exactly the sorted-order elements."""
    vals = [((i * 2654435761) % 100003) / 7.0 for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(8)
    qs = [0.01, 0.5, 0.9, 0.99, 1.0]
    got = {r["quantile"]: r["value"] for r in exact_quantiles(df, "v", qs, buckets=8, final_threshold=20).collect()}
    for q in qs:
        assert got[q] == _truth(vals, q), q


def test_non_integral_qn_matches_duckdb(spark):
    """Counts where q*n is NOT integral — the regime where the ceil(q*n)
    index rule and floor(q*(n-1))+1 diverge; pins against DuckDB's
    actual quantile_disc output."""
    import duckdb

    vals = [((i * 48271) % 2147483647) / 1000.0 for i in range(997)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    qs = [0.5, 0.9, 0.99]
    got = {r["quantile"]: r["value"] for r in exact_quantiles(df, "v", qs, buckets=8, final_threshold=10).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    for q in qs:
        want = con.sql(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert got[q] == want == _truth(vals, q), q


def test_heavy_duplicates_collapse_range(spark):
    """One value holds 90% of the mass: the surviving range collapses to
    lo == hi and resolves without a final sort."""
    vals = [42.0] * 9000 + [float(i) for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r["quantile"]: r["value"] for r in exact_quantiles(df, "v", [0.5], buckets=8, final_threshold=10).collect()}
    assert got[0.5] == _truth(vals, 0.5) == 42.0


def test_denormal_plateau_resolves_exactly(spark):
    """Bounds a few representable doubles apart: (hi-lo)/buckets underflows
    to 0.0, so subdividing cannot make progress.  The plateau guard must
    resolve from per-distinct-value counts instead of looping/dividing by
    zero — pins the hypothesis-found denormal-cluster failure."""
    vals = [0.0] * 6 + [5e-324] * 5 + [1e-323] * 4
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    qs = [0.25, 0.5, 0.9, 1.0]
    got = {
        r["quantile"]: r["value"]
        for r in exact_quantiles(df, "v", qs, buckets=4, final_threshold=2).collect()
    }
    for q in qs:
        assert got[q] == _truth(vals, q), q


def test_nulls_ignored_and_int_type(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(1, 11)] + [(None,)], "v int"
    )
    out = exact_quantiles(df, "v", [0.5, 1.0], buckets=4, final_threshold=2)
    got = {r["quantile"]: r["value"] for r in out.collect()}
    assert got == {0.5: 5, 1.0: 10}
    assert dict(out.dtypes)["value"] == "int"


def test_validations(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [0.0])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [0.5], buckets=1)
    with pytest.raises(ValueError):
        exact_quantiles(df.where(F.col("v").isNull()), "v", [0.5])
