from __future__ import annotations

import pytest


def _rho(spark, rows, **kw):
    from opentelemetry_collector_components_spark.operators.rankcorr import (
        spearman,
    )

    df = spark.createDataFrame(rows, "x long, y long")
    return spearman(df, "x", "y", **kw).collect()[0]


def test_perfect_monotone(spark):
    rows = [(i, i * i) for i in range(1, 11)]  # nonlinear but monotone
    r = _rho(spark, rows)
    assert r["rho_ppm"] == 1000000
    rows = [(i, -i) for i in range(1, 11)]
    assert _rho(spark, rows)["rho_ppm"] == -1000000


def test_ties_hand_computed(spark):
    # x: 1,1,2 -> doubled avg ranks 3,3,6 ; y: 5,7,7 -> 2,5,5
    # centered (n+1=4 doubled): cx = -1,-1,2 ; cy = -2,1,1
    # sxy = 2-1+2 = 3; sxx = 6; syy = 6 -> rho = 3/6 = 0.5
    r = _rho(spark, [(1, 5), (1, 7), (2, 7)])
    assert r["rho_ppm"] == 500000


def test_constant_column_null(spark):
    r = _rho(spark, [(1, 9), (2, 9), (3, 9)])
    assert r["rho_ppm"] is None


def test_null_raises(spark):
    from opentelemetry_collector_components_spark.operators.rankcorr import (
        spearman,
    )

    df = spark.createDataFrame([(1, None)], "x long, y long")
    with pytest.raises(Exception, match="NULL"):
        spearman(df, "x", "y").collect()


def test_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.rankcorr import (
        spearman,
        spearman_oracle_sql,
    )

    rows = []
    for i in range(300):
        g = f"g{i % 2}"
        x = (i * 7) % 23
        y = x * 2 + (i * 13) % 11  # noisy monotone
        rows.append((g, x, y))
    df = spark.createDataFrame(rows, "g string, x long, y long")
    sp = {
        r["g"]: (r["n"], r["rho_ppm"])
        for r in spearman(df, "x", "y", ["g"]).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{g}', {x}, {y})" for g, x, y in rows)
        + ") v(g, x, y)"
    )
    du = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            spearman_oracle_sql("SELECT * FROM t", "x", "y", ["g"])
        ).fetchall()
    }
    assert sp == du
    for n, rho in sp.values():
        assert rho > 500000  # strongly monotone by construction
