from __future__ import annotations

import pytest


def _chi(spark, rows):
    from opentelemetry_collector_components_spark.operators.contingency import (
        chi_square,
    )

    df = spark.createDataFrame(rows, "a string, b string")
    return chi_square(df, "a", "b").collect()[0]


def test_hand_computed_2x2(spark):
    # o = [[30,10],[10,30]]: e = 20 everywhere, chi2 = 4*(100/20) = 20,
    # V = sqrt(20/80) = 0.5
    rows = (
        [("a1", "b1")] * 30 + [("a1", "b2")] * 10
        + [("a2", "b1")] * 10 + [("a2", "b2")] * 30
    )
    r = _chi(spark, rows)
    assert (r["n"], r["dof"]) == (80, 1)
    assert r["chi2_micro"] == 20_000_000
    assert r["cramers_v_micro"] == 500_000


def test_independent_table_is_zero(spark):
    # perfectly proportional table -> chi2 exactly 0
    rows = []
    for a, na in (("x", 2), ("y", 3)):
        for b, nb in (("u", 4), ("v", 6)):
            rows += [(a, b)] * (na * nb)
    r = _chi(spark, rows)
    assert r["chi2_micro"] == 0 and r["cramers_v_micro"] == 0


def test_absent_cells_counted(spark):
    # diagonal-only 2x2: o=[[10,0],[0,10]] -> e=5, chi2 = 4*5 = 20
    rows = [("a1", "b1")] * 10 + [("a2", "b2")] * 10
    r = _chi(spark, rows)
    assert r["chi2_micro"] == 20_000_000
    assert r["cramers_v_micro"] == 1_000_000  # perfect association


def test_degenerate_single_column(spark):
    r = _chi(spark, [("a1", "b1"), ("a2", "b1")])
    assert r["dof"] == 0 and r["cramers_v_micro"] is None
    assert r["chi2_micro"] == 0


def test_null_raises(spark):
    with pytest.raises(Exception, match="NULL"):
        _chi(spark, [("a1", None)])


def test_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.contingency import (
        chi_square,
        chi_square_oracle_sql,
    )

    rows = []
    for i in range(500):
        rows.append((f"a{i % 3}", f"b{(i * 7) % 4}"))
    df = spark.createDataFrame(rows, "a string, b string")
    s = chi_square(df, "a", "b").collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{a}', '{b}')" for a, b in rows)
        + ") v(a, b)"
    )
    d = con.sql(chi_square_oracle_sql("SELECT * FROM t", "a", "b")).fetchone()
    assert (s["n"], s["n_rows_a"], s["n_cols_b"], s["dof"],
            s["chi2_micro"], s["cramers_v_micro"]) == d
