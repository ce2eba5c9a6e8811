from __future__ import annotations

import pytest


def _run(spark, rows, **kw):
    from opentelemetry_collector_components_spark.operators.hampel import (
        hampel_filter,
    )

    df = spark.createDataFrame(rows, "k string, t long, y long")
    return {
        r["t"]: r for r in hampel_filter(df, ["k"], "t", "y", **kw).collect()
    }


def test_spike_flagged_and_repaired(spark):
    vals = [10, 11, 10, 500, 11, 10, 11, 10]
    rows = [("k", t, y) for t, y in enumerate(vals)]
    got = _run(spark, rows, k=2)
    assert got[3]["is_outlier"] is True
    assert got[3]["window_median"] in (10, 11)
    assert got[3]["y_repaired"] == got[3]["window_median"]
    # points whose window has real spread and a small deviation pass
    for t in (0, 2, 4, 5, 7):
        assert got[t]["is_outlier"] is False
        assert got[t]["y_repaired"] == vals[t]
    # the documented zero-MAD strictness: a majority-constant window
    # flags ANY deviating point (t=1/t=6 sit among three 10s)
    assert got[1]["window_mad"] == 0 and got[1]["is_outlier"] is True
    assert got[6]["window_mad"] == 0 and got[6]["is_outlier"] is True


def test_zero_mad_flags_any_deviation(spark):
    rows = [("k", t, 5) for t in range(6)] + [("k", 6, 6)]
    got = _run(spark, rows, k=3)
    assert got[6]["window_mad"] == 0 or got[6]["is_outlier"] is True
    # the deviating point among constants must flag
    assert got[6]["is_outlier"] is True
    assert got[0]["is_outlier"] is False


def test_validation(spark):
    with pytest.raises(ValueError):
        _run(spark, [("k", 0, 1)], k=0)
    with pytest.raises(ValueError):
        _run(spark, [("k", 0, 1)], z_milli=0)


def test_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.hampel import (
        hampel_filter,
        hampel_oracle_sql,
    )

    rows = []
    for kk, m in (("a", 5), ("b", 11)):
        for t in range(30):
            y = 50 + (t * m) % 13 + (400 if t == 17 else 0)
            rows.append((kk, t, y))
    df = spark.createDataFrame(rows, "k string, t long, y long")
    spark_rows = {
        (r["k"], r["t"]): (r["window_median"], r["window_mad"],
                           r["is_outlier"], r["y_repaired"])
        for r in hampel_filter(df, ["k"], "t", "y", k=3).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE s AS SELECT * FROM (VALUES "
        + ", ".join(f"('{k}', {t}, {y})" for k, t, y in rows)
        + ") v(k, t, y)"
    )
    sql = hampel_oracle_sql("SELECT * FROM s", ["k"], "t", "y", k=3)
    oracle = {
        (r[0], r[1]): (r[3], r[4], r[5], r[6])
        for r in con.sql(sql).fetchall()
    }
    assert oracle == spark_rows
    # at least the planted spike is flagged
    assert spark_rows[("a", 17)][2] is True
