from __future__ import annotations

import pytest


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, t long, y long")


def test_recovers_pure_seasonal_signal(spark):
    from opentelemetry_collector_components_spark.operators.decompose import (
        seasonal_decompose,
    )

    # flat level 100 plus a period-4 pattern [+10, 0, -10, 0]
    pat = [10, 0, -10, 0]
    rows = [("k", t, 100 + pat[t % 4]) for t in range(24)]
    out = seasonal_decompose(_mk(spark, rows), ["k"], "t", "y", period=4)
    got = {r["t"]: r for r in out.collect()}
    # edges: first/last h=2 points have no full window
    for t in (0, 1, 22, 23):
        assert got[t]["trend_micro"] is None
        assert got[t]["remainder_micro"] is None
    for t in range(2, 22):
        assert got[t]["trend_micro"] == 100_000_000
        assert got[t]["seasonal_micro"] == pat[t % 4] * 1_000_000
        assert got[t]["remainder_micro"] == 0


def test_gap_gives_null_trend(spark):
    from opentelemetry_collector_components_spark.operators.decompose import (
        seasonal_decompose,
    )

    rows = [("k", t, 10) for t in range(12) if t != 6]
    out = seasonal_decompose(_mk(spark, rows), ["k"], "t", "y", period=4)
    got = {r["t"]: r["trend_micro"] for r in out.collect()}
    # any window spanning the missing t=6 is incomplete
    for t in (4, 5, 7, 8):
        assert got[t] is None
    assert got[2] == 10_000_000


def test_odd_period_plain_ma(spark):
    from opentelemetry_collector_components_spark.operators.decompose import (
        seasonal_decompose,
    )

    rows = [("k", t, t) for t in range(9)]  # linear: MA == center value
    out = seasonal_decompose(_mk(spark, rows), ["k"], "t", "y", period=3)
    got = {r["t"]: r for r in out.collect()}
    for t in range(1, 8):
        assert got[t]["trend_micro"] == t * 1_000_000
    with pytest.raises(ValueError):
        seasonal_decompose(_mk(spark, rows), ["k"], "t", "y", period=1)


def test_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.decompose import (
        seasonal_decompose,
        seasonal_decompose_oracle_sql,
    )

    rows = []
    for k, m in (("a", 3), ("b", 5)):
        for t in range(30):
            rows.append((k, t, 50 + (t * m) % 7 + t // 3))
    out = seasonal_decompose(_mk(spark, rows), ["k"], "t", "y", period=6)
    spark_rows = {
        (r["k"], r["t"]): (r["phase"], r["trend_micro"],
                           r["seasonal_micro"], r["remainder_micro"])
        for r in out.collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE s AS SELECT * FROM (VALUES "
        + ", ".join(f"('{k}', {t}, {y})" for k, t, y in rows)
        + ") v(k, t, y)"
    )
    sql = seasonal_decompose_oracle_sql("SELECT * FROM s", ["k"], "t", "y", 6)
    oracle = {
        (r[0], r[1]): (r[3], r[4], r[5], r[6]) for r in con.sql(sql).fetchall()
    }
    assert oracle == spark_rows
