from __future__ import annotations

import pytest


def test_pav_pools_textbook():
    from opentelemetry_collector_components_spark.operators.isotonic import (
        pav_pools,
    )

    # rates 0.2, 0.6, 0.4 -> levels 2 and 3 violate, merge to 0.5
    pools = pav_pools([(1, 5), (3, 5), (2, 5)])
    assert pools == [(1, 5, 1, 1), (5, 10, 2, 3)]
    # already monotone -> untouched
    assert pav_pools([(0, 5), (2, 5), (5, 5)]) == [
        (0, 5, 1, 1), (2, 5, 2, 2), (5, 5, 3, 3)]
    # strictly decreasing -> one pool
    assert pav_pools([(5, 5), (3, 5), (0, 5)]) == [(8, 15, 1, 3)]
    # cascading merge: a late low level pulls down several pools
    pools = pav_pools([(1, 10), (5, 10), (6, 10), (0, 10)])
    assert pools[-1][0:2] == (11, 30)  # pools 2..4 collapsed


def test_isotonic_calibrate_monotone_and_exact(spark):
    from opentelemetry_collector_components_spark.operators.isotonic import (
        isotonic_calibrate,
    )

    rows = []
    for s, (pos, n) in enumerate([(1, 5), (3, 5), (2, 5), (5, 5)]):
        rows += [(1, s * 10)] * pos + [(0, s * 10)] * (n - pos)
    df = spark.createDataFrame(rows, "y long, s long")
    out = sorted(
        (r["s"], r["calibrated_ppm"], r["pool_n"])
        for r in isotonic_calibrate(df, "y", "s").collect()
    )
    # levels 10 and 20 merged at 0.5; monotone overall
    assert out == [
        (0, 200000, 5), (10, 500000, 10), (20, 500000, 10),
        (30, 1000000, 5),
    ]
    ppms = [p for _, p, _ in out]
    assert ppms == sorted(ppms)


def test_guards(spark):
    from opentelemetry_collector_components_spark.operators.isotonic import (
        isotonic_calibrate,
    )

    bad = spark.createDataFrame([(2, 1)], "y long, s long")
    with pytest.raises(Exception, match="0/1"):
        isotonic_calibrate(bad, "y", "s").collect()
    nulls = spark.createDataFrame([(1, None)], "y long, s long")
    with pytest.raises(Exception, match="NULL"):
        isotonic_calibrate(nulls, "y", "s").collect()


def test_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.isotonic import (
        isotonic_calibrate,
        isotonic_oracle_sql,
    )

    rows = []
    for i in range(400):
        s = (i * 13) % 20
        y = 1 if (i * 7) % 20 < s + 3 else 0
        g = f"g{i % 2}"
        rows.append((g, y, s))
    df = spark.createDataFrame(rows, "g string, y long, s long")
    spark_rows = {
        (r["g"], r["s"]): (r["n"], r["pos"], r["calibrated_ppm"],
                           r["pool_lo_s"], r["pool_n"])
        for r in isotonic_calibrate(df, "y", "s", ["g"]).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{g}', {y}, {s})" for g, y, s in rows)
        + ") v(g, y, s)"
    )
    sql = isotonic_oracle_sql("SELECT * FROM t", "y", "s", ["g"])
    oracle = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5], r[6])
        for r in con.sql(sql).fetchall()
    }
    assert oracle == spark_rows
    # per group: calibrated_ppm non-decreasing in s
    for g in ("g0", "g1"):
        seq = [v[2] for (gg, s), v in sorted(spark_rows.items()) if gg == g]
        assert seq == sorted(seq)
