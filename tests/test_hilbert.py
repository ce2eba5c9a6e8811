from __future__ import annotations

import pytest


def _xy2d(order: int, x: int, y: int) -> int:
    """Reference implementation (Wikipedia 'Hilbert curve', xy2d with
    whole-square reflection) to pin the operator against."""
    n = 1 << order
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_full_grid_matches_reference(spark):
    from opentelemetry_collector_components_spark.operators.layout import hilbert_key

    order = 4
    pts = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["hilbert_key"]
        for r in hilbert_key(df, "x", "y", order=order).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _xy2d(order, x, y)
    # a space-filling curve is a bijection onto [0, n^2)
    assert sorted(got.values()) == list(range(256))


def test_adjacent_keys_are_grid_neighbors(spark):
    from opentelemetry_collector_components_spark.operators.layout import hilbert_key

    order = 3
    pts = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(pts, "x long, y long")
    by_key = {
        r["hilbert_key"]: (r["x"], r["y"])
        for r in hilbert_key(df, "x", "y", order=order).collect()
    }
    for d in range(63):
        (x1, y1), (x2, y2) = by_key[d], by_key[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_out_of_range_raises(spark):
    from opentelemetry_collector_components_spark.operators.layout import hilbert_key

    df = spark.createDataFrame([(16, 0)], "x long, y long")
    with pytest.raises(Exception, match="must be in"):
        hilbert_key(df, "x", "y", order=4).collect()
    with pytest.raises(ValueError):
        hilbert_key(df, "x", "y", order=0)


def test_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.layout import (
        hilbert_key,
        hilbert_oracle_sql,
    )

    pts = [(i, (i * 7) % 32, (i * 13) % 32) for i in range(64)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    spark_rows = {
        r["id"]: r["hilbert_key"]
        for r in hilbert_key(df, "x", "y", order=5).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {x}, {y})" for i, x, y in pts)
        + ") v(id, x, y)"
    )
    sql = hilbert_oracle_sql("SELECT * FROM p", "x", "y", 5, ["id"])
    oracle = {r[0]: r[1] for r in con.sql(sql).fetchall()}
    assert oracle == spark_rows
