from __future__ import annotations

import pytest


def _hash(spark, pts, precision):
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.geo import geohash

    df = spark.createDataFrame(pts, "lat double, lon double")
    return [
        r["g"]
        for r in df.select(
            geohash(F.col("lat"), F.col("lon"), precision).alias("g")
        ).collect()
    ]


def test_known_geohashes(spark):
    # canonical published examples
    assert _hash(spark, [(57.64911, 10.40744)], 11) == ["u4pruydqqvj"]
    assert _hash(spark, [(48.669, -4.329)], 5) == ["gbsuv"]
    assert _hash(spark, [(0.0, 0.0)], 1) == ["s"]
    assert _hash(spark, [(90.0, 180.0)], 4) == ["zzzz"]
    assert _hash(spark, [(-90.0, -180.0)], 4) == ["0000"]


def test_prefix_property(spark):
    g11 = _hash(spark, [(57.64911, 10.40744)], 11)[0]
    for p in (1, 3, 5, 7):
        assert _hash(spark, [(57.64911, 10.40744)], p)[0] == g11[:p]


def test_out_of_range_raises(spark):
    with pytest.raises(Exception, match="out of range"):
        _hash(spark, [(91.0, 0.0)], 5)
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.geo import geohash

    with pytest.raises(ValueError):
        geohash(F.lit(0.0), F.lit(0.0), 13)


def test_sql_matches_spark(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.geo import geohash_sql

    pts = [
        (i, ((i * 37) % 1800) / 10.0 - 90.0, ((i * 91) % 3600) / 10.0 - 180.0)
        for i in range(50)
    ]
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.geo import geohash

    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    spark_rows = {
        r["id"]: r["g"]
        for r in df.select(
            "id", geohash(F.col("lat"), F.col("lon"), 8).alias("g")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {la}, {lo})" for i, la, lo in pts)
        + ") v(id, lat, lon)"
    )
    sql = f"SELECT id, {geohash_sql('lat', 'lon', 8)} AS g FROM p"
    oracle = {r[0]: r[1] for r in con.sql(sql).fetchall()}
    assert oracle == spark_rows


def test_null_coordinates_yield_null(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.geo import geohash

    df = spark.createDataFrame(
        [(None, 10.0), (45.0, None), (45.0, 10.0)],
        "lat double, lon double",
    )
    got = [
        r["g"]
        for r in df.select(geohash(F.col("lat"), F.col("lon"), 4).alias("g"))
        .collect()
    ]
    assert got[0] is None and got[1] is None and got[2] is not None
