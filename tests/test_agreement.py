from __future__ import annotations

import pytest


def test_cohen_kappa_hand_computed(spark):
    from opentelemetry_collector_components_spark.operators.agreement import cohen_kappa

    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r["n_items"] == 50
    assert r["po_ppm"] == 700000 and r["pe_ppm"] == 500000
    assert r["kappa_ppm"] == 400000 and r["band"] == "fair"


def test_cohen_kappa_degenerate_and_negative(spark):
    from opentelemetry_collector_components_spark.operators.agreement import cohen_kappa

    const = spark.createDataFrame([("y", "y")] * 3, "a string, b string")
    r = cohen_kappa(const, "a", "b").collect()[0]
    assert r["kappa_ppm"] is None and r["band"] is None

    anti = spark.createDataFrame([("y", "n"), ("n", "y")], "a string, b string")
    r = cohen_kappa(anti, "a", "b").collect()[0]
    assert r["kappa_ppm"] == -1000000 and r["band"] == "poor"


def test_cohen_kappa_null_raises(spark):
    from opentelemetry_collector_components_spark.operators.agreement import cohen_kappa

    df = spark.createDataFrame([("y", None)], "a string, b string")
    with pytest.raises(Exception, match="NULL"):
        cohen_kappa(df, "a", "b").collect()


def test_fleiss_kappa_hand_computed(spark):
    from opentelemetry_collector_components_spark.operators.agreement import (
        fleiss_kappa,
    )

    rows = [(1, "y"), (1, "y"), (2, "y"), (2, "n")]
    df = spark.createDataFrame(rows, "item long, k string")
    r = fleiss_kappa(df, "item", "k").collect()[0]
    assert (r["n_items"], r["n_raters"]) == (2, 2)
    assert r["pbar_ppm"] == 500000 and r["pe_ppm"] == 625000
    assert r["kappa_ppm"] == -333333 and r["band"] == "poor"


def test_fleiss_kappa_perfect(spark):
    from opentelemetry_collector_components_spark.operators.agreement import (
        fleiss_kappa,
    )

    rows = [(i, lab) for i, lab in enumerate("yynn") for _ in range(3)]
    df = spark.createDataFrame(rows, "item long, k string")
    r = fleiss_kappa(df, "item", "k").collect()[0]
    assert r["kappa_ppm"] == 1000000 and r["band"] == "almost_perfect"


def test_fleiss_kappa_ragged_raises(spark):
    from opentelemetry_collector_components_spark.operators.agreement import (
        fleiss_kappa,
    )

    df = spark.createDataFrame(
        [(1, "y"), (1, "y"), (2, "y")], "item long, k string"
    )
    with pytest.raises(Exception, match="unequal"):
        fleiss_kappa(df, "item", "k").collect()


def test_oracles_match_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.agreement import (
        cohen_kappa,
        cohen_kappa_oracle_sql,
        fleiss_kappa,
        fleiss_kappa_oracle_sql,
    )

    pairs = [("y", "y")] * 7 + [("y", "n")] * 2 + [("n", "y")] * 3 + [("n", "n")] * 4
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p AS SELECT * FROM (VALUES "
        + ", ".join(f"('{a}', '{b}')" for a, b in pairs)
        + ") v(a, b)"
    )
    spark_row = cohen_kappa(
        spark.createDataFrame(pairs, "a string, b string"), "a", "b"
    ).collect()[0]
    d = con.sql(cohen_kappa_oracle_sql("SELECT * FROM p", "a", "b")).fetchone()
    assert (spark_row["po_ppm"], spark_row["pe_ppm"], spark_row["kappa_ppm"],
            spark_row["band"]) == (d[1], d[2], d[3], d[4])

    ratings = [(i, lab) for i in range(5) for lab in ("y", "y", "n")]
    con.execute(
        "CREATE TABLE r AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{k}')" for i, k in ratings)
        + ") v(item, k)"
    )
    spark_row = fleiss_kappa(
        spark.createDataFrame(ratings, "item long, k string"), "item", "k"
    ).collect()[0]
    d = con.sql(fleiss_kappa_oracle_sql("SELECT * FROM r", "item", "k")).fetchone()
    assert (spark_row["pbar_ppm"], spark_row["pe_ppm"], spark_row["kappa_ppm"],
            spark_row["band"]) == (d[2], d[3], d[4], d[5])


def test_cohen_kappa_overflow_regime_matches_oracle(spark):
    """N large enough that sab*1e6 exceeds BIGINT: both engines must
    take the double-division arm and still agree exactly."""
    import duckdb

    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.agreement import (
        cohen_kappa,
        cohen_kappa_oracle_sql,
    )

    n = 6_000_000
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, "y").otherwise("n").alias("a"),
        F.when(F.col("id") % 3 < 2, "y").otherwise("n").alias("b"),
    )
    r = cohen_kappa(df, "a", "b").collect()[0]
    con = duckdb.connect()
    rows = (
        f"SELECT CASE WHEN i % 2 = 0 THEN 'y' ELSE 'n' END AS a, "
        f"CASE WHEN i % 3 < 2 THEN 'y' ELSE 'n' END AS b "
        f"FROM range({n}) t(i)"
    )
    d = con.sql(cohen_kappa_oracle_sql(rows, "a", "b")).fetchone()
    assert (r["n_items"], r["po_ppm"], r["pe_ppm"], r["kappa_ppm"],
            r["band"]) == (d[0], d[1], d[2], d[3], d[4])
    # sanity: this really is the overflow regime for pe's numerator
    assert d[0] * d[0] > (2**63 - 1) // 1_000_000
