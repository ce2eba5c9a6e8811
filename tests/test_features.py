from __future__ import annotations

import pytest


def test_hashed_features_counts_and_signs(spark):
    from opentelemetry_collector_components_spark.operators.features import (
        hashed_features,
    )

    df = spark.createDataFrame(
        [(1, "Foo foo BAR baz"), (2, "foo")], "doc_id long, text string"
    )
    out = hashed_features(df, "doc_id", "text", n_features=1 << 16)
    rows = {(r["doc_id"], r["feature_idx"]): r["value"] for r in out.collect()}
    # 'foo' appears twice in doc 1 and once in doc 2 under the SAME index
    foo_idx = [k[1] for k, v in rows.items() if k[0] == 2]
    assert len(foo_idx) == 1
    assert abs(rows[(1, foo_idx[0])]) == 2 and abs(rows[(2, foo_idx[0])]) == 1
    # sign is consistent for the same token across docs
    assert rows[(1, foo_idx[0])] == 2 * rows[(2, foo_idx[0])]
    # doc 1 carries three distinct tokens (assuming no index collision
    # at 65536 features for this tiny vocabulary)
    assert len([k for k in rows if k[0] == 1]) == 3


def test_unsigned_mode_and_validation(spark):
    from opentelemetry_collector_components_spark.operators.features import (
        hashed_features,
    )

    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    out = hashed_features(df, "doc_id", "text", n_features=8, signed=False)
    assert sum(r["value"] for r in out.collect()) == 3  # all +1 weights
    with pytest.raises(ValueError):
        hashed_features(df, "doc_id", "text", n_features=100)


def test_xxhash_engine_same_shape(spark):
    from opentelemetry_collector_components_spark.operators.features import (
        hashed_features,
    )

    df = spark.createDataFrame([(1, "x y z x")], "doc_id long, text string")
    out = hashed_features(df, "doc_id", "text", n_features=1 << 10,
                          engine="xxhash")
    rows = out.collect()
    assert sum(abs(r["value"]) for r in rows) == 4
    assert all(0 <= r["feature_idx"] < 1024 for r in rows)


def test_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.features import (
        hashed_features,
        hashed_features_oracle_sql,
    )

    docs = [(1, "the quick brown fox the quick"), (2, "lazy dog dog")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spark_rows = {
        (r["doc_id"], r["feature_idx"]): r["value"]
        for r in hashed_features(df, "doc_id", "text", n_features=64).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in docs)
        + ") v(doc_id, text)"
    )
    sql = hashed_features_oracle_sql("SELECT * FROM d", "doc_id", "text", 64)
    oracle = {(r[0], r[1]): r[2] for r in con.sql(sql).fetchall()}
    assert oracle == spark_rows
