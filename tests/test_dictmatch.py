from __future__ import annotations

import pytest


def _match(spark, docs, cats, **kw):
    from opentelemetry_collector_components_spark.operators.dictmatch import (
        dictionary_phrase_match,
        phrase_table,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dictionary_phrase_match(
        df, "doc_id", "text", phrase_table(spark, cats), **kw
    )
    return {
        (r["doc_id"], r["category"], r["phrase"]): r["n_hits"]
        for r in out.collect()
    }


def test_basic_counts_and_punctuation(spark):
    hits = _match(
        spark,
        [(1, "Foo-Bar baz! foo bar again"), (2, "nothing here")],
        {"c": ["foo bar", "baz"]},
    )
    assert hits == {(1, "c", "foo bar"): 2, (1, "c", "baz"): 1}


def test_periodic_phrase_counts_overlaps(spark):
    hits = _match(spark, [(1, "a b a b a")], {"c": ["a b a"]})
    assert hits == {(1, "c", "a b a"): 2}


def test_short_doc_no_negative_offsets(spark):
    hits = _match(spark, [(1, "tiny")], {"c": ["much longer phrase here"]})
    assert hits == {}


def test_mixed_lengths_and_shuffle_join(spark):
    docs = [(1, "alpha beta gamma alpha beta"), (2, "gamma")]
    cats = {"x": ["alpha beta", "gamma"], "y": ["alpha beta gamma"]}
    expect = {
        (1, "x", "alpha beta"): 2,
        (1, "x", "gamma"): 1,
        (1, "y", "alpha beta gamma"): 1,
        (2, "x", "gamma"): 1,
    }
    assert _match(spark, docs, cats) == expect
    assert _match(spark, docs, cats, broadcast_dict=False) == expect


def test_phrase_normalization_and_errors(spark):
    from opentelemetry_collector_components_spark.operators.dictmatch import (
        normalize_phrase,
        phrase_table,
    )

    assert normalize_phrase("  Foo---BAR  ") == "foo bar"
    with pytest.raises(ValueError):
        normalize_phrase("!!!")
    with pytest.raises(ValueError):
        phrase_table(spark, {"empty": []})


def test_oracle_sql_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.dictmatch import (
        phrase_match_oracle_sql,
    )

    cats = {"c": ["a b a", "foo bar"], "d": ["baz"]}
    docs = [(1, "a b a b a; Foo-bar baz"), (2, "foo bar foo bar")]
    spark_hits = _match(spark, docs, cats)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in docs)
        + ") v(doc_id, text)"
    )
    sql = phrase_match_oracle_sql("SELECT * FROM d", "doc_id", "text", cats)
    oracle = {
        (r[0], r[1], r[2]): r[3] for r in con.sql(sql).fetchall()
    }
    assert oracle == spark_hits


def test_oracle_dedups_normalized_duplicates(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.dictmatch import (
        phrase_match_oracle_sql,
    )

    cats = {"c": ["foo bar", "Foo-Bar"]}  # same canonical form
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT 1 AS doc_id, 'foo bar baz' AS text")
    sql = phrase_match_oracle_sql("SELECT * FROM d", "doc_id", "text", cats)
    rows = con.sql(sql).fetchall()
    assert rows == [(1, "c", "foo bar", 1)]


def test_single_scan_plan(spark):
    from opentelemetry_collector_components_spark.operators.dictmatch import (
        dictionary_phrase_match,
        phrase_table,
    )

    df = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    out = dictionary_phrase_match(
        df, "doc_id", "text",
        phrase_table(spark, {"c": ["a", "b c", "b c d"]}),
    )
    # mixed 1/2/3-token dictionary must not union per-length rescans
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan
