from __future__ import annotations

import pytest


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, t long, y long")


def test_sax_words_hand_computed(spark):
    from opentelemetry_collector_components_spark.operators.sax import sax_words

    # seg_len=2 -> PAA means per 2 ticks: [1, 9, 1, 9] for a square
    # wave; alphabet=2 ranks them ab/ab; word_len=2 -> words "ab","ab".
    rows = [("k", t, y) for t, y in enumerate([1, 1, 9, 9, 1, 1, 9, 9])]
    out = sax_words(_series(spark, rows), ["k"], "t", "y", 2, 2, 2)
    got = {r["word_idx"]: (r["word"], r["t_start"], r["n_segments"])
           for r in out.collect()}
    assert got == {0: ("ab", 0, 2), 1: ("ab", 4, 2)}


def test_sax_partial_tail_word(spark):
    from opentelemetry_collector_components_spark.operators.sax import sax_words

    rows = [("k", t, t) for t in range(6)]  # 3 segments, word_len=2
    out = sax_words(_series(spark, rows), ["k"], "t", "y", 2, 2, 3)
    got = {r["word_idx"]: r for r in out.collect()}
    assert got[0]["n_segments"] == 2 and got[1]["n_segments"] == 1
    # rising series: symbols a,b,c in time order
    assert got[0]["word"] == "ab" and got[1]["word"] == "c"


def test_sax_motifs_counts_full_words_only(spark):
    from opentelemetry_collector_components_spark.operators.sax import sax_motifs

    # same square wave repeated: motif "ab" occurs twice; the trailing
    # partial segment must not produce a counted word.
    vals = [1, 1, 9, 9] * 2 + [5]
    rows = [("k", t, y) for t, y in enumerate(vals)]
    out = sax_motifs(_series(spark, rows), ["k"], "t", "y", 2, 2, 2).collect()
    assert len(out) == 1
    assert out[0]["word"] == "ab" and out[0]["n_occurrences"] == 2


def test_sax_validation(spark):
    from opentelemetry_collector_components_spark.operators.sax import sax_words

    with pytest.raises(ValueError):
        sax_words(_series(spark, [("k", 0, 0)]), ["k"], "t", "y", 2, 2, 1)
    with pytest.raises(ValueError):
        sax_words(_series(spark, [("k", 0, 0)]), ["k"], "t", "y", 0, 2, 4)


def test_sax_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.sax import (
        sax_words,
        sax_words_oracle_sql,
    )

    # two keys, awkward lengths, ties in PAA values to stress NTILE
    rows = []
    for k, mult in (("a", 3), ("b", 7)):
        for t in range(23):
            rows.append((k, t, (t * mult) % 11))
    out = sax_words(_series(spark, rows), ["k"], "t", "y", 3, 2, 4)
    spark_rows = {
        (r["k"], r["word_idx"]): (r["t_start"], r["n_segments"], r["word"])
        for r in out.collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE s AS SELECT * FROM (VALUES "
        + ", ".join(f"('{k}', {t}, {y})" for k, t, y in rows)
        + ") v(k, t, y)"
    )
    sql = sax_words_oracle_sql("SELECT * FROM s", ["k"], "t", "y", 3, 2, 4)
    oracle = {
        (r[0], r[1]): (r[2], r[3], r[4]) for r in con.sql(sql).fetchall()
    }
    assert oracle == spark_rows
