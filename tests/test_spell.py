"""SymSpell delete-neighborhood correction: policy, coverage, oracle parity."""

import duckdb
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.spell import (
    spell_correct,
    spell_correct_oracle_sql,
)

VOCAB = [("error", 100), ("radar", 40), ("reads", 30), ("spark", 90), ("spare", 60)]


def _frames(spark, queries):
    q = spark.createDataFrame([(x,) for x in queries], ["q"])
    v = spark.createDataFrame(VOCAB, ["term", "freq"])
    return q, v


def test_all_edit1_forms_found(spark):
    # deletion, insertion, substitution, exact
    q, v = _frames(spark, ["eror", "sparkk", "spafk", "radar"])
    got = {r["q"]: (r["term"], r["distance"]) for r in spell_correct(q, v).collect()}
    assert got["eror"] == ("error", 1)  # deletion in query
    assert got["sparkk"] == ("spark", 1)  # insertion in query
    assert got["spafk"] == ("spark", 1)  # substitution
    assert got["radar"] == ("radar", 0)  # exact hit wins at distance 0


def test_policy_distance_then_freq_then_term(spark):
    # "spark"/"spare": 'sparE' is distance 1 from both -> freq breaks tie
    q, v = _frames(spark, ["spar"])
    got = spell_correct(q, v).collect()[0]
    assert got["term"] == "spark" and got["freq"] == 90  # 90 > 60
    # equal freq -> lexicographic term
    v2 = spark.createDataFrame([("aaab", 5), ("aaac", 5)], ["term", "freq"])
    q2 = spark.createDataFrame([("aaa",)], ["q"])
    assert spell_correct(q2, v2).collect()[0]["term"] == "aaab"


def test_no_candidate_absent(spark):
    q, v = _frames(spark, ["zzzzzz"])
    assert spell_correct(q, v).count() == 0


def test_oracle_parity_and_plan(spark):
    q, v = _frames(
        spark, ["eror", "sparkk", "spafk", "radar", "spar", "zzzz", "reads"]
    )
    out = spell_correct(q, v)
    got = out.toPandas().sort_values("q").reset_index(drop=True)
    con = duckdb.connect()
    con.register("queries_t", q.toPandas())
    con.register("vocab_t", v.toPandas())
    sql = spell_correct_oracle_sql(
        "SELECT q FROM queries_t", "SELECT term, freq FROM vocab_t"
    )
    want = con.sql(sql).df().sort_values("q").reset_index(drop=True)
    assert got["q"].tolist() == want["q"].tolist()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["distance"].tolist() == want["distance"].tolist()
    assert got["freq"].tolist() == want["freq"].tolist()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure JVM
    assert "Window" not in plan  # two-phase arg-min, not a window
