"""Readability formulas: hand-counted fixtures + cross-engine expressions."""

import duckdb
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.functions.textstats import (
    readability_oracle_exprs,
    readability_scores,
)

TEXT = "The cat sat on the mat. It was happy! Really? Yes."
# hand counts: letters=38, words=12, sentence runs=4, vowel groups:
# The(1) cat(1) sat(1) on(1) the(1) mat(1) It(1) was(1) happy(2)
# Really(3: ea,y? 'Really' -> e,a...  R-ea-lly-y: groups 'ea','y' = 2)
# -> verified numerically below instead of by hand for syllables


def test_scores_match_formulas(spark):
    df = spark.createDataFrame([(TEXT,)], ["t"])
    s = readability_scores(F.col("t"))
    row = df.select(
        *[v.alias(k) for k, v in s.items()],
    ).collect()[0]
    import re

    letters = len(re.sub(r"[^A-Za-z]", "", TEXT))
    words = len(re.findall(r"[A-Za-z]+", TEXT))
    sents = len(re.findall(r"[.!?]+", TEXT))
    syll = len(re.findall(r"[AEIOUYaeiouy]+", TEXT))
    assert (row["n_letters"], row["n_words"], row["n_sentences"], row["n_syllables"]) == (
        letters, words, sents, syll,
    )
    wps, spw, lpw = words / sents, syll / words, letters / words
    assert abs(row["flesch_ease"] - (206.835 - 1.015 * wps - 84.6 * spw)) < 1e-12
    assert abs(row["fk_grade"] - (0.39 * wps + 11.8 * spw - 15.59)) < 1e-12
    assert abs(row["ari"] - (4.71 * lpw + 0.5 * wps - 21.43)) < 1e-12
    assert abs(
        row["coleman_liau"]
        - (0.0588 * 100.0 * lpw - 0.296 * (100.0 * sents / words) - 15.8)
    ) < 1e-12


def test_empty_text_floors_denominators(spark):
    df = spark.createDataFrame([("",), ("???",)], ["t"])
    s = readability_scores(F.col("t"))
    rows = df.select(*[v.alias(k) for k, v in s.items()]).collect()
    for row in rows:
        assert row["n_words"] == 0
        assert row["flesch_ease"] is not None  # GREATEST(1) kept it finite


def test_oracle_exprs_bit_match_spark(spark):
    sdf = spark.createDataFrame(
        [(TEXT,), ("no punctuation here at all",), ("",)], ["t"]
    )
    s = readability_scores(F.col("t"))
    got = sdf.select(*[v.alias(k) for k, v in s.items()]).toPandas()
    e = readability_oracle_exprs("t")
    con = duckdb.connect()
    con.register("fixture", sdf.select("t").toPandas())
    want = con.sql(
        "SELECT " + ", ".join(f"{v} AS {k}" for k, v in e.items()) + " FROM fixture"
    ).df()
    for k in e:
        assert got[k].tolist() == want[k].tolist(), k
