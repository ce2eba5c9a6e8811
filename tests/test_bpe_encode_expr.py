"""JVM literal-replace BPE encoder: parity with the pandas-UDF path."""

from opentelemetry_collector_components_spark.operators.bpe import (
    bpe_encode,
    bpe_encode_expr,
    learn_bpe_merges,
)

import pyspark.sql.functions as F

MERGES = [("l", "o"), ("lo", "w"), ("e", "r"), ("er", "</w>"), ("low", "</w>")]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_known_merges(spark):
    out = (
        _docs(spark, ["low lower lowest", "", "   ", "a low blow"])
        .select(bpe_encode_expr(F.col("text"), MERGES).alias("toks"))
        .collect()
    )
    assert out[0]["toks"] == [
        "low</w>", "low", "er</w>", "low", "e", "s", "t", "</w>",
    ]
    assert out[1]["toks"] == [] and out[2]["toks"] == []
    # "blow": l+o, lo+w, then low+</w> all fire inside the word — but the
    # framing stops "low</w>" matching as a bare substring of "b lo w"
    assert out[3]["toks"] == ["a", "</w>", "low</w>", "b", "low</w>"]


def test_overlapping_chain(spark):
    # framing must let adjacent pairs both merge: "a a a a" under (a,a)
    out = (
        _docs(spark, ["aaaa"])
        .select(bpe_encode_expr(F.col("text"), [("a", "a")]).alias("toks"))
        .first()["toks"]
    )
    assert out == ["aa", "aa", "</w>"]


def test_parity_with_pandas_udf_encoder(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    merges = learn_bpe_merges(docs, n_merges=12)
    both = (
        bpe_encode(docs, merges)
        .select(
            "bpe_tokens",
            bpe_encode_expr(F.col("text"), merges).alias("expr_tokens"),
        )
        .collect()
    )
    for r in both:
        assert r["bpe_tokens"] == r["expr_tokens"]


def test_control_bytes_stripped(spark):
    out = (
        _docs(spark, ["l\x01o\x02w\x03 low"])
        .select(bpe_encode_expr(F.col("text"), MERGES).alias("toks"))
        .first()["toks"]
    )
    # framing bytes removed BEFORE framing: "low low"
    assert out == ["low</w>", "low</w>"]
