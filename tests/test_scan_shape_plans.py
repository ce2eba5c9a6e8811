"""Plan-shape pins for the cost-dominant scan shapes (r5).

The 10x stress rows in BENCH/BASELINE.md prove these shapes scale
linearly by measurement; these tests pin the PLAN properties that make
that true, so a regression (an accidental shuffle or per-row Python in
a scan) fails fast at test time instead of showing up as a bench cliff.
"""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_main_content_scan_is_shuffle_free(spark):
    from opentelemetry_collector_components_spark.functions.webtext import (
        add_main_content,
        decode_entities,
    )
    from opentelemetry_collector_components_spark.sources.pages import (
        generate_article_pages,
    )

    out = add_main_content(generate_article_pages(spark, 100)).select(
        "doc_id", decode_entities(F.col("main_text")).alias("text")
    )
    plan = _plan(out)
    assert "Exchange" not in plan  # pure narrow map over the generator
    assert "BatchEvalPython" not in plan


def test_warc_http_parse_is_shuffle_free(spark):
    from opentelemetry_collector_components_spark.sources.warc import (
        generate_warc_records,
        parse_http_response,
        parse_warc_records,
    )

    out = parse_http_response(parse_warc_records(generate_warc_records(spark, 100)))
    plan = _plan(out)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_semantic_dedup_vec_single_cluster_shuffle(spark):
    from opentelemetry_collector_components_spark.operators.similarity import (
        semantic_dedup_pairs_vectorized,
    )
    from opentelemetry_collector_components_spark.queries import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    cents = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 5).collect()
    ]
    plan = _plan(semantic_dedup_pairs_vectorized(emb, cents, threshold=0.35))
    # exactly one hash-partitioning exchange: the cluster-id co-location
    # for applyInPandas; anything more means the matmul stage gained an
    # unplanned shuffle
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan
