"""Deterministic sampling and sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_sample_deterministic_and_rate_shaped(spark):
    from opentelemetry_collector_components_spark.operators.sampling import (
        sample_by_rates,
    )

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
    )
    kept = sample_by_rates(df, {"a": 0.1, "b": 0.9}, seed=3)
    counts = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert 120 < counts["a"] < 280  # ~200 of 2000
    assert 1650 < counts["b"] < 1940  # ~1800 of 2000
    # deterministic: same seed -> identical sample
    again = sample_by_rates(df, {"a": 0.1, "b": 0.9}, seed=3)
    assert kept.exceptAll(again).count() == 0 and again.exceptAll(kept).count() == 0
    # different seed -> different sample
    other = sample_by_rates(df, {"a": 0.1, "b": 0.9}, seed=4)
    assert other.exceptAll(kept).count() > 0


def test_pack_sequences_offsets_and_straddle(spark):
    from opentelemetry_collector_components_spark.operators.sampling import (
        pack_sequences,
    )

    rows = [(1, "s", 100), (2, "s", 100), (3, "s", 100), (4, "t", 300)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = {r.doc_id: r for r in pack_sequences(df, budget=256).collect()}
    assert (out[1].start_offset, out[1].seq_id, out[1].straddles) == (0, 0, False)
    # doc 2 spans tokens 100..199 -> seq 0, no straddle
    assert (out[2].seq_id, out[2].end_seq_id, out[2].straddles) == (0, 0, False)
    # doc 3 spans 200..299 -> starts in seq 0, ends in seq 1
    assert (out[3].seq_id, out[3].end_seq_id, out[3].straddles) == (0, 1, True)
    # partition t packs independently from offset 0
    assert (out[4].start_offset, out[4].seq_id, out[4].end_seq_id) == (0, 0, 1)
