from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.graph import (
    MICRO,
    pagerank_quantized,
    transition_edges,
)


def test_transition_edges_counts(spark):
    rows = [
        ("u1", 1, "e1", "a"),
        ("u1", 2, "e2", "b"),
        ("u1", 3, "e3", "a"),
        ("u2", 1, "e4", "a"),
        ("u2", 2, "e5", "b"),
    ]
    df = spark.createDataFrame(rows, "user string, ts int, eid string, node string")
    edges = {
        (r["src"], r["dst"]): r["weight"]
        for r in transition_edges(df, "user", "ts", "node", "eid").collect()
    }
    assert edges == {("a", "b"): 2, ("b", "a"): 1}


def test_pagerank_hand_computed(spark):
    """Two-node cycle a<->b with equal weights: the closed-form integer
    trajectory is checkable by hand.  r0 = 500000 each; every iteration:
    contrib = rank (single out-edge), rank' = 150000//2 + 85*rank//100 —
    fixed point reached immediately at 75000 + 425000 = 500000."""
    edges = spark.createDataFrame(
        [("a", "b", 3), ("b", "a", 3)], "src string, dst string, weight long"
    )
    out = {r["node"]: r["rank_micro"] for r in pagerank_quantized(edges, 85, 3).collect()}
    assert out == {"a": 500000, "b": 500000}


def test_pagerank_sink_attracts_mass(spark):
    """a->b and b->b: b receives everything, a keeps only teleport."""
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "b", 1)], "src string, dst string, weight long"
    )
    out = {r["node"]: r["rank_micro"] for r in pagerank_quantized(edges, 85, 5).collect()}
    assert out["b"] > out["a"]
    # a has no in-edges at all: teleport only, exactly 150000 // 2
    assert out["a"] == 75000
    # total mass conserved up to truncation loss
    assert sum(out.values()) <= MICRO


def test_pagerank_partition_invariant(spark):
    """Integer contributions are exactly associative — identical ranks
    under different edge layouts."""
    rows = [("a", "b", 2), ("b", "c", 1), ("c", "a", 4), ("a", "c", 1)]
    e1 = spark.createDataFrame(rows, "src string, dst string, weight long").repartition(1)
    e8 = spark.createDataFrame(rows, "src string, dst string, weight long").repartition(8)
    r1 = {r["node"]: r["rank_micro"] for r in pagerank_quantized(e1, 85, 3).collect()}
    r8 = {r["node"]: r["rank_micro"] for r in pagerank_quantized(e8, 85, 3).collect()}
    assert r1 == r8


def test_pagerank_validations(spark):
    edges = spark.createDataFrame([("a", "b", 1)], "src string, dst string, weight long")
    with pytest.raises(ValueError):
        pagerank_quantized(edges, damping_pct=0)
    with pytest.raises(ValueError):
        pagerank_quantized(edges, iterations=0)
    with pytest.raises(ValueError):
        pagerank_quantized(edges.where(F.lit(False)))
    # zero weight => out_w can hit 0 => NULL div silently dropped by SUM
    zero_w = spark.createDataFrame(
        [("a", "b", 0), ("b", "a", 1)], "src string, dst string, weight long"
    )
    with pytest.raises(ValueError, match="positive"):
        pagerank_quantized(zero_w)
