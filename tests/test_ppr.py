"""Personalized PageRank: proximity-to-seed semantics, equivalence with
global PageRank when the seed set is every node, validation."""

from __future__ import annotations

import pytest


def _edges(spark, triples):
    return spark.createDataFrame(triples, "src string, dst string, weight long")


def test_ppr_ranks_by_seed_proximity(spark):
    from opentelemetry_collector_components_spark.operators.graph import (
        personalized_pagerank,
    )

    # a -> b -> c -> d chain plus a popular hub z everyone points at:
    # global PageRank would crown z; PPR seeded at 'a' must rank by
    # distance from a, with z getting only what flows through the chain
    edges = _edges(
        spark,
        [("a", "b", 1), ("b", "c", 1), ("c", "d", 1),
         ("x", "z", 5), ("y", "z", 5), ("d", "z", 1)],
    )
    got = {r.node: r.rank_micro for r in
           personalized_pagerank(edges, ["a"], iterations=12).collect()}
    assert got["a"] > got["b"] > got["c"] > got["d"]
    # x and y are unreachable from the seed: teleport never lands on
    # them and nothing links to them -> exactly zero rank
    assert got["x"] == 0 and got["y"] == 0
    # at steady state the hub holds only decayed chain flow: it is NOT
    # globally important, trailing the seed side despite 10 in-link weight
    assert got["z"] < got["b"]


def test_ppr_with_all_nodes_seeded_equals_global_pagerank(spark):
    from opentelemetry_collector_components_spark.operators.graph import (
        pagerank_quantized,
        personalized_pagerank,
    )

    edges = _edges(
        spark, [("a", "b", 2), ("b", "c", 1), ("c", "a", 3), ("a", "c", 1)]
    )
    all_nodes = ["a", "b", "c"]
    ppr = {r.node: r.rank_micro for r in
           personalized_pagerank(edges, all_nodes, iterations=3).collect()}
    pr = {r.node: r.rank_micro for r in
          pagerank_quantized(edges, iterations=3).collect()}
    assert ppr == pr


def test_ppr_validation(spark):
    from opentelemetry_collector_components_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = _edges(spark, [("a", "b", 1)])
    with pytest.raises(ValueError):
        personalized_pagerank(edges, [])
    with pytest.raises(ValueError):
        personalized_pagerank(edges, ["a"], damping_pct=0)
    with pytest.raises(ValueError):
        personalized_pagerank(edges, ["a"], iterations=0)
    with pytest.raises(ValueError):
        personalized_pagerank(_edges(spark, [("a", "b", 0)]), ["a"])
