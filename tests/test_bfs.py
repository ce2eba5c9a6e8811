"""BFS seed-distance over the host graph: hand-checked distances on a
planted graph, hop-cap truncation, early stop, directionality."""

from __future__ import annotations

import pytest


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs],
        "src_host string, dst_host string, n_links long",
    )


def test_bfs_distances_min_over_multiple_seeds(spark):
    from opentelemetry_collector_components_spark.operators.webgraph import (
        bfs_depths,
    )

    # s1 -> a -> b -> c ; s2 -> b ; d is isolated; edge a->s1 makes a cycle
    edges = _edges(
        spark,
        [("s1", "a"), ("a", "b"), ("b", "c"), ("s2", "b"), ("a", "s1"),
         ("d", "d2")],
    )
    seeds = spark.createDataFrame([("s1",), ("s2",), ("s1",)], "node string")
    got = {r.node: r.dist for r in bfs_depths(edges, seeds).collect()}
    # b is 2 hops from s1 but 1 from s2 -> min wins; cycle doesn't loop
    assert got == {"s1": 0, "s2": 0, "a": 1, "b": 1, "c": 2}


def test_bfs_hop_cap_truncates_and_direction_respected(spark):
    from opentelemetry_collector_components_spark.operators.webgraph import (
        bfs_depths,
    )

    chain = [(f"n{i}", f"n{i+1}") for i in range(6)]  # n0 -> ... -> n6
    edges = _edges(spark, chain + [("x", "n0")])  # incoming edge to seed
    seeds = spark.createDataFrame([("n0",)], "node string")
    got = {r.node: r.dist for r in bfs_depths(edges, seeds, max_rounds=3).collect()}
    # cap at 3 hops; x only points AT the seed, so it is never reached
    assert got == {"n0": 0, "n1": 1, "n2": 2, "n3": 3}
    full = {r.node: r.dist for r in bfs_depths(edges, seeds, max_rounds=50).collect()}
    assert full[f"n6"] == 6 and "x" not in full


def test_bfs_zero_rounds_and_validation(spark):
    from opentelemetry_collector_components_spark.operators.webgraph import (
        bfs_depths,
    )

    edges = _edges(spark, [("a", "b")])
    seeds = spark.createDataFrame([("a",)], "node string")
    got = bfs_depths(edges, seeds, max_rounds=0).collect()
    assert [(r.node, r.dist) for r in got] == [("a", 0)]
    with pytest.raises(ValueError):
        bfs_depths(edges, seeds, max_rounds=-1)


def test_bowtie_decomposition_all_classes(spark):
    """Hand graph exercising every bow-tie class: SCC triangle a-b-c,
    i -> IN, o -> OUT, t on an IN->OUT tube, x a tendril off IN, y a
    tendril into OUT, m weakly attached with no qualifying path
    (OTHER), z1/z2 disconnected.  Pivot = max-degree tie-break min id
    = 'a' (in the SCC by construction)."""
    from opentelemetry_collector_components_spark.operators.webgraph import (
        bowtie_decomposition,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("i", "a"), ("c", "o"),
         ("i", "t"), ("t", "o"), ("i", "x"), ("y", "o"), ("m", "x"),
         ("z1", "z2")],
        "src_host string, dst_host string",
    )
    got = {
        r["node"]: r["component"]
        for r in bowtie_decomposition(edges, max_rounds=6).collect()
    }
    assert got == {
        "a": "SCC", "b": "SCC", "c": "SCC",
        "i": "IN", "o": "OUT", "t": "TUBE",
        "x": "TENDRIL_IN", "y": "TENDRIL_OUT", "m": "OTHER",
        "z1": "DISCONNECTED", "z2": "DISCONNECTED",
    }
