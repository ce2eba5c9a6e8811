"""DBSCAN from pairs: hand-checked cluster/border/noise roles,
min-rule border attachment, singleton cores, validation."""

from __future__ import annotations

import pytest


def _run(spark, ids, pairs, min_pts):
    from opentelemetry_collector_components_spark.operators.dbscan import (
        dbscan_from_pairs,
    )

    idf = spark.createDataFrame([(i,) for i in ids], "id long")
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        r.id: (r.role, r.cluster)
        for r in dbscan_from_pairs(idf, pdf, min_pts).collect()
    }


def test_dbscan_hand_checked(spark):
    # dense triangle {1,2,3} + border 4 hanging off 3 + isolated 9
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4)]
    got = _run(spark, [1, 2, 3, 4, 9], pairs, min_pts=3)
    # 1,2 have 2 neighbors; 3 has 3 -> all cores (>= min_pts-1 = 2)
    assert got[1] == ("core", 1)
    assert got[2] == ("core", 1)
    assert got[3] == ("core", 1)
    # 4 has 1 neighbor -> not core, but neighbor 3 is core -> border
    assert got[4] == ("border", 1)
    assert got[9] == ("noise", None)


def test_dbscan_border_min_rule_and_singleton_core(spark):
    # two separate cores 1 and 10 (3-neighbor stars), point 5 touches
    # both but has only 2 neighbors (< min_pts-1 = 3): border attaches
    # to the MIN cluster id
    pairs = [(1, 2), (1, 3), (10, 11), (10, 12), (1, 5), (5, 10)]
    got = _run(spark, [1, 2, 3, 5, 10, 11, 12], pairs, min_pts=4)
    assert got[1][0] == "core" and got[10][0] == "core"
    assert got[5] == ("border", got[1][1])
    assert got[5][1] == min(got[1][1], got[10][1])
    # a core whose neighbors are all borders anchors its own cluster
    star = [(100, 101), (100, 102), (100, 103)]
    got2 = _run(spark, [100, 101, 102, 103], star, min_pts=4)
    assert got2[100] == ("core", 100)
    assert got2[101] == ("border", 100)

    with pytest.raises(ValueError):
        _run(spark, [1], [], min_pts=1)


def test_dbscan_two_chained_cores_merge(spark):
    # cores 1 and 2 are eps-neighbors of each other: one cluster
    pairs = [(1, 2), (1, 3), (1, 4), (2, 5), (2, 6)]
    got = _run(spark, [1, 2, 3, 4, 5, 6], pairs, min_pts=3)
    assert got[1] == ("core", 1) and got[2] == ("core", 1)
    for b in (3, 4, 5, 6):
        assert got[b] == ("border", 1)


def test_dbscan_lsh_compose_plan_is_blocked(spark):
    # the production compose (queries.py::q_dbscan_embeddings_lsh) must
    # source pairs from the bucket equi-join, never the all-pairs cross
    # join: no nested-loop join anywhere in the plan
    from opentelemetry_collector_components_spark.queries import SPARK_QUERIES

    df = SPARK_QUERIES["dbscan_embeddings_lsh"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dbscan_lsh_pairs_subset_of_exact(spark):
    # LSH blocking only ever DROPS pairs (recall trade) — every blocked
    # pair must also be an exact near pair, same cosine threshold
    from opentelemetry_collector_components_spark.operators.similarity import (
        embedding_near_pairs,
        md5_plane_signs,
    )
    from opentelemetry_collector_components_spark.queries import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_pairs(
            emb, threshold=0.4, allow_all_pairs=True
        ).collect()
    }
    blocked = {
        (r.id_a, r.id_b)
        for r in embedding_near_pairs(
            emb, threshold=0.4, block_planes=md5_plane_signs(4, 64)
        ).collect()
    }
    assert blocked <= exact
    assert blocked  # the fixture's near-identical vectors do collide
