"""k-truss edge peel: closed-form graphs, cascade, oracle parity contract."""

import pytest

from opentelemetry_collector_components_spark.operators.graph import k_truss


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _result(df):
    return {(r["a"], r["b"]): r["support"] for r in df.collect()}


def test_k4_with_tail(spark):
    # K4 on 1-4 (every edge in 2 triangles) plus a pendant chain 4-5-6
    k4 = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
    edges = _edges(spark, k4 + [(4, 5), (5, 6)])
    got = _result(k_truss(edges, k=4))
    assert got == {(i, j): 2 for i, j in k4}
    # the tail edges survive 2-truss (support 0 allowed) with support 0
    got2 = _result(k_truss(edges, k=2))
    assert got2[(4, 5)] == 0 and got2[(5, 6)] == 0
    assert got2[(1, 2)] == 2


def test_cascade_two_triangles_sharing_edge(spark):
    # triangles (1,2,3) and (2,3,4) share edge (2,3): its support is 2 but
    # every other edge has 1, so 4-truss must cascade to EMPTY in 2 rounds
    edges = _edges(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    assert _result(k_truss(edges, k=4)) == {}
    # 3-truss keeps everything (each edge is in >= 1 triangle)
    assert set(_result(k_truss(edges, k=3))) == {(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)}


def test_direction_multiplicity_selfloops_ignored(spark):
    edges = _edges(
        spark,
        [(2, 1), (1, 2), (3, 1), (2, 3), (3, 3)],
    )
    got = _result(k_truss(edges, k=3))
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1}


def test_validation_and_round_exhaustion(spark):
    edges = _edges(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    with pytest.raises(ValueError):
        k_truss(edges, k=1)
    with pytest.raises(ValueError, match="fixpoint"):
        k_truss(edges, k=4, max_rounds=1)  # needs the cascade round


def test_oracle_parity_on_host_graph(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.graph import (
        k_truss_oracle_sql,
    )
    from opentelemetry_collector_components_spark.operators.webgraph import (
        host_link_edges,
    )
    from opentelemetry_collector_components_spark.sources.pages import (
        generate_linked_pages,
    )

    edges = host_link_edges(generate_linked_pages(spark, 1500, replayable=True))
    got = k_truss(edges, k=3, src_col="src_host", dst_col="dst_host", max_rounds=8)
    gpd = got.toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    epd = edges.select("src_host", "dst_host").toPandas()
    con = duckdb.connect()
    con.register("host_edges", epd)
    sql = k_truss_oracle_sql(
        "SELECT src_host, dst_host FROM host_edges",
        k=3,
        src_col="src_host",
        dst_col="dst_host",
        rounds=8,
    )
    want = con.sql(sql).df().sort_values(["a", "b"]).reset_index(drop=True)
    assert len(gpd) == len(want) > 0
    assert gpd["a"].tolist() == want["a"].tolist()
    assert gpd["b"].tolist() == want["b"].tolist()
    assert gpd["support"].tolist() == want["support"].tolist()
