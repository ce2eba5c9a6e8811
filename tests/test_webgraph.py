"""Web-graph triangle counting: degree-ordered node-iterator vs the
definition (brute force), noise canonicalization, JVM-only plan."""

from __future__ import annotations


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------
def test_triangles_known_graph(spark):
    from opentelemetry_collector_components_spark.operators.webgraph import (
        triangle_counts,
    )

    # K4 (4 triangles, 3 per node) + a 3-path (0) + noise: dup/rev/self
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (4, 5), (5, 6),
             (1, 0), (2, 2), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0, 5: 0, 6: 0}


def test_triangles_match_brute_force(spark):
    import itertools

    from opentelemetry_collector_components_spark.operators.webgraph import (
        triangle_counts,
    )

    es = [((i * 7 + j) % 13, (i * 11 + 3 * j) % 13) for i in range(40) for j in range(3)]
    df = spark.createDataFrame(es, "src long, dst long")
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    und = {tuple(sorted(e)) for e in es if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    tri = {n: 0 for n in nodes}
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in und and (x, z) in und and (y, z) in und:
            tri[x] += 1
            tri[y] += 1
            tri[z] += 1
    assert sum(tri.values()) > 0  # fixture actually contains triangles
    assert got == tri


def test_triangles_plan_is_jvm_only(spark):
    from opentelemetry_collector_components_spark.operators.webgraph import (
        triangle_counts,
    )

    df = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "src long, dst long")
    plan = triangle_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
