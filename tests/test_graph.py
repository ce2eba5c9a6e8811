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


# ---------------------------------------------------------------------------
# HITS hubs/authorities
# ---------------------------------------------------------------------------
def test_hits_separates_hubs_from_authorities(spark):
    from opentelemetry_collector_components_spark.operators.graph import (
        hits_quantized,
    )

    # star: "hub" points at three "sinks"; one extra endorsement s1->s2
    edges = spark.createDataFrame(
        [("hub", "s1", 1), ("hub", "s2", 1), ("hub", "s3", 1), ("s1", "s2", 1)],
        "src string, dst string, weight long",
    )
    got = {r.node: (r.hub_micro, r.auth_micro) for r in hits_quantized(edges).collect()}
    # the pure hub has the max hub score and zero authority (no in-edges)
    assert got["hub"][0] == 1_000_000 and got["hub"][1] == 0
    # s2 is the strongest authority (two in-edges), s3 weakest of the sinks
    assert got["s2"][1] == 1_000_000
    assert got["s2"][1] > got["s1"][1] >= got["s3"][1]
    # pure sinks have zero hub score except s1 (it points at s2)
    assert got["s3"][0] == 0 and got["s1"][0] > 0


def test_hits_python_reference_parity(spark):
    from opentelemetry_collector_components_spark.operators.graph import (
        MICRO,
        hits_quantized,
    )

    es = [(f"n{i % 5}", f"n{(i * 3 + 1) % 5}", (i % 3) + 1) for i in range(12)]
    agg: dict = {}
    for s, d, w in es:
        if s != d:
            agg[(s, d)] = agg.get((s, d), 0) + w
    edges = spark.createDataFrame(
        [(s, d, w) for (s, d), w in agg.items()], "src string, dst string, weight long"
    )
    got = {
        r.node: (r.hub_micro, r.auth_micro)
        for r in hits_quantized(edges, iterations=3).collect()
    }
    nodes = sorted({n for e in agg for n in e})
    hub = {n: MICRO for n in nodes}
    for _ in range(3):
        a_raw = {n: 0 for n in nodes}
        for (s, d), w in agg.items():
            a_raw[d] += hub[s] * w
        amax = max(a_raw.values())
        auth = {n: (v * MICRO) // amax for n, v in a_raw.items() if v}
        h_raw = {n: 0 for n in nodes}
        for (s, d), w in agg.items():
            h_raw[s] += auth.get(d, 0) * w
        hmax = max(h_raw.values())
        hub = {n: (v * MICRO) // hmax for n, v in h_raw.items() if v}
        auth_final = auth
    want = {n: (hub.get(n, 0), auth_final.get(n, 0)) for n in nodes}
    assert got == want


def test_hits_validation(spark):
    import pytest as _pytest

    from opentelemetry_collector_components_spark.operators.graph import (
        hits_quantized,
    )

    edges = spark.createDataFrame(
        [("a", "b", 0)], "src string, dst string, weight long"
    )
    with _pytest.raises(ValueError):
        hits_quantized(edges)
    ok = spark.createDataFrame([("a", "b", 1)], "src string, dst string, weight long")
    with _pytest.raises(ValueError):
        hits_quantized(ok, iterations=0)


def _kcore_edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_k_core_triangle_with_tendril(spark):
    """Triangle a-b-c plus tendril c-d: the 2-core is exactly the
    triangle; d peels in round one and c's degree drops 3->2."""
    from opentelemetry_collector_components_spark.operators.graph import k_core

    edges = _kcore_edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    got = {r["node"]: r["degree_in_core"] for r in k_core(edges, 2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_k_core_chain_collapses(spark):
    """Path a-b-c-d has no 2-core: endpoints peel, then the middle."""
    from opentelemetry_collector_components_spark.operators.graph import k_core

    edges = _kcore_edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert k_core(edges, 2).count() == 0


def test_k_core_self_loops_and_duplicates_ignored(spark):
    """Self-loops and duplicate/reversed edges must not inflate degrees."""
    from opentelemetry_collector_components_spark.operators.graph import k_core

    edges = _kcore_edges(
        spark,
        [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "a")],
    )
    got = {r["node"]: r["degree_in_core"] for r in k_core(edges, 2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_k_core_max_rounds_raises(spark):
    """A long path needs one round per endpoint pair; max_rounds=1 on a
    5-path cannot reach fixpoint for k=2."""
    import pytest as _pytest

    from opentelemetry_collector_components_spark.operators.graph import k_core

    edges = _kcore_edges(
        spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
    )
    with _pytest.raises(ValueError, match="fixpoint"):
        k_core(edges, 2, max_rounds=1)
    with _pytest.raises(ValueError):
        k_core(edges, 0)


def test_k_core_oracle_matches_duckdb(spark):
    """The unrolled-CTE oracle replays the identical peel in DuckDB."""
    import duckdb

    from opentelemetry_collector_components_spark.operators.graph import (
        k_core,
        k_core_oracle_sql,
    )

    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
             ("e", "c"), ("f", "a"), ("f", "g")]
    edges = _kcore_edges(spark, pairs)
    got = sorted(
        (r["node"], r["degree_in_core"]) for r in k_core(edges, 2).collect()
    )
    con = duckdb.connect()
    values = ", ".join(f"('{s}', '{d}')" for s, d in pairs)
    sql = k_core_oracle_sql(
        f"SELECT * FROM (VALUES {values}) v(src, dst)", 2, rounds=6
    )
    want = sorted((n, int(c)) for n, c in con.execute(sql).fetchall())
    assert got == want


def test_harmonic_path_hand_computed(spark):
    """Path a-b-c-d, radius 3: closed-form micro sums."""
    from opentelemetry_collector_components_spark.operators.graph import (
        harmonic_centrality,
    )

    edges = _kcore_edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {
        r["node"]: (r["harmonic_micro"], r["reachable"])
        for r in harmonic_centrality(edges, radius=3).collect()
    }
    end = 1_000_000 + 500_000 + 333_333
    mid = 1_000_000 + 1_000_000 + 500_000
    assert got == {"a": (end, 3), "b": (mid, 3), "c": (mid, 3), "d": (end, 3)}


def test_harmonic_radius_truncates(spark):
    """radius=1 reduces to degree * 1e6."""
    from opentelemetry_collector_components_spark.operators.graph import (
        harmonic_centrality,
    )

    edges = _kcore_edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
    got = {r["node"]: r["harmonic_micro"] for r in harmonic_centrality(edges, 1).collect()}
    assert got == {
        "a": 2_000_000,
        "b": 2_000_000,
        "c": 3_000_000,
        "d": 1_000_000,
    }


def test_harmonic_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.graph import (
        harmonic_centrality,
        harmonic_oracle_sql,
    )

    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
             ("e", "f"), ("f", "g"), ("g", "a")]
    edges = _kcore_edges(spark, pairs)
    got = sorted(map(tuple, harmonic_centrality(edges, radius=3).collect()))
    values = ", ".join(f"('{s}', '{d}')" for s, d in pairs)
    sql = harmonic_oracle_sql(f"SELECT * FROM (VALUES {values}) v(src, dst)", 3)
    want = sorted(
        (n, int(h), int(c)) for n, h, c in duckdb.connect().execute(sql).fetchall()
    )
    assert got == want


def _py_balls(pairs, radius):
    """Exact radius-r ball membership (excluding self) per node."""
    adj = {}
    for s, d in pairs:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    balls = {}
    for v in adj:
        seen = {v: 0}
        frontier = [v]
        for dist in range(1, radius + 1):
            nxt = []
            for u in frontier:
                for w in adj.get(u, ()):
                    if w not in seen:
                        seen[w] = dist
                        nxt.append(w)
            frontier = nxt
        balls[v] = {u: d for u, d in seen.items() if u != v}
    return balls


def _py_registers(members, m):
    """Expected (s_scaled, zero_buckets) from md5 register replay."""
    import hashlib

    regs = {}
    for n in members:
        b = int(hashlib.md5(f"{n}:hb".encode()).hexdigest()[:15], 16) % m
        v = int(hashlib.md5(f"{n}:hr".encode()).hexdigest()[:15], 16) % (2**24)
        rho = (24 - v.bit_length() + 1) if v > 0 else 25
        regs[b] = max(regs.get(b, 0), rho)
    s = sum(1 << (40 - r) for r in regs.values()) + (m - len(regs)) * (1 << 40)
    return s, m - len(regs)


def test_hyperball_registers_match_exact_balls(spark):
    """Register states are a pure function of ball membership: the
    iterative max-merge must agree with a direct Python replay."""
    from opentelemetry_collector_components_spark.operators.graph import (
        hyperball_registers,
    )

    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("c", "e"),
             ("e", "f"), ("f", "a"), ("g", "a")]
    m = 16
    got = {
        (r["node"], r["radius"]): (r["s_scaled"], r["zero_buckets"])
        for r in hyperball_registers(
            _kcore_edges(spark, pairs), radius=2, p=4, engine="md5"
        ).collect()
    }
    for radius in (1, 2):
        balls = _py_balls(pairs, radius)
        for v, others in balls.items():
            want = _py_registers(set(others) | {v}, m)
            assert got[(v, radius)] == want, (v, radius)


def test_hyperball_estimate_tracks_ball_sizes(spark):
    """HLL estimates from the registers approximate exact ball sizes
    (deterministic md5 registers -> the error is fixed, pinned loose)."""
    from opentelemetry_collector_components_spark.operators.graph import (
        hll_ball_estimate,
        hyperball_registers,
    )

    pairs = [(f"n{i}", f"n{(i * 7 + 1) % 120}") for i in range(120)]
    pairs += [(f"n{i}", f"n{(i * 3 + 2) % 120}") for i in range(120)]
    rows = hyperball_registers(
        _kcore_edges(spark, pairs), radius=2, p=6, engine="md5"
    ).collect()
    balls = _py_balls(pairs, 2)
    errs = []
    for r in [x for x in rows if x["radius"] == 2]:
        exact = len(balls[r["node"]]) + 1
        est = hll_ball_estimate(r["s_scaled"], r["zero_buckets"], 64)
        errs.append(abs(est - exact) / exact)
    assert len(errs) == 120
    assert sum(errs) / len(errs) < 0.30, sum(errs) / len(errs)


def test_hyperball_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.graph import (
        hyperball_oracle_sql,
        hyperball_registers,
    )

    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "a"),
             ("b", "f"), ("f", "g")]
    got = sorted(
        map(tuple, hyperball_registers(
            _kcore_edges(spark, pairs), radius=3, p=4, engine="md5"
        ).collect())
    )
    values = ", ".join(f"('{s}', '{d}')" for s, d in pairs)
    sql = hyperball_oracle_sql(f"SELECT * FROM (VALUES {values}) v(src, dst)", 3, 4)
    want = sorted(
        (n, int(r), int(s), int(z))
        for n, r, s, z in duckdb.connect().execute(sql).fetchall()
    )
    assert got == want


def test_components_star_two_cliques_and_bridge_chain(spark):
    from opentelemetry_collector_components_spark.operators.graph import (
        connected_components_star,
    )

    pairs = [("a", "b"), ("b", "c"), ("a", "c"),       # clique min a
             ("x", "y"), ("y", "z"),                   # path min x
             ("m", "n")]                               # pair min m
    got = {r["node"]: r["component"] for r in connected_components_star(
        _kcore_edges(spark, pairs)).collect()}
    assert got == {"a": "a", "b": "a", "c": "a",
                   "x": "x", "y": "x", "z": "x",
                   "m": "m", "n": "m"}


def test_components_star_long_path_logarithmic_rounds(spark):
    """A 48-node path converges within 8 alternations — the O(log n)
    property min-label propagation does not have (it would need ~48)."""
    from opentelemetry_collector_components_spark.operators.graph import (
        connected_components_star,
    )

    pairs = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(47)]
    got = {r["node"]: r["component"] for r in connected_components_star(
        _kcore_edges(spark, pairs), max_rounds=8).collect()}
    assert len(got) == 48
    assert set(got.values()) == {"n00"}


def test_components_star_matches_label_propagation(spark):
    """Same clusters as near_dedup_components on a planted pair graph."""
    from opentelemetry_collector_components_spark.operators.dedup import (
        near_dedup_components,
    )
    from opentelemetry_collector_components_spark.operators.graph import (
        connected_components_star,
    )

    rows = [(i, (i * 13) % 40 + 100) for i in range(40)]
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    star = {r["node"]: r["component"] for r in connected_components_star(
        pairs, "id_a", "id_b").collect()}
    lp = {r["doc_id"]: r["component"] for r in near_dedup_components(pairs).collect()}
    assert star == lp


def test_components_star_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.graph import (
        components_star_oracle_sql,
        connected_components_star,
    )

    pairs = [(f"h{(i * 7) % 15}", f"h{(i * 11) % 15 + 3}") for i in range(25)]
    got = sorted(map(tuple, connected_components_star(
        _kcore_edges(spark, pairs)).collect()))
    values = ", ".join(f"('{s}', '{d}')" for s, d in pairs)
    sql = components_star_oracle_sql(f"SELECT * FROM (VALUES {values}) v(src, dst)")
    want = sorted(duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_neighborhood_function_path(spark):
    """Path a-b-c-d: N(1) = 6 ordered pairs, N(2) = 10, N(3) = 12."""
    from opentelemetry_collector_components_spark.operators.graph import (
        effective_diameter_90,
        neighborhood_function,
    )

    edges = _kcore_edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    nf = neighborhood_function(edges, radius=3)
    got = {r["radius"]: (r["pairs"], r["nodes"]) for r in nf.collect()}
    assert got == {1: (6, 4), 2: (10, 4), 3: (12, 4)}
    # 90% of 12 = 10.8 -> first radius with >= that is 3
    assert effective_diameter_90(nf) == 3


def test_neighborhood_function_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.graph import (
        neighborhood_function,
        neighborhood_oracle_sql,
    )

    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
             ("e", "f")]
    got = sorted(map(tuple, neighborhood_function(
        _kcore_edges(spark, pairs), 3).collect()))
    values = ", ".join(f"('{s}', '{d}')" for s, d in pairs)
    sql = neighborhood_oracle_sql(f"SELECT * FROM (VALUES {values}) v(src, dst)", 3)
    want = sorted(
        (int(r), int(p), int(n))
        for r, p, n in duckdb.connect().execute(sql).fetchall()
    )
    assert got == want


def test_neighborhood_function_releases_pairs_and_early_exits(spark):
    """Review fix: the pair set must be unpersisted after the counts
    are collected, and saturated curves pad flat (early exit)."""
    from opentelemetry_collector_components_spark.operators.graph import (
        effective_diameter_90,
        neighborhood_function,
    )

    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    nf = neighborhood_function(
        _kcore_edges(spark, [("a", "b"), ("b", "c")]), radius=5
    )
    rows = {r["radius"]: r["pairs"] for r in nf.collect()}
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after <= before  # nothing leaked by this call
    # saturates at r=2 (path of 3 nodes); r=3..5 pad flat
    assert rows == {1: 4, 2: 6, 3: 6, 4: 6, 5: 6}
    # self-loop-only graph: no pairs -> None, not radius 1
    loops = _kcore_edges(spark, [("x", "x")])
    nf0 = neighborhood_function(loops, radius=2)
    assert all(r["pairs"] == 0 for r in nf0.collect())
    assert effective_diameter_90(nf0) is None


# --- deterministic random walks --------------------------------------------
from opentelemetry_collector_components_spark.operators.graph import (  # noqa: E402
    random_walks,
)


def test_walks_follow_edges_and_stop_at_dead_ends(spark):
    # 1 -> {2}, 2 -> {3}, 3 has no out-edges: the only possible walk from
    # 1 is 1,2,3 then stops; from 3 no walk starts
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    rows = random_walks(edges, length=5).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r.walk_id, {})[r.step] = r.node
    assert by_walk[1] == {0: 1, 1: 2, 2: 3}  # stops short at the dead end
    assert by_walk[2] == {0: 2, 1: 3}
    assert 3 not in by_walk  # no out-edges: no walk


def test_walks_deterministic_and_uniformish(spark):
    # star center with many neighbors: choices are a pure function of
    # (walk_id, step) and must repeat identically across partitioning
    edges = spark.createDataFrame(
        [(0, d) for d in range(1, 21)] + [(d, 0) for d in range(1, 21)],
        "src long, dst long",
    )
    a = sorted(map(tuple, random_walks(edges.repartition(1), length=6).collect()))
    b = sorted(map(tuple, random_walks(edges.repartition(9), length=6).collect()))
    assert a == b
    # every visited node is a graph node and steps alternate star levels
    for walk_id, step, node in a:
        assert 0 <= node <= 20


def test_walks_validation(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    import pytest as _pt
    with _pt.raises(ValueError, match="length"):
        random_walks(edges, length=0)


def test_skipgram_pairs_hand_checked(spark):
    from opentelemetry_collector_components_spark.operators.graph import (
        skipgram_pairs,
    )

    walks = spark.createDataFrame(
        [(1, 0, 10), (1, 1, 20), (1, 2, 30), (2, 0, 10), (2, 1, 30)],
        "walk_id long, step int, node long",
    )
    got = {
        (r.center, r.context): r.n_pairs
        for r in skipgram_pairs(walks, window=1).collect()
    }
    # window 1: adjacent pairs only, both directions
    assert got == {
        (10, 20): 1, (20, 10): 1, (20, 30): 1, (30, 20): 1,
        (10, 30): 1, (30, 10): 1,
    }
    wide = {
        (r.center, r.context): r.n_pairs
        for r in skipgram_pairs(walks, window=2).collect()
    }
    assert wide[(10, 30)] == 2  # adjacent in walk 2 + distance-2 in walk 1
    import pytest as _pt
    with _pt.raises(ValueError, match="window"):
        skipgram_pairs(walks, window=0)


def test_negative_samples_inverse_cdf(spark):
    from opentelemetry_collector_components_spark.operators.graph import (
        skipgram_negative_samples,
    )

    pairs = spark.createDataFrame([(1, 2), (3, 4)], "center long, context long")
    freq = spark.createDataFrame(
        [(10, 100), (20, 100), (30, 1)], "node long, n long"
    )
    out = skipgram_negative_samples(pairs, freq, k=50).collect()
    assert len(out) == 2 * 50
    drawn = [r.neg_node for r in out]
    # all draws come from the vocabulary, heavy nodes dominate
    assert set(drawn) <= {10, 20, 30}
    assert drawn.count(30) < 10  # w(1)^0.75 is tiny vs two w(100)s
    # deterministic: same inputs -> identical draws
    again = skipgram_negative_samples(pairs, freq, k=50).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_negative_samples_validation(spark):
    from opentelemetry_collector_components_spark.operators.graph import (
        skipgram_negative_samples,
    )

    pairs = spark.createDataFrame([(1, 2)], "center long, context long")
    freq = spark.createDataFrame([(10, 1)], "node long, n long")
    import pytest as _pt
    with _pt.raises(ValueError, match="k must be"):
        skipgram_negative_samples(pairs, freq, k=0)
    with _pt.raises(ValueError, match="empty"):
        skipgram_negative_samples(pairs, freq.where("node < 0"))
