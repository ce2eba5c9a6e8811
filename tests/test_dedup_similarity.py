"""Dedup + similarity operators: planted duplicates, known neighbors."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
)
from opentelemetry_collector_components_spark.operators.similarity import (
    brute_force_cosine,
    lsh_topk,
    nearest_centroid,
    topk_cosine,
)


@pytest.fixture()
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0
        (2, base.replace("today", "tomorrow")),      # near dup of 0
        (3, "completely different text about spark aggregation pipelines and shuffles"),
        (4, "another unrelated document mentioning broadcast joins and skew salting"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs)
    groups = {r["keeper_id"]: r["n_copies"] for r in out.collect()}
    assert groups[0] == 2           # docs 0 and 1 collapse
    assert sum(groups.values()) == 5


def test_jaccard_pairs(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.2, exact=True).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 < pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_minhash_lsh_finds_planted_dups(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, threshold=0.2).collect()}
    assert (0, 1) in pairs
    assert (0, 2) in pairs
    assert (3, 4) not in pairs


def test_simhash_identical_and_near(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert sh[0] == sh[1]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_pairs(docs, max_hamming=16).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs


@pytest.fixture()
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite
        (4, [0.7, 0.7, 0.0, 0.0]),   # diagonal
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_cosine(spark, vecs):
    scores = {r["vec_id"]: r["cos_sim"] for r in brute_force_cosine(vecs, [1.0, 0.0, 0.0, 0.0]).collect()}
    assert scores[0] == 1.0
    assert scores[2] == 0.0
    assert scores[3] == -1.0
    assert 0.999 > scores[1] > 0.99  # 0.9/sqrt(0.82) ~= 0.9939


def test_topk_order(spark, vecs):
    top = topk_cosine(vecs, [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in top] == [0, 1, 4]


def test_nearest_centroid(spark, vecs):
    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    out = {r["vec_id"]: r["centroid_id"] for r in nearest_centroid(vecs, cents).collect()}
    assert out[0] == 0 and out[1] == 0
    assert out[2] == 1
    assert out[4] in (0, 1)  # exact tie on the diagonal -> tie-break by id
    assert out[4] == 0


def test_lsh_topk_contains_self(spark, vecs):
    top = lsh_topk(vecs, [1.0, 0.0, 0.0, 0.0], k=3, n_planes=2).collect()
    ids = [r["vec_id"] for r in top]
    assert 0 in ids  # the query vector's own row is in its bucket


def test_ivf_topk_probe_restricts_and_matches_exact(spark, vecs):
    from opentelemetry_collector_components_spark.operators.similarity import ivf_topk

    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    q = [1.0, 0.0, 0.0, 0.0]
    # nprobe = all cells -> identical to exact top-k
    full = [r["vec_id"] for r in ivf_topk(vecs, q, cents, k=5, nprobe=2).collect()]
    exact = [r["vec_id"] for r in topk_cosine(vecs, q, k=5).collect()]
    assert full == exact
    # nprobe=1 -> only the query's own cell (0, 1, 4 assign to centroid 0;
    # 3 too: cos(-1,..)= -1 vs 0 -> centroid 1 wins for vec 3)
    probed = [r["vec_id"] for r in ivf_topk(vecs, q, cents, k=5, nprobe=1).collect()]
    assert set(probed).issubset(set(exact))
    assert 0 in probed and 2 not in probed  # orthogonal vec lives in the unprobed cell


def test_kmeans_centroids_deterministic_and_separating(spark, vecs):
    from opentelemetry_collector_components_spark.operators.similarity import (
        kmeans_centroids,
        nearest_centroid,
    )

    c1 = kmeans_centroids(vecs, k=2, iters=2)
    c2 = kmeans_centroids(vecs, k=2, iters=2)
    assert c1 == c2  # pure function of the input
    assign = {r["vec_id"]: r["centroid_id"] for r in nearest_centroid(vecs, c1).collect()}
    # the x-axis cluster (0, 1) and the y-axis vector (2) must separate
    assert assign[0] == assign[1]
    assert assign[2] != assign[0]


def test_minhash_md5_engine_matches_planted_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.2, engine="md5").collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs
    assert (3, 4) not in pairs


def test_simhash_md5_engine(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(docs, max_hamming=3, engine="md5").collect()
    }
    assert pairs[(0, 1)] == 0  # exact dups -> hamming 0
    # unrelated docs never collide at hamming <= 3
    assert (3, 4) not in pairs and (0, 3) not in pairs


def test_embedding_near_pairs_exact_and_blocked(spark, vecs):
    from opentelemetry_collector_components_spark.operators.similarity import (
        embedding_near_pairs,
        md5_plane_signs,
    )

    # default is guarded: the all-pairs cross join must be an explicit opt-in
    with pytest.raises(ValueError, match="all-pairs"):
        embedding_near_pairs(vecs, threshold=0.9)
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_near_pairs(vecs, threshold=0.9, allow_all_pairs=True).collect()
    }
    assert (0, 1) in exact and exact[(0, 1)] > 0.9
    assert (0, 3) not in exact  # opposite vectors
    # blocked variant is a subset of exact and keeps same scores
    planes = md5_plane_signs(4, 4)
    blocked = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_near_pairs(vecs, threshold=0.9, block_planes=planes).collect()
    }
    assert set(blocked) <= set(exact)
    for k, v in blocked.items():
        assert exact[k] == v


def test_lsh_topk_literal_planes_bucket_agrees_with_spark(spark, vecs):
    from opentelemetry_collector_components_spark.operators.similarity import (
        lsh_bucket_literal,
        lsh_topk_literal,
        md5_plane_signs,
    )

    planes = md5_plane_signs(4, 4)
    # driver-side python fold must equal the JVM bucket for every row
    rows = vecs.select(
        "vec_id",
        F.col("embedding"),
        lsh_bucket_literal(F.col("embedding"), planes).alias("bucket"),
    ).collect()
    for r in rows:
        py = 0
        for p, plane in enumerate(planes):
            acc = 0.0
            for x, w in zip(r["embedding"], plane):
                acc += float(x) * w
            if acc > 0:
                py |= 1 << p
        assert py == r["bucket"]
    out = lsh_topk_literal(vecs, [1.0, 0.0, 0.0, 0.0], planes, k=3)
    got = [r["vec_id"] for r in out.collect()]
    assert 0 in got  # query vector is row 0 itself -> same bucket


def test_jaccard_shingle_df_cap_prunes_stopword_shingles(spark):
    # 40 docs that all share one stop-word shingle ("the of and") but are
    # otherwise pairwise disjoint: with no cap every pair shares a shingle
    # (40*39/2 candidate groups); with a df cap below 40 the hot shingle is
    # dropped and NO pair survives.
    rows = [(i, f"the of and w{i}a w{i}b w{i}c w{i}d") for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = ngram_jaccard_pairs(docs, threshold=0.0, exact=True)
    assert uncapped.count() == 40 * 39 // 2
    capped = ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_df=10)
    assert capped.count() == 0


def test_jaccard_requires_cap_or_explicit_exact(spark, docs):
    # uncapped full-universe Jaccard is quadratic in the hottest shingle's
    # document frequency — production callers must choose deliberately
    import pytest

    with pytest.raises(ValueError, match="max_shingle_df"):
        ngram_jaccard_pairs(docs, threshold=0.2)


def test_jaccard_df_cap_noop_when_above_corpus_df(spark, docs):
    # cap larger than any shingle's document frequency => identical output
    base = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.2, exact=True).collect()}
    capped = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.2, max_shingle_df=1000).collect()}
    assert base == capped


def test_minhash_verify_is_candidate_restricted(spark, docs):
    # The exact-Jaccard verify stage must be driven off the LSH candidate
    # list (semi-join on candidate ids), never a full-corpus shingle
    # self-join — the scale property LSH exists for.
    plan = minhash_lsh_pairs(docs, threshold=0.2)._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan


def test_lsh_multiprobe_recall_superset(spark, vecs):
    """Multi-probe candidates strictly contain the single-probe set and
    approach brute-force recall as probes grow; with 2^n_planes probes every
    bucket is probed, so the result EQUALS brute force."""
    from opentelemetry_collector_components_spark.operators.similarity import (
        brute_force_cosine,
        lsh_topk,
        lsh_topk_literal,
        md5_plane_signs,
    )

    q = [1.0, 0.0, 0.0, 0.0]
    exact = {r["vec_id"] for r in brute_force_cosine(vecs, q).orderBy(
        F.desc("cos_sim")).limit(3).collect()}
    one = {r["vec_id"] for r in lsh_topk(vecs, q, k=3, n_planes=4, n_probes=1).collect()}
    allp = {r["vec_id"] for r in lsh_topk(vecs, q, k=3, n_planes=4, n_probes=16).collect()}
    assert one <= allp
    assert allp == exact  # probing all 16 buckets degenerates to brute force

    planes = md5_plane_signs(4, 4)
    lit_all = {r["vec_id"] for r in lsh_topk_literal(
        vecs, q, planes, k=3, n_probes=16).collect()}
    assert lit_all == exact


def test_exact_dedup_incremental(spark):
    """Growing-corpus loop: history blocks dupes, within-batch first wins,
    novel docs pass; appending survivors keeps the next batch clean."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.dedup import (
        exact_dedup_incremental,
    )
    from opentelemetry_collector_components_spark.functions.textstats import (
        doc_fingerprint,
    )

    history = spark.createDataFrame([("old text",)], ["text"]).select(
        doc_fingerprint(F.col("text")).alias("fingerprint")
    )
    batch = spark.createDataFrame(
        [(1, "old text"), (2, "new text"), (3, "new text"), (4, "fresh one")],
        ["doc_id", "text"],
    )
    out = exact_dedup_incremental(batch, history)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [2, 4]  # 1 blocked by history, 3 loses to 2 in-batch
    # loop closure: appended fingerprints block a replayed batch entirely
    seen2 = history.unionByName(out.select("fingerprint"))
    assert exact_dedup_incremental(batch, seen2).count() == 0


def test_fuzzy_decontamination_catches_truncated_copy(spark, docs):
    """A benchmark doc that is a truncated copy of a corpus doc must be
    caught (the case the exact 13-gram rule misses when n-grams shift);
    unrelated docs must not match."""
    from opentelemetry_collector_components_spark.operators.dedup import (
        contaminated_ids_fuzzy,
    )

    base = docs.where("doc_id = 0").collect()[0]["text"]
    truncated = " ".join(base.split()[:-3])
    bench = spark.createDataFrame([(100, truncated), (101, "totally unrelated words here")],
                                  ["doc_id", "text"])
    hits = {(r["corpus_id"], r["bench_id"]): r["jaccard"]
            for r in contaminated_ids_fuzzy(docs, bench, threshold=0.2).collect()}
    assert any(c in (0, 1) and b == 100 for c, b in hits)  # 0/1 are identical
    assert not any(b == 101 for _, b in hits)


def test_pq_adc_approximates_exact_l2(spark, vecs):
    """PQ sanity: the query's own row has ADC distance 0 when it is a
    codebook seed, and ADC ordering broadly tracks exact L2 ordering."""
    from opentelemetry_collector_components_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks_from_seeds,
    )

    cbs = pq_codebooks_from_seeds(vecs, m=2, ksub=4)
    assert len(cbs) == 2 and len(cbs[0]) == 4 and len(cbs[0][0]) == 2
    q = [1.0, 0.0, 0.0, 0.0]
    top = pq_adc_topk(vecs, q, cbs, k=5).collect()
    assert top[0]["vec_id"] == 0 and top[0]["adc_dist"] == 0.0
    # vec 3 (opposite) must rank last of the five
    assert [r["vec_id"] for r in top][-1] == 3

    # dims not divisible by m rejected
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        pq_codebooks_from_seeds(vecs, m=3, ksub=4)


def test_ivf_pq_results_subset_of_pq(spark, vecs):
    """IVF-PQ only prunes: its results are PQ results restricted to the
    probed cells, with identical ADC distances."""
    from opentelemetry_collector_components_spark.operators.similarity import (
        ivf_pq_topk,
        pq_adc_topk,
        pq_codebooks_from_seeds,
    )

    cbs = pq_codebooks_from_seeds(vecs, m=2, ksub=4)
    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    q = [1.0, 0.0, 0.0, 0.0]
    full = {r["vec_id"]: r["adc_dist"] for r in pq_adc_topk(vecs, q, cbs, k=5).collect()}
    pruned = {r["vec_id"]: r["adc_dist"] for r in ivf_pq_topk(vecs, q, cents, cbs, k=5, nprobe=1).collect()}
    assert set(pruned) <= set(full)
    for vid, d in pruned.items():
        assert full[vid] == d
    # all-cells probe == plain PQ
    both = {r["vec_id"]: r["adc_dist"] for r in ivf_pq_topk(vecs, q, cents, cbs, k=5, nprobe=2).collect()}
    assert both == full


def test_components_transitive_chain(spark):
    """Planted chain A-B-C: pair-drop and components agree on the removal
    set here, but components must label all three with min id A."""
    from opentelemetry_collector_components_spark.operators.dedup import (
        near_dedup_components,
    )

    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    comp = {r["doc_id"]: r["component"] for r in near_dedup_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_components_diverge_from_pairdrop_on_v_graph(spark):
    """V-graph (1,5),(3,5): pair-drop keeps {1,3}; one-per-component keeps
    only 1 — the policy difference this operator exists for."""
    from opentelemetry_collector_components_spark.operators.dedup import (
        near_dedup_components,
        near_dedup_survivors,
    )
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame([(1, 5), (3, 5)], "id_a long, id_b long")
    docs = spark.range(6).select(F.col("id").alias("doc_id"))
    surv = {r["doc_id"] for r in near_dedup_survivors(pairs, docs).collect()}
    assert {1, 3} <= surv and 5 not in surv
    comp = {r["doc_id"]: r["component"] for r in near_dedup_components(pairs).collect()}
    assert comp == {1: 1, 3: 1, 5: 1}  # one cluster -> only id 1 survives


def test_components_bounded_rounds_raise(spark):
    """A path graph of diameter > max_rounds must raise, not silently
    return partial labels."""
    import pytest

    from opentelemetry_collector_components_spark.operators.dedup import (
        near_dedup_components,
    )

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long"
    )
    with pytest.raises(ValueError, match="converge"):
        near_dedup_components(path, max_rounds=2)
    comp = {r["doc_id"]: r["component"] for r in near_dedup_components(path).collect()}
    assert set(comp.values()) == {0}


def test_pq_training_reduces_quantization_error(spark, vecs):
    """Lloyd-trained PQ codebooks: quantization MSE is non-increasing per
    iteration and strictly below the seed codebooks'; training is
    deterministic."""
    from opentelemetry_collector_components_spark.operators.similarity import (
        pq_codebooks_from_seeds,
        pq_codebooks_trained,
        pq_quantization_error,
    )

    m, ksub = 2, 4  # fixture vectors are 4-dim
    seeds = pq_codebooks_from_seeds(vecs, m=m, ksub=ksub)
    e_prev = pq_quantization_error(vecs, seeds)
    for iters in (1, 2):
        cbs = pq_codebooks_trained(vecs, m=m, ksub=ksub, iters=iters)
        e = pq_quantization_error(vecs, cbs)
        assert e <= e_prev + 1e-9
        e_prev = e
    again = pq_codebooks_trained(vecs, m=m, ksub=ksub, iters=2)
    assert again == pq_codebooks_trained(vecs, m=m, ksub=ksub, iters=2) == cbs


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination + exact-substring dedup + streaming dedup
# ---------------------------------------------------------------------------
def test_bloom_bitmap_no_false_negatives(spark):
    from opentelemetry_collector_components_spark.functions.bloom import (
        bloom_might_contain,
        build_bloom_bitmap,
    )

    keys = spark.createDataFrame([(f"key-{i}",) for i in range(200)], ["gram"])
    probe = spark.createDataFrame(
        [(f"key-{i}",) for i in range(400)], ["gram"]
    )  # 200 members + 200 non-members
    bm = build_bloom_bitmap(keys, "gram", m_bits=1 << 14, k_hashes=5)
    got = {r["gram"] for r in bloom_might_contain(probe, "gram", bm, 1 << 14, 5).collect()}
    members = {f"key-{i}" for i in range(200)}
    assert members <= got                      # zero false negatives, ever
    # fp rate at m/n = 82 bits/key should be tiny; allow a loose bound
    assert len(got - members) <= 20


def test_bloom_bitmap_size_validation(spark):
    from opentelemetry_collector_components_spark.functions.bloom import (
        bloom_might_contain,
        build_bloom_bitmap,
    )

    keys = spark.createDataFrame([("a",)], ["gram"])
    with pytest.raises(ValueError):
        build_bloom_bitmap(keys, "gram", m_bits=1001)
    bm = build_bloom_bitmap(keys, "gram", m_bits=1 << 10)
    with pytest.raises(ValueError):
        bloom_might_contain(keys, "gram", bm, m_bits=1 << 11)


def test_contaminated_ids_bloom_equals_exact(spark, sf_dir):
    from opentelemetry_collector_components_spark.operators.dedup import (
        contaminated_ids,
        contaminated_ids_bloom,
        contamination_ngrams,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = contamination_ngrams(docs.where(F.col("doc_id") % 11 == 0), n=13)
    exact = {(r["doc_id"], r["n_hits"]) for r in contaminated_ids(docs, bench).collect()}
    bloom = {
        (r["doc_id"], r["n_hits"])
        for r in contaminated_ids_bloom(docs, bench, m_bits=1 << 16).collect()
    }
    assert bloom == exact and len(exact) > 0


def test_substring_dup_docs_planted(spark):
    from opentelemetry_collector_components_spark.operators.dedup import (
        substring_dup_docs,
    )

    shared = " ".join(f"w{i}" for i in range(15))          # one 15-token window
    rows = [
        (10, shared + " tail ten"),
        (20, "head twenty " + shared),                     # shares the window with 10
        (30, " ".join(f"x{i}" for i in range(20))),        # clean
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in substring_dup_docs(docs, w=15).collect()}
    assert set(out) == {20}
    assert out[20]["earliest_owner"] == 10
    assert out[20]["n_dup_windows"] == 1


def test_substring_dup_docs_engines_agree(spark, docs):
    from opentelemetry_collector_components_spark.operators.dedup import (
        substring_dup_docs,
    )

    a = {tuple(r) for r in substring_dup_docs(docs, w=5, engine="xxhash").collect()}
    b = {tuple(r) for r in substring_dup_docs(docs, w=5, engine="md5").collect()}
    assert a == b
    assert {r[0] for r in a} >= {1}            # doc 1 is a verbatim copy of 0


def test_bloom_membership_tests_exact_bit_not_any_higher_bit(spark):
    """Regression: the membership test must probe THE bit, not 'any bit at
    or above the position'.  With a bitmap whose only set bit per byte is
    bit 7, an unmasked `>>` test passes every probe with position % 8 <= 7
    (i.e. everything); the masked test passes only probes that land
    exactly on bit 7 of their byte."""
    import numpy as np

    from opentelemetry_collector_components_spark.functions.bloom import (
        bloom_might_contain,
    )

    m_bits = 1 << 12
    bitmap = (np.full(m_bits // 8, 0x80, dtype=np.uint8)).tobytes()
    probe = spark.createDataFrame([(f"p-{i}",) for i in range(64)], ["gram"])
    got = bloom_might_contain(probe, "gram", bitmap, m_bits, k_hashes=5).count()
    # per key: P(all 5 positions hit bit 7) = 8^-5 ~ 3e-5 -> expect 0 of 64
    # (deterministic: xxhash64 positions are fixed for these keys)
    assert got == 0


def test_strip_domain_boilerplate_is_per_domain(spark):
    """The banner is stripped only on the domain where it is frequent; the
    identical line on another domain survives as content; a doc that is
    pure boilerplate drops out entirely."""
    from opentelemetry_collector_components_spark.operators.dedup import (
        strip_domain_boilerplate,
    )

    banner = "w0 w1 w2 w3 w4 w5 w6 w7"          # one 8-token pseudo-line
    rows = [
        (1, banner + " a0 a1 a2 a3 a4 a5 a6 a7", "siteA"),
        (2, banner + " b0 b1 b2 b3 b4 b5 b6 b7", "siteA"),
        (3, banner, "siteA"),                    # pure boilerplate -> dropped
        (4, banner + " c0 c1 c2 c3 c4 c5 c6 c7", "siteB"),  # lone -> content
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in strip_domain_boilerplate(
        docs, chunk_size=8, min_count=2, frac=(1, 2)
    ).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1].text_clean == "a0 a1 a2 a3 a4 a5 a6 a7"
    assert out[2].text_clean == "b0 b1 b2 b3 b4 b5 b6 b7"
    assert out[4].text_clean == rows[3][1]       # siteB keeps the banner
    assert out[4].n_lines_kept == 2


def test_semantic_dedup_within_cluster_pairs_and_survivors(spark):
    """SemDeDup: planted duplicates in the same cluster pair up and the
    higher id drops; an (accidental) near-identical pair split across
    clusters is NOT paired (the documented recall trade of cluster
    blocking); the join is an equi-join on the cluster id, never a
    cartesian product."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.similarity import (
        semantic_dedup_pairs,
        semantic_dedup_survivors,
    )

    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    rows = [
        (10, [0.9, 0.1, 0.0]),   # cluster 0
        (11, [0.91, 0.09, 0.0]), # cluster 0, near-dup of 10 -> dropped
        (12, [0.0, 0.8, 0.1]),   # cluster 1
        (20, [0.7, 0.71, 0.0]),  # cluster 1 (barely)
        (21, [0.71, 0.7, 0.0]),  # cluster 0 (barely) — near-dup of 20 but
                                 # different clusters: blocked, both kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = semantic_dedup_pairs(df, cents, threshold=0.99)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (10, 11) in got
    assert (20, 21) not in got and (21, 20) not in got

    kept = {r.vec_id for r in semantic_dedup_survivors(df, cents, 0.99).collect()}
    assert kept == {10, 12, 20, 21}

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_keep_best_per_component_argmax_and_singletons(spark):
    """Highest-score doc survives per cluster (tie -> lowest id),
    singletons pass through with component = own id, and the per-component
    top-1 never runs an unpartitioned window."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.dedup import (
        keep_best_per_component,
    )

    docs = spark.createDataFrame(
        [(1, 10, "a"), (2, 30, "b"), (3, 30, "c"), (7, 5, "d"), (9, 99, "e")],
        "doc_id long, quality long, text string",
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7)], "doc_id long, component long"
    )
    out = keep_best_per_component(docs, comp, "quality")
    got = {(r.doc_id, r.component, r.quality, r.text) for r in out.collect()}
    # cluster 1: quality tie 30 between 2 and 3 -> lowest id 2 wins;
    # full doc rows (incl. text) survive, singletons get component = id
    assert got == {(2, 1, 30, "b"), (7, 7, 5, "d"), (9, 9, 99, "e")}

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_fuzzy_dedup_incremental_branches(spark):
    """Batch doc near-dupping the corpus drops; of two near-dup batch
    docs the lower id survives; a genuinely new doc survives; and the
    corpus->batch band match broadcasts the batch side."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.dedup import (
        fuzzy_dedup_incremental,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    fresh = "red orange yellow green blue indigo violet black white gray"
    existing = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (100, base + " lambda"),          # near-dups corpus doc 1 -> drop
            (101, fresh),                     # survives
            (102, fresh + " extra"),          # near-dups 101 -> drop
        ],
        "doc_id long, text string",
    )
    out = fuzzy_dedup_incremental(new, existing, threshold=0.5, engine="md5")
    assert {r.doc_id for r in out.collect()} == {101}

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_lsh_param_validation(spark):
    """Banding schemes that drop hashes or degenerate to all-collide
    raise instead of silently weakening (or quadratically exploding)."""
    import pytest

    from opentelemetry_collector_components_spark.operators.dedup import (
        fuzzy_dedup_incremental,
        minhash_lsh_pairs,
    )

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="multiple"):
        minhash_lsh_pairs(df, n_hashes=32, bands=7)
    with pytest.raises(ValueError, match="multiple"):
        fuzzy_dedup_incremental(df, df, n_hashes=32, bands=40)


def test_semantic_dedup_vectorized_matches_exact_form(spark):
    """The numpy matmul scale path returns the same pair set and (away
    from the rounding boundary) the same rounded cosines as the exact
    zip_with form, including with a block size smaller than the cluster;
    the plan is ArrowEvalPython-family, never BatchEvalPython."""
    import random

    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.similarity import (
        semantic_dedup_pairs,
        semantic_dedup_pairs_vectorized,
    )

    rng = random.Random(7)
    rows = []
    for i in range(60):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, base))
        if i % 5 == 0:  # plant a near-dup neighbor
            rows.append((1000 + i, [x + rng.uniform(-0.01, 0.01) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(c, [rng.uniform(-1, 1) for _ in range(8)]) for c in range(4)]

    exact = semantic_dedup_pairs(df, cents, threshold=0.9)
    vec = semantic_dedup_pairs_vectorized(df, cents, threshold=0.9, block_rows=7)
    e = {(r.id_a, r.id_b): (r.cluster_id, r.cos_sim) for r in exact.collect()}
    v = {(r.id_a, r.id_b): (r.cluster_id, r.cos_sim) for r in vec.collect()}
    assert len(e) >= 10
    assert set(e) == set(v)
    for k in e:
        assert e[k][0] == v[k][0]
        assert abs(e[k][1] - v[k][1]) < 1e-9

    plan = vec._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_fuzzy_incremental_signature_store_roundtrip(spark, tmp_path):
    """Running the batch against a persisted signature store gives the
    same survivors as recomputing corpus signatures, and appending the
    surviving batch keeps the store consistent for the next round."""
    from opentelemetry_collector_components_spark.operators.dedup import (
        fuzzy_dedup_incremental,
        read_signature_store,
        write_signature_store,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fresh = "red orange yellow green blue indigo violet black white gray"
    existing = spark.createDataFrame(
        [(1, base), (2, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, base + " lambda"), (101, fresh)], "doc_id long, text string"
    )
    store = str(tmp_path / "sigstore")
    write_signature_store(existing, store, engine="md5")

    direct = fuzzy_dedup_incremental(new, existing, threshold=0.5, engine="md5")
    stored = fuzzy_dedup_incremental(
        new, existing, threshold=0.5, engine="md5",
        existing_sig=read_signature_store(spark, store),
    )
    assert {r.doc_id for r in direct.collect()} == {101}
    assert {r.doc_id for r in stored.collect()} == {101}

    # accept the survivors: append their signatures; next batch sees them
    write_signature_store(stored, store, engine="md5")
    next_batch = spark.createDataFrame(
        [(200, fresh + " extra")], "doc_id long, text string"
    )
    corpus = existing.unionByName(stored)
    out = fuzzy_dedup_incremental(
        next_batch, corpus, threshold=0.5, engine="md5",
        existing_sig=read_signature_store(spark, store),
    )
    assert out.count() == 0  # near-dups the just-accepted doc 101


def test_signature_store_param_mismatch_raises(spark, tmp_path):
    """A store written with one (n_hashes, k, engine) consumed under
    another raises loudly instead of silently band-matching nothing."""
    from opentelemetry_collector_components_spark.operators.dedup import (
        fuzzy_dedup_incremental,
        read_signature_store,
        write_signature_store,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    store = str(tmp_path / "sig")
    write_signature_store(docs, store, engine="xxhash")
    sig = read_signature_store(spark, store)
    with pytest.raises(ValueError, match="written with parameters"):
        fuzzy_dedup_incremental(docs, docs, engine="md5", existing_sig=sig)
    with pytest.raises(ValueError, match="written with parameters"):
        fuzzy_dedup_incremental(docs, docs, n_hashes=16, bands=8, existing_sig=sig)
    # untagged (caller-built) frame: only the mh column count is checkable
    untagged = sig.drop("_sigmeta_n32_k3_xxhash")
    with pytest.raises(ValueError, match="mh0"):
        fuzzy_dedup_incremental(docs, docs, n_hashes=16, bands=8, existing_sig=untagged)
    # matching params consume fine
    fuzzy_dedup_incremental(docs, docs, engine="xxhash", existing_sig=sig).collect()


def test_semantic_dedup_vectorized_string_ids(spark):
    """The scale path honors a non-long id column like the exact form."""
    from opentelemetry_collector_components_spark.operators.similarity import (
        semantic_dedup_pairs_vectorized,
    )

    df = spark.createDataFrame(
        [("h1", [1.0, 0.0]), ("h2", [0.99, 0.01]), ("h3", [0.0, 1.0])],
        "doc_hash string, embedding array<double>",
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    pairs = semantic_dedup_pairs_vectorized(
        df, cents, threshold=0.9, id_col="doc_hash"
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {("h1", "h2")}


def test_knn_join_matches_per_query_exact(spark, vecs):
    """Full-probe batch kNN join == brute-force ranking for every query."""
    from opentelemetry_collector_components_spark.operators.similarity import knn_join

    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    queries = vecs.withColumnRenamed("vec_id", "query_id")
    out = knn_join(queries, vecs, cents, k=2, nprobe=2, exclude_self=True).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    # hand-computed cosine rankings (score desc, id asc on ties):
    assert got[0] == [1, 4]
    assert got[1] == [0, 4]
    assert got[2] == [4, 1]
    assert got[3] == [2, 4]   # best of an all-negative neighborhood
    assert got[4] == [1, 0]   # 0 vs 2 tie at 0.7071 -> lower id wins
    assert all(r["query_id"] != r["neighbor_id"] for r in out)


def test_knn_join_probe_restricts_to_cells(spark, vecs):
    """nprobe=1 only sees the query's own cell; vec 2's cell holds {2,3}."""
    from opentelemetry_collector_components_spark.operators.similarity import knn_join

    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    queries = vecs.filter(F.col("vec_id") == 2).withColumnRenamed("vec_id", "query_id")
    out = knn_join(queries, vecs, cents, k=5, nprobe=1, exclude_self=True).collect()
    assert [r["neighbor_id"] for r in out] == [3]

    with pytest.raises(ValueError):
        knn_join(queries, vecs, cents, nprobe=0)
    with pytest.raises(ValueError):
        knn_join(queries, vecs, cents, nprobe=3)


def test_winnow_guarantee_and_edges(spark):
    """Winnowing's local guarantee: a shared run of >= w+k-1 words yields
    a shared selected fingerprint; short docs hit the documented edges."""
    from opentelemetry_collector_components_spark.functions.textstats import (
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6 words = w+k-1 with k=3,w=4
    rows = [
        (0, f"completely different lead in text {shared} and a distinct tail here"),
        (1, f"other document body starts now {shared} then diverges entirely afterwards"),
        (2, "tiny doc"),          # < k words -> empty set
        (3, "just three words"),  # 1 gram < w -> singleton global min
        (4, "unrelated content about shuffle partitions and broadcast joins only"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", winnow_fingerprints(F.col("text"), k=3, w=4).alias("fp")
        ).collect()
    }
    assert set(out[0]) & set(out[1])     # the planted run is detected
    assert out[2] == []
    assert len(out[3]) == 1
    assert not set(out[0]) & set(out[4])


def test_winnow_overlap_pairs_guard_and_detection(spark):
    from opentelemetry_collector_components_spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    shared = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [
            (0, f"intro text before the copied part {shared} and some extra"),
            (1, f"{shared} with a different continuation written here instead"),
            (2, "nothing in common with either of the other two documents"),
        ],
        ["doc_id", "text"],
    )
    with pytest.raises(ValueError):
        winnow_overlap_pairs(df)  # neither max_fp_df nor exact=True
    pairs = {
        (r["id_a"], r["id_b"]): r["shared"]
        for r in winnow_overlap_pairs(df, min_shared=1, exact=True).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert all(2 not in p for p in pairs)
    # df-guard path: capping at 1 still finds the pair (their shared
    # fingerprints have df=2 only if both docs select them; cap=1 drops
    # those, so the pair disappears -> proves the guard actually filters)
    guarded = winnow_overlap_pairs(df, min_shared=1, max_fp_df=1).collect()
    assert guarded == []
