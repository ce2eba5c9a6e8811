"""Exact prefix-filtered set-similarity join: recall vs brute force,
candidate pruning, boundary-exact threshold arithmetic."""

from itertools import combinations

import pytest

from opentelemetry_collector_components_spark.operators.setjoin import (
    jaccard_prefix_join,
    prefix_candidate_pairs,
)


def _brute_pairs(rows, threshold):
    sets = {i: set(t.lower().split()) for i, t in rows}
    out = set()
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= threshold:
            out.add((a, b))
    return out


@pytest.fixture()
def corpus(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),          # exact dup
        (2, "alpha beta gamma delta epsilon eta"),           # J = 5/7
        (3, "alpha beta gamma delta theta iota"),            # J = 4/8 vs 0
        (4, "totally unrelated words about spark shuffles"),
        (5, "more unrelated prose mentioning broadcast joins"),
        (6, "alpha Beta GAMMA delta epsilon zeta"),          # case-folded dup
        (7, "alpha  beta\tgamma   delta epsilon zeta extra"),  # whitespace + 1 token
        (8, "zeta epsilon delta gamma beta alpha"),          # permuted dup of 0
        (9, "single"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.mark.parametrize("num,den", [(1, 2), (7, 10), (9, 10)])
def test_exact_recall_vs_brute_force(spark, corpus, num, den):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    expect = _brute_pairs(rows, num / den)
    got = {
        (r["id_a"], r["id_b"])
        for r in jaccard_prefix_join(corpus, threshold=(num, den)).collect()
    }
    assert got == expect


def test_boundary_pair_exact(spark):
    # J = 6/7 exactly: six shared tokens, one extra on one side.
    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d e f g")], ["doc_id", "text"]
    )
    assert jaccard_prefix_join(df, threshold=(6, 7)).count() == 1
    assert jaccard_prefix_join(df, threshold=(7, 8)).count() == 0


def test_output_columns_and_counts(spark, corpus):
    row = (
        jaccard_prefix_join(corpus, threshold=(9, 10))
        .where("id_a = 0 AND id_b = 1")
        .collect()[0]
    )
    assert (row["common"], row["n_a"], row["n_b"], row["jaccard"]) == (6, 6, 6, 1.0)


def test_candidates_prune_below_all_pairs(spark, corpus):
    n = corpus.count()
    all_pairs = n * (n - 1) // 2
    cands = prefix_candidate_pairs(corpus, threshold=(9, 10)).count()
    assert cands < all_pairs
    # and candidates are a superset of the true result
    true = {
        (r["id_a"], r["id_b"])
        for r in jaccard_prefix_join(corpus, threshold=(9, 10)).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_candidate_pairs(corpus, threshold=(9, 10)).collect()
    }
    assert true <= got


def _brute_weighted(rows, threshold):
    from collections import Counter

    bags = {i: Counter(t.lower().split()) for i, t in rows}
    out = set()
    for a, b in combinations(sorted(bags), 2):
        mn = sum((bags[a] & bags[b]).values())
        mx = sum((bags[a] | bags[b]).values())
        if mx and mn / mx >= threshold:
            out.add((a, b))
    return out


@pytest.fixture()
def bags(spark):
    rows = [
        (0, "a a a b c d"),
        (1, "a b c d"),                 # weighted 4/6 vs 0; set J = 1.0
        (2, "a a a b c d"),             # exact dup of 0
        (3, "spam spam spam spam ham"),
        (4, "spam ham"),
        (5, "a a b c d"),               # weighted 5/6 vs 0
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.mark.parametrize("num,den", [(1, 2), (5, 6), (9, 10)])
def test_weighted_exact_vs_brute_force(spark, bags, num, den):
    rows = [(r["doc_id"], r["text"]) for r in bags.collect()]
    expect = _brute_weighted(rows, num / den)
    got = {
        (r["id_a"], r["id_b"])
        for r in jaccard_prefix_join(bags, threshold=(num, den), weighted=True).collect()
    }
    assert got == expect


def test_weighted_distinguishes_repetition(spark, bags):
    # Set semantics say 0 and 1 are identical; weighted semantics say 4/6.
    set_pairs = {
        (r["id_a"], r["id_b"])
        for r in jaccard_prefix_join(bags, threshold=(99, 100)).collect()
    }
    w_pairs = {
        (r["id_a"], r["id_b"])
        for r in jaccard_prefix_join(bags, threshold=(99, 100), weighted=True).collect()
    }
    assert (0, 1) in set_pairs
    assert (0, 1) not in w_pairs
    assert (0, 2) in w_pairs  # true dup survives
    row = (
        jaccard_prefix_join(bags, threshold=(1, 2), weighted=True)
        .where("id_a = 0 AND id_b = 1")
        .collect()[0]
    )
    # sum(min) = 4 of bag sizes 6/4 -> J = 4/6
    assert (row["common"], row["n_a"], row["n_b"], row["jaccard"]) == (4, 6, 4, 0.6667)


def test_threshold_validation(spark, corpus):
    with pytest.raises(ValueError):
        jaccard_prefix_join(corpus, threshold=0.0)
    with pytest.raises(ValueError):
        jaccard_prefix_join(corpus, threshold=(3, 2))
