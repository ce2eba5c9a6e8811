"""Ranking metrics (nDCG/MRR/P/R@k) + Dirichlet query likelihood."""

import math

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.relevance import (
    mean_ranking_metrics,
    ranking_metrics,
)
from opentelemetry_collector_components_spark.operators.retrieval import (
    ql_scores,
    ql_topk,
)


def _dcg(pairs):
    """Independent re-derivation: micro-quantized graded DCG."""
    return sum(
        math.floor(1e6 * ((1 << g) - 1) / math.log2(r + 1)) for g, r in pairs
    )


def test_ranking_metrics_hand_case(spark):
    qrels = spark.createDataFrame(
        [
            ("q1", "d1", 3),
            ("q1", "d2", 1),
            ("q1", "d3", 0),
            ("q1", "d9", 2),
            ("q2", "d1", 0),  # judged, nothing relevant
            ("q3", "d7", 2),  # relevant but never retrieved
        ],
        "query_id string, doc_id string, grade int",
    )
    ranking = spark.createDataFrame(
        [
            ("q1", "d1", 1),
            ("q1", "d3", 2),
            ("q1", "d2", 3),
            ("q1", "d5", 4),  # unjudged -> ignored
            ("q2", "d1", 1),
            ("q4", "d1", 1),  # query not in qrels -> not scored
        ],
        "query_id string, doc_id string, rank int",
    )
    out = {
        r["query_id"]: r.asDict()
        for r in ranking_metrics(ranking, qrels, k=3).collect()
    }
    assert set(out) == {"q1", "q2", "q3"}

    q1 = out["q1"]
    assert (q1["n_rel"], q1["judged_at_k"], q1["hits"]) == (3, 3, 2)
    assert q1["rr_micro"] == 1_000_000 and q1["mrr"] == 1.0
    assert q1["dcg_micro"] == _dcg([(3, 1), (0, 2), (1, 3)])
    assert q1["idcg_micro"] == _dcg([(3, 1), (2, 2), (1, 3)])
    assert q1["ndcg_micro"] == q1["dcg_micro"] * 1_000_000 // q1["idcg_micro"]
    assert q1["precision_micro"] == 2 * 1_000_000 // 3
    assert q1["recall_micro"] == 2 * 1_000_000 // 3
    assert q1["precision"] == 0.6667 and q1["ndcg"] == round(
        q1["ndcg_micro"] / 1e6, 4
    )

    q2 = out["q2"]  # judged docs retrieved, none relevant
    assert (q2["n_rel"], q2["judged_at_k"], q2["hits"]) == (0, 1, 0)
    assert q2["ndcg_micro"] == 0 and q2["recall_micro"] == 0
    assert q2["rr_micro"] == 0

    q3 = out["q3"]  # nothing retrieved at all
    assert (q3["n_rel"], q3["judged_at_k"], q3["hits"]) == (1, 0, 0)
    assert q3["dcg_micro"] == 0 and q3["idcg_micro"] == _dcg([(2, 1)])
    assert q3["ndcg_micro"] == 0

    mean = mean_ranking_metrics(
        ranking_metrics(ranking, qrels, k=3)
    ).head().asDict()
    assert mean["n_queries"] == 3
    assert mean["mrr"] == round((q1["rr_micro"]) / (1e6 * 3), 4)
    assert mean["ndcg"] == round(q1["ndcg_micro"] / (1e6 * 3), 4)


def test_ranking_metrics_k_cut(spark):
    """Rank > k rows must not contribute even when relevant."""
    qrels = spark.createDataFrame(
        [("q", "a", 1), ("q", "b", 1)], "query_id string, doc_id string, grade int"
    )
    ranking = spark.createDataFrame(
        [("q", "z", 1), ("q", "a", 2), ("q", "b", 3)],
        "query_id string, doc_id string, rank int",
    )
    row = ranking_metrics(ranking, qrels, k=2).head()
    assert row["hits"] == 1 and row["rr_micro"] == 500_000
    # idcg is also cut at k: ideal = two grade-1 docs at ranks 1,2
    assert row["idcg_micro"] == _dcg([(1, 1), (1, 2)])


def _ql_expected(docs, terms, mu):
    """Independent micro-nat QL re-derivation (byte-level spec copy)."""
    toks = {d: t.split() for d, t in docs}
    T = sum(len(t) for t in toks.values())
    cf = {}
    for t in toks.values():
        for w in t:
            if w in terms:
                cf[w] = cf.get(w, 0) + 1
    k_micro = sum(math.floor(1e6 * math.log(mu * c / T)) for c in cf.values())
    q_eff = len(cf)
    out = {}
    for d, t in toks.items():
        dl = len(t)
        match = 0
        matched = 0
        for w in sorted(set(t) & set(cf)):
            tf = t.count(w)
            match += math.floor(1e6 * math.log((tf * T + mu * cf[w]) / (mu * cf[w])))
            matched += 1
        if matched:
            out[d] = (
                match + k_micro - q_eff * math.floor(1e6 * math.log(dl + mu)),
                matched,
            )
    return out


def test_ql_scores_hand_case(spark):
    docs = [(1, "a a b"), (2, "a c"), (3, "b b b c"), (4, "z z")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["score_micro"], r["matched_terms"])
        for r in ql_scores(df, ["a", "b"], mu=10).collect()
    }
    want = _ql_expected(docs, {"a", "b"}, 10)
    assert got == want
    assert 4 not in got  # no query term -> not emitted


def test_ql_drops_unseen_terms_and_ranks(spark):
    docs = [(1, "a a a"), (2, "a b"), (3, "b b")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # "zzz" has cf=0: dropped; ranking must equal the ["a"] query's
    top = ql_topk(df, ["a", "zzz"], k=3, mu=5).collect()
    top_a = ql_topk(df, ["a"], k=3, mu=5).collect()
    assert [(r["doc_id"], r["score_micro"]) for r in top] == [
        (r["doc_id"], r["score_micro"]) for r in top_a
    ]
    assert [r["rank"] for r in top] == [1, 2]  # doc 3 matches nothing
    # more occurrences of the query term ranks first
    assert top[0]["doc_id"] == 1


# ---------------------------------------------------------------------------
# rbo
# ---------------------------------------------------------------------------
class TestRBO:
    def _rank(self, spark, rows):
        return spark.createDataFrame(rows, ["k", "item", "rank"])

    def _pyref(self, L, R, p_num, p_den, D):
        from fractions import Fraction

        lr = {i: r for _, i, r in L}
        rr = {i: r for _, i, r in R}
        w, x = [], Fraction(p_den - p_num, p_den)
        p = Fraction(p_num, p_den)
        for _ in range(D):
            w.append(int(x * 1_000_000))
            x *= p
        return sum(
            (
                sum(1 for i in lr if i in rr and max(lr[i], rr[i]) <= d)
                * w[d - 1]
            )
            // d
            for d in range(1, D + 1)
        )

    def test_identical_reversed_disjoint(self, spark):
        from opentelemetry_collector_components_spark.operators.relevance import rbo

        L = [("q", f"i{r}", r) for r in range(1, 11)]
        cases = {
            "same": list(L),
            "rev": [("q", f"i{11 - r}", r) for r in range(1, 11)],
            "disjoint": [("q", f"z{r}", r) for r in range(1, 11)],
        }
        for name, R in cases.items():
            out = rbo(
                self._rank(spark, L), self._rank(spark, R),
                ["k"], "item", "rank", 9, 10, 10,
            ).collect()[0]
            assert out["rbo_micro"] == self._pyref(L, R, 9, 10, 10), name
        # ordering sanity: identical > reversed > disjoint
        vals = {
            name: rbo(
                self._rank(spark, L), self._rank(spark, R),
                ["k"], "item", "rank", 9, 10, 10,
            ).collect()[0]["rbo"]
            for name, R in cases.items()
        }
        assert vals["same"] > vals["rev"] > vals["disjoint"] == 0.0

    def test_key_only_in_one_ranking_scores_zero(self, spark):
        from opentelemetry_collector_components_spark.operators.relevance import rbo

        L = [("both", "a", 1), ("left_only", "a", 1)]
        R = [("both", "a", 1), ("right_only", "b", 1)]
        out = {
            r["k"]: r
            for r in rbo(
                self._rank(spark, L), self._rank(spark, R),
                ["k"], "item", "rank", 1, 2, 3,
            ).collect()
        }
        assert set(out) == {"both", "left_only", "right_only"}
        assert out["both"]["rbo"] > 0
        assert out["left_only"]["rbo_micro"] == 0
        assert out["right_only"]["shared_at_depth"] == 0

    def test_validation(self, spark):
        import pytest

        from opentelemetry_collector_components_spark.operators.relevance import rbo

        df = self._rank(spark, [("q", "a", 1)])
        with pytest.raises(ValueError, match="proper fraction"):
            rbo(df, df, ["k"], "item", "rank", 3, 2)
        with pytest.raises(ValueError, match="depth"):
            rbo(df, df, ["k"], "item", "rank", 1, 2, 0)
        with pytest.raises(ValueError, match="key_cols"):
            rbo(df, df, [], "item", "rank")
