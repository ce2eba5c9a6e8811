"""BM25 / RRF retrieval + PSI drift: hand-checked arithmetic, invariants,
validations, and plan hygiene."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.drift import (
    psi_histogram_drift,
    psi_total,
    width_bucket,
)
from opentelemetry_collector_components_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    rrf_fuse,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_bm25_micro(corpus: dict[int, str], query: list[str]) -> dict[int, int]:
    """Independent pure-Python replay of the integer BM25 pipeline."""
    toks = {d: [t for t in txt.lower().split() if t] for d, txt in corpus.items()}
    dl = {d: len(ts) for d, ts in toks.items()}
    n, total = len(toks), sum(dl.values())
    out: dict[int, int] = {}
    for term in query:
        df = sum(1 for ts in toks.values() if term in ts)
        if df == 0:
            continue
        idf = math.floor(1e6 * math.log((2 * n + 2) / (2 * df + 1)))
        for d, ts in toks.items():
            tf = ts.count(term)
            if tf == 0:
                continue
            num = idf * 22 * total * tf
            den = 10 * total * tf + 3 * total + 9 * dl[d] * n
            out[d] = out.get(d, 0) + num // den
    return out


class TestBM25:
    def test_matches_python_reference(self, spark):
        corpus = {
            1: "spark shuffle join shuffle broadcast",
            2: "rare spark join",
            3: "filter scan scan scan filter filter scan",
            4: "rare rare shuffle",
        }
        got = {
            r["doc_id"]: r["score_micro"]
            for r in bm25_scores(
                _docs(spark, list(corpus.items())), ["rare", "spark"]
            ).collect()
        }
        assert got == _py_bm25_micro(corpus, ["rare", "spark"])

    def test_rare_term_dominates_and_rank_order(self, spark):
        # 'needle' appears in one doc; common words everywhere
        rows = [(i, "the quick fox " + ("needle" if i == 7 else "jumps"))
                for i in range(1, 11)]
        top = bm25_topk(_docs(spark, rows), ["needle", "the"], k=3).collect()
        assert top[0]["doc_id"] == 7 and top[0]["rank"] == 1
        assert [r["rank"] for r in top] == [1, 2, 3]
        # ties among the 'the'-only docs break by doc_id ascending
        assert top[1]["doc_id"] < top[2]["doc_id"]

    def test_longer_doc_scores_lower_at_equal_tf(self, spark):
        rows = [(1, "needle a b"), (2, "needle a b c d e f g h")]
        got = {r["doc_id"]: r["score_micro"]
               for r in bm25_scores(_docs(spark, rows), ["needle"]).collect()}
        assert got[1] > got[2]

    def test_validations_and_term_folding(self, spark):
        df = _docs(spark, [(1, "x spark y"), (2, "x y z")])
        with pytest.raises(ValueError, match="non-empty"):
            bm25_scores(df, [])
        with pytest.raises(ValueError, match="k must be"):
            bm25_topk(df, ["x"], k=0)
        # case-insensitive matching => duplicates fold on the lowered form
        ref = {r["doc_id"]: r["score_micro"]
               for r in bm25_scores(df, ["spark"]).collect()}
        dup = {r["doc_id"]: r["score_micro"]
               for r in bm25_scores(df, ["Spark", "spark"]).collect()}
        assert ref == dup == _py_bm25_micro(
            {1: "x spark y", 2: "x y z"}, ["spark"]
        )

    def test_empty_and_whitespace_docs_excluded(self, spark):
        # dl counts real terms: '  a  b ' has dl 2; empty/NULL docs are out
        rows = [(1, "  needle  b "), (2, ""), (3, None), (4, "b c")]
        got = bm25_scores(_docs(spark, rows), ["needle"]).collect()
        assert [r["doc_id"] for r in got] == [1]
        # N=2 (docs 1 and 4), T=4, dl=2, tf=1, df=1
        assert got[0]["score_micro"] == _py_bm25_micro(
            {1: "needle b", 4: "b c"}, ["needle"]
        )[1]

    def test_plan_hygiene(self, spark):
        df = _docs(spark, [(1, "x y"), (2, "y z")])
        plan = bm25_topk(df, ["y"], k=5)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan


class TestBM25Join:
    def test_matches_per_query_scores(self, spark):
        corpus = {
            1: "spark shuffle join shuffle broadcast",
            2: "rare spark join",
            3: "filter scan scan scan filter filter scan",
            4: "rare rare shuffle",
        }
        from opentelemetry_collector_components_spark.operators.retrieval import (
            bm25_join,
        )

        docs = _docs(spark, list(corpus.items()))
        queries = spark.createDataFrame(
            [("a", ["rare", "spark"]), ("b", ["scan"])],
            "query_id string, terms array<string>",
        )
        got = {
            (r["query_id"], r["doc_id"]): (r["score_micro"], r["rank"])
            for r in bm25_join(docs, queries, k=10).collect()
        }
        for qid, terms in (("a", ["rare", "spark"]), ("b", ["scan"])):
            want = _py_bm25_micro(corpus, terms)
            ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
            for rank, (doc, score) in enumerate(ranked, 1):
                assert got[(qid, doc)] == (score, rank), (qid, doc)
        # no cross-query leakage
        assert ("b", 1) not in got and ("a", 3) not in got

    def test_case_folding_and_duplicate_terms_in_query(self, spark):
        from opentelemetry_collector_components_spark.operators.retrieval import (
            bm25_join,
        )

        docs = _docs(spark, [(1, "x spark y"), (2, "x y z")])
        q1 = spark.createDataFrame(
            [("a", ["Spark", "spark"])], "query_id string, terms array<string>"
        )
        q2 = spark.createDataFrame(
            [("a", ["spark"])], "query_id string, terms array<string>"
        )
        r1 = {(r["query_id"], r["doc_id"]): r["score_micro"]
              for r in bm25_join(docs, q1).collect()}
        r2 = {(r["query_id"], r["doc_id"]): r["score_micro"]
              for r in bm25_join(docs, q2).collect()}
        assert r1 == r2

    def test_k_validation(self, spark):
        from opentelemetry_collector_components_spark.operators.retrieval import (
            bm25_join,
        )

        docs = _docs(spark, [(1, "x")])
        q = spark.createDataFrame([("a", ["x"])], "query_id string, terms array<string>")
        with pytest.raises(ValueError, match="k must be"):
            bm25_join(docs, q, k=0)


class TestRRF:
    def test_hand_checked_fusion(self, spark):
        a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
        b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
        got = {r["doc_id"]: (r["rrf_ppm"], r["n_lists"], r["fused_rank"])
               for r in rrf_fuse([a, b], k=60).collect()}
        # 1e6//61=16393, 1e6//62=16129
        assert got[2] == (16129 + 16393, 2, 1)   # rank2 in a + rank1 in b
        assert got[1] == (16393, 1, 2)           # tie vs doc 3 broken by id
        assert got[3] == (16129, 1, 3)

    def test_validations(self, spark):
        a = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
        with pytest.raises(ValueError, match=">= 2 rank lists"):
            rrf_fuse([a])
        with pytest.raises(ValueError, match="k must be"):
            rrf_fuse([a, a], k=0)


class TestPSIDrift:
    def test_identical_slices_zero(self, spark):
        rows = [(b, base) for b in (0, 8, 16) for base in (True, False)] * 5
        df = spark.createDataFrame(rows, "bucket long, is_base boolean")
        per = psi_histogram_drift(df, "bucket", "is_base").collect()
        assert all(r["psi_micro"] == 0 and r["lnr_micro"] == 0 for r in per)

    def test_planted_shift_positive_and_matches_float_psi(self, spark):
        # baseline mass at bucket 0, comparison mass at bucket 8
        rows = [(0, True)] * 40 + [(8, True)] * 10 + [(0, False)] * 10 + [(8, False)] * 40
        df = spark.createDataFrame(rows, "bucket long, is_base boolean")
        per = {r["bucket"]: r for r in
               psi_histogram_drift(df, "bucket", "is_base").collect()}
        assert all(r["psi_micro"] > 0 for r in per.values())
        # independent float PSI with the same add-1 smoothing
        exact = 0.0
        for cp, cq in ((41, 11), (11, 41)):  # +1 smoothing, B=2, N=50 each
            p, q = cp / 52, cq / 52
            exact += (p - q) * math.log(p / q)
        total = psi_total(df, "bucket", "is_base").collect()[0]
        assert total["psi"] == pytest.approx(exact, abs=1e-5)
        assert total["n_buckets"] == 2

    def test_one_sided_bucket_finite(self, spark):
        rows = [(0, True)] * 5 + [(8, False)] * 5
        df = spark.createDataFrame(rows, "bucket long, is_base boolean")
        per = psi_histogram_drift(df, "bucket", "is_base").collect()
        assert len(per) == 2 and all(r["psi_micro"] > 0 for r in per)

    def test_nonneg_invariant_random(self, spark):
        rows = [((i * 7919) % 5, (i * 104729) % 3 == 0) for i in range(300)]
        df = spark.createDataFrame(rows, "bucket long, is_base boolean")
        assert all(
            r["psi_micro"] >= 0
            for r in psi_histogram_drift(df, "bucket", "is_base").collect()
        )

    def test_null_slice_raises(self, spark):
        df = spark.createDataFrame(
            [(0, True), (8, None)], "bucket long, is_base boolean"
        )
        with pytest.raises(Exception, match="exactly one slice"):
            psi_histogram_drift(df, "bucket", "is_base").collect()

    def test_null_bucket_is_a_cell(self, spark):
        df = spark.createDataFrame(
            [(None, True)] * 3 + [(None, False), (0, False)],
            "bucket long, is_base boolean",
        )
        per = {r["bucket"]: r for r in
               psi_histogram_drift(df, "bucket", "is_base").collect()}
        assert set(per) == {None, 0} and per[None]["cp"] == 3

    def test_grouped_psi_equals_per_group_runs(self, spark):
        from opentelemetry_collector_components_spark.operators.drift import (
            psi_histogram_drift,
            psi_histogram_drift_by,
        )

        rows = (
            [("g1", 0, True)] * 4 + [("g1", 8, False)] * 4
            + [("g2", 0, True)] * 3 + [("g2", 0, False)] * 3
            + [("g2", 16, False)] * 2
        )
        df = spark.createDataFrame(rows, "g string, bucket long, is_base boolean")
        grouped = {
            (r["g"], r["bucket"]): (r["psi_micro"], r["lnr_micro"])
            for r in psi_histogram_drift_by(df, "bucket", "is_base", ["g"]).collect()
        }
        for g in ("g1", "g2"):
            solo = {
                r["bucket"]: (r["psi_micro"], r["lnr_micro"])
                for r in psi_histogram_drift(
                    df.filter(F.col("g") == g), "bucket", "is_base"
                ).collect()
            }
            assert {b: v for (gg, b), v in grouped.items() if gg == g} == solo

    def test_grouped_psi_requires_groups(self, spark):
        from opentelemetry_collector_components_spark.operators.drift import (
            psi_histogram_drift_by,
        )

        df = spark.createDataFrame([(0, True)], "bucket long, is_base boolean")
        with pytest.raises(ValueError, match="group_cols"):
            psi_histogram_drift_by(df, "bucket", "is_base", [])

    def test_ks_hand_checked(self, spark):
        from opentelemetry_collector_components_spark.operators.drift import (
            ks_statistic,
        )

        # baseline: 3 at bucket 0, 1 at bucket 8; comparison: 1 and 3
        rows = [(0, True)] * 3 + [(8, True)] + [(0, False)] + [(8, False)] * 3
        df = spark.createDataFrame(rows, "bucket long, is_base boolean")
        got = ks_statistic(df, "bucket", "is_base").collect()[0]
        # CDFs at bucket 0: 3/4 vs 1/4 -> |3*4 - 1*4| = 8; at 8: equal
        assert (got["d_num"], got["np_total"], got["nq_total"]) == (8, 4, 4)
        assert got["ks"] == pytest.approx(0.5)

    def test_ks_identical_slices_zero(self, spark):
        from opentelemetry_collector_components_spark.operators.drift import (
            ks_statistic,
        )

        rows = [(b, base) for b in (0, 8, 16) for base in (True, False)] * 4
        df = spark.createDataFrame(rows, "bucket long, is_base boolean")
        got = ks_statistic(df, "bucket", "is_base").collect()[0]
        assert got["d_num"] == 0 and got["ks"] == 0.0

    def test_ks_null_buckets_excluded_and_empty_slice_raises(self, spark):
        from opentelemetry_collector_components_spark.operators.drift import (
            ks_statistic,
        )

        rows = [(None, True), (0, True), (8, False)]
        df = spark.createDataFrame(rows, "bucket long, is_base boolean")
        got = ks_statistic(df, "bucket", "is_base").collect()[0]
        assert (got["np_total"], got["nq_total"]) == (1, 1)  # NULL row out
        empty = spark.createDataFrame([(0, True)], "bucket long, is_base boolean")
        with pytest.raises(Exception, match="slice is empty"):
            ks_statistic(empty, "bucket", "is_base").collect()

    def test_ks_fully_empty_histogram_yields_empty_frame(self, spark):
        from opentelemetry_collector_components_spark.operators.drift import (
            ks_statistic,
        )

        # all-NULL buckets and zero rows both produce an EMPTY result (a
        # lazy raise can't fire with no rows) — documented contract
        all_null = spark.createDataFrame(
            [(None, True), (None, False)], "bucket long, is_base boolean"
        )
        assert ks_statistic(all_null, "bucket", "is_base").count() == 0
        empty = spark.createDataFrame([], "bucket long, is_base boolean")
        assert ks_statistic(empty, "bucket", "is_base").count() == 0

    def test_width_bucket(self, spark):
        df = spark.createDataFrame([(0,), (7,), (8,), (23,)], "v long")
        got = [r[0] for r in df.select(width_bucket(F.col("v"), 8)).collect()]
        assert got == [0, 0, 8, 16]
        with pytest.raises(ValueError, match="width"):
            width_bucket(F.col("v"), 0)

    def test_plan_hygiene(self, spark):
        df = spark.createDataFrame([(0, True), (8, False)], "bucket long, is_base boolean")
        plan = (
            psi_histogram_drift(df, "bucket", "is_base")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan

    def test_emd_hand_checked(self, spark):
        from opentelemetry_collector_components_spark.operators.drift import (
            emd_statistic,
        )

        # baseline: 3 at bucket 0, 1 at bucket 8; comparison: 1 and 3.
        # CDF gap at bucket 0 = |3*4 - 1*4| = 8, carried over gap 8 -> 64;
        # W1 = 64 / 16 = 4.0 token-count units (mass 0.5 moved distance 8)
        rows = [(0, True)] * 3 + [(8, True)] + [(0, False)] + [(8, False)] * 3
        df = spark.createDataFrame(rows, "bucket long, is_base boolean")
        got = emd_statistic(df, "bucket", "is_base").collect()[0]
        assert (got["w1_num"], got["np_total"], got["nq_total"]) == (64, 4, 4)
        assert got["emd"] == pytest.approx(4.0)

    def test_emd_absent_bucket_gap_exact(self, spark):
        from opentelemetry_collector_components_spark.operators.drift import (
            emd_statistic,
        )

        # all baseline mass at 0, all comparison at 24: W1 must be the
        # full distance 24 even though buckets 8 and 16 are absent
        rows = [(0, True)] * 2 + [(24, False)] * 2
        df = spark.createDataFrame(rows, "bucket long, is_base boolean")
        got = emd_statistic(df, "bucket", "is_base").collect()[0]
        assert got["emd"] == pytest.approx(24.0)

    def test_emd_identical_slices_zero_and_python_reference(self, spark):
        import random

        from opentelemetry_collector_components_spark.operators.drift import (
            emd_statistic,
        )

        rows = [(b, base) for b in (0, 8, 16) for base in (True, False)] * 4
        df = spark.createDataFrame(rows, "bucket long, is_base boolean")
        got = emd_statistic(df, "bucket", "is_base").collect()[0]
        assert got["w1_num"] == 0 and got["emd"] == 0.0

        rng = random.Random(7)
        rows = [(8 * rng.randint(0, 12), rng.random() < 0.5) for _ in range(400)]
        df = spark.createDataFrame(rows, "bucket long, is_base boolean")
        got = emd_statistic(df, "bucket", "is_base").collect()[0]

        def cdf_w1(rows):
            from collections import Counter

            p = Counter(b for b, f in rows if f)
            q = Counter(b for b, f in rows if not f)
            np_, nq = sum(p.values()), sum(q.values())
            bs = sorted(set(p) | set(q))
            total, cp, cq = 0, 0, 0
            for b, nxt in zip(bs, bs[1:]):
                cp, cq = cp + p[b], cq + q[b]
                total += abs(cp * nq - cq * np_) * (nxt - b)
            return total, np_, nq

        w1, np_, nq = cdf_w1(rows)
        assert (got["w1_num"], got["np_total"], got["nq_total"]) == (w1, np_, nq)

    def test_emd_fractional_bucket_rejected(self, spark):
        from opentelemetry_collector_components_spark.operators.drift import (
            emd_statistic,
        )

        df = spark.createDataFrame(
            [(0.0, True), (0.5, False)], "bucket double, is_base boolean"
        )
        with pytest.raises(ValueError, match="integral"):
            emd_statistic(df, "bucket", "is_base")

    def test_emd_single_bucket_zero_and_empty_slice_raises(self, spark):
        from opentelemetry_collector_components_spark.operators.drift import (
            emd_statistic,
        )

        one = spark.createDataFrame(
            [(0, True), (0, False)], "bucket long, is_base boolean"
        )
        got = emd_statistic(one, "bucket", "is_base").collect()[0]
        assert got["w1_num"] == 0 and got["emd"] == 0.0
        empty = spark.createDataFrame([(0, True)], "bucket long, is_base boolean")
        with pytest.raises(Exception, match="slice is empty"):
            emd_statistic(empty, "bucket", "is_base").collect()


class TestPhraseMatch:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_adjacency_counts_and_positions(self, spark):
        from opentelemetry_collector_components_spark.operators.retrieval import (
            phrase_match,
        )

        docs = self._docs(spark, [
            (1, "the fast table beats the fast table scan"),
            (2, "fast and table are not adjacent"),
            (3, "Fast Table case folds"),
            (4, "table fast reversed"),
            (5, "fast"),                       # shorter than the phrase
            (6, "  fast   table  "),           # empty split tokens dropped
        ])
        out = {r.doc_id: (r.n_occurrences, r.first_pos)
               for r in phrase_match(docs, "fast table").collect()}
        assert out == {1: (2, 2), 3: (1, 1), 6: (1, 1)}

    def test_single_term_and_validation(self, spark):
        import pytest

        from opentelemetry_collector_components_spark.operators.retrieval import (
            phrase_match,
        )

        docs = self._docs(spark, [(1, "a b a")])
        out = phrase_match(docs, "a").collect()
        assert (out[0].n_occurrences, out[0].first_pos) == (2, 1)
        with pytest.raises(ValueError):
            phrase_match(docs, "   ")

    def test_plan_shuffle_and_python_free(self, spark):
        from opentelemetry_collector_components_spark.operators.retrieval import (
            phrase_match,
        )

        docs = self._docs(spark, [(1, "x y")])
        plan = phrase_match(docs, "x y")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure scan-fused map work
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_build_postings_delta_encoding_and_max_df(spark):
    from opentelemetry_collector_components_spark.operators.retrieval import (
        build_postings,
    )

    docs = spark.createDataFrame(
        [(5, "a b a"), (8, "a c"), (22, "a"), (9, None), (10, "")],
        "doc_id long, text string",
    )
    got = {r.term: (r.df, r.postings) for r in build_postings(docs).collect()}
    # repeated term in one doc counts once; deltas reconstruct 5,8,22
    assert got["a"] == (3, "5,3,14")
    assert got["b"] == (1, "5")
    assert got["c"] == (1, "8")
    capped = {r.term for r in build_postings(docs, max_df=2).collect()}
    assert capped == {"b", "c"}
