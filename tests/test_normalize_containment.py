"""normalize_text rules + asymmetric containment semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.functions.webtext import (
    normalize_text,
)
from opentelemetry_collector_components_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)


def _norm(spark, s):
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(normalize_text(F.col("text")).alias("n")).collect()[0]["n"]


class TestNormalizeText:
    def test_rules_hand_checked(self, spark):
        assert _norm(spark, "  Hello,\tWORLD!!  v2.5-beta  ") == "hello world v0 0 beta"
        assert _norm(spark, "a\x00b\x1fc") == "a b c"      # control chars
        assert _norm(spark, "price $49.99!") == "price 00 00"  # digits+punct
        assert _norm(spark, "---") == ""                     # punct-only

    def test_idempotent(self, spark):
        raw = "  MiXeD 123 ... CaSe\t&  Punct!! "
        once = _norm(spark, raw)
        assert _norm(spark, once) == once

    def test_null_passthrough(self, spark):
        assert _norm(spark, None) is None


class TestContainment:
    QUOTE = "alpha beta gamma delta epsilon"

    def _docs(self, spark):
        filler = " ".join(f"w{i}" for i in range(45))
        return spark.createDataFrame(
            [(1, self.QUOTE), (2, filler + " " + self.QUOTE)],
            "doc_id long, text string",
        )

    def test_quote_detected_where_jaccard_misses(self, spark):
        docs = self._docs(spark)
        pairs = ngram_containment_pairs(docs, threshold=0.9, exact=True).collect()
        assert len(pairs) == 1
        p = pairs[0]
        assert (p["id_a"], p["id_b"]) == (1, 2)
        assert p["containment_a"] == 1.0       # all of doc 1 inside doc 2
        assert p["containment_b"] < 0.1
        # symmetric Jaccard at the same bar finds nothing
        assert (
            ngram_jaccard_pairs(docs, threshold=0.9, exact=True).count() == 0
        )

    def test_exact_boundary(self, spark):
        # doc 1: 4 trigram shingles, exactly 2 shared with doc 2
        docs = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d x y")],
            "doc_id long, text string",
        )
        # shared shingles: 'a b c', 'b c d' -> common=2, n_a=4 -> 0.5
        hit = ngram_containment_pairs(docs, threshold=0.5, exact=True).collect()
        assert len(hit) == 1 and hit[0]["common"] == 2 and hit[0]["n_a"] == 4
        assert (
            ngram_containment_pairs(docs, threshold=0.51, exact=True).count() == 0
        )

    def test_decimal_threshold_exact_at_boundary(self, spark):
        # doc 1: 100 distinct trigram shingles; exactly 7 shared with doc 2
        # -> containment_a exactly 0.07.  Float 0.07*100 is
        # 7.000000000000001, which would wrongly drop the pair; the
        # Fraction('0.07') = 7/100 integer test must keep it.
        a_toks = [f"t{i}" for i in range(102)]           # 100 shingles
        b_toks = a_toks[:9] + [f"z{i}" for i in range(40)]  # shares 7
        docs = spark.createDataFrame(
            [(1, " ".join(a_toks)), (2, " ".join(b_toks))],
            "doc_id long, text string",
        )
        got = ngram_containment_pairs(docs, threshold=0.07, exact=True).collect()
        assert len(got) == 1 and got[0]["common"] == 7 and got[0]["n_a"] == 100
        # tuple form and validation
        assert (
            ngram_containment_pairs(docs, threshold=(7, 100), exact=True).count()
            == 1
        )
        with pytest.raises(ValueError, match="threshold"):
            ngram_containment_pairs(docs, threshold=0.0, exact=True)

    def test_scale_guard_shared_with_jaccard(self, spark):
        docs = self._docs(spark)
        with pytest.raises(ValueError, match="ngram_containment_pairs"):
            ngram_containment_pairs(docs)
        # max_shingle_df path still works and keeps the planted pair
        assert (
            ngram_containment_pairs(docs, threshold=0.9, max_shingle_df=10).count()
            == 1
        )
