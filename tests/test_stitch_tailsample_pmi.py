"""Multiline stitching, tail-based trace sampling, PMI collocations:
hand-checked semantics, policy precedence, validations."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.stitch import (
    stitch_multiline,
)
from opentelemetry_collector_components_spark.operators.tailsample import (
    tail_sample_stats,
    tail_sample_traces,
)
from opentelemetry_collector_components_spark.operators.textmine import (
    pmi_collocations,
)


def _lines(spark, rows):
    return spark.createDataFrame(rows, "file string, line_no long, line string")


def _spans(spark, rows):
    return spark.createDataFrame(
        rows, "trace_id string, span_id long, is_error boolean, duration_us long"
    )


STACK = [
    ("a.log", 0, "  at orphan.frame"),
    ("a.log", 1, "2024-01-01 ERROR boom"),
    ("a.log", 2, "  at Foo.bar(Foo.java:1)"),
    ("a.log", 3, "  at Baz.qux(Baz.java:2)"),
    ("a.log", 4, "2024-01-01 INFO ok"),
    ("b.log", 0, "2024-01-02 INFO solo"),
]


class TestStitchMultiline:
    def test_assembles_stack_trace(self, spark):
        out = {
            (r["file"], r["record_id"]): r
            for r in stitch_multiline(
                _lines(spark, STACK), r"^2024", ["file"]
            ).collect()
        }
        assert len(out) == 4
        boom = out[("a.log", 1)]
        assert boom["message"] == (
            "2024-01-01 ERROR boom\n  at Foo.bar(Foo.java:1)\n"
            "  at Baz.qux(Baz.java:2)"
        )
        assert boom["n_lines"] == 3 and boom["clean_start"]
        assert not boom["truncated"]
        assert out[("b.log", 1)]["message"] == "2024-01-02 INFO solo"

    def test_orphan_prefix_kept_not_dropped(self, spark):
        out = stitch_multiline(_lines(spark, STACK), r"^2024", ["file"])
        orphan = out.where(~F.col("clean_start")).collect()
        assert len(orphan) == 1
        assert orphan[0]["record_id"] == 0
        assert orphan[0]["message"] == "  at orphan.frame"

    def test_truncation_flags_and_caps(self, spark):
        out = stitch_multiline(
            _lines(spark, STACK), r"^2024", ["file"], max_lines=2
        ).where(F.col("record_id") == 1)
        row = out.where(F.col("file") == "a.log").collect()[0]
        assert row["truncated"] and row["n_lines"] == 3
        assert row["message"].count("\n") == 1  # capped at 2 physical lines

    def test_line_order_independent_of_input_order(self, spark):
        shuffled = _lines(spark, list(reversed(STACK))).repartition(4)
        a = stitch_multiline(_lines(spark, STACK), r"^2024", ["file"])
        b = stitch_multiline(shuffled, r"^2024", ["file"])
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_max_lines_validation(self, spark):
        with pytest.raises(ValueError, match="max_lines"):
            stitch_multiline(_lines(spark, STACK), r"^2024", ["file"], max_lines=0)


TRACES = [
    ("t1", 1, False, 100),
    ("t1", 2, True, 50),
    ("t2", 3, False, 2_000_000),
    ("t2", 4, False, 10),
    ("t3", 5, False, 10),
]


class TestTailSampleTraces:
    def test_whole_trace_survives_with_constant_reason(self, spark):
        kept = tail_sample_traces(
            _spans(spark, TRACES), rate=0.0
        ).collect()
        by_trace: dict[str, set] = {}
        for r in kept:
            by_trace.setdefault(r["trace_id"], set()).add(r["sample_reason"])
        assert by_trace == {"t1": {"error"}, "t2": {"latency"}}
        assert len(kept) == 4  # both spans of each kept trace

    def test_error_precedes_latency(self, spark):
        rows = [("tx", 1, True, 9_000_000), ("tx", 2, False, 1)]
        kept = tail_sample_traces(_spans(spark, rows), rate=0.0).collect()
        assert {r["sample_reason"] for r in kept} == {"error"}

    def test_rate_one_keeps_everything(self, spark):
        df = _spans(spark, TRACES)
        assert tail_sample_traces(df, rate=1.0).count() == df.count()

    def test_disabled_policies(self, spark):
        kept = tail_sample_traces(
            _spans(spark, TRACES), error_col=None, slow_threshold_us=None,
            rate=1.0,
        )
        assert kept.where(F.col("sample_reason") != "probabilistic").count() == 0

    def test_stats_rollup(self, spark):
        stats = {
            r["sample_reason"]: (r["n_traces"], r["n_spans"])
            for r in tail_sample_stats(_spans(spark, TRACES), rate=0.0).collect()
        }
        assert stats == {"error": (1, 2), "latency": (1, 2)}

    def test_validations(self, spark):
        df = _spans(spark, TRACES)
        with pytest.raises(ValueError, match="rate"):
            tail_sample_traces(df, rate=1.5)
        with pytest.raises(ValueError, match="disabled"):
            tail_sample_traces(
                df, error_col=None, slow_threshold_us=None, rate=0.0
            )
        # duration_col=None disables latency even with the threshold at its
        # default — so this combination is also "everything disabled" and
        # must raise, not silently drop 100% of traces
        with pytest.raises(ValueError, match="disabled"):
            tail_sample_traces(df, error_col=None, duration_col=None, rate=0.0)


class TestPmiCollocations:
    def test_hand_computed_pmi(self, spark):
        docs = spark.createDataFrame(
            [(1, "new york new york is big"), (2, "new york wins")],
            "doc_id long, text string",
        )
        rows = pmi_collocations(docs, min_count=2).collect()
        assert len(rows) == 1
        r = rows[0]
        # corpus: 9 tokens, 7 bigrams; "new york" x3; c(new)=c(york)=3
        assert (r["x"], r["y"], r["c_xy"], r["c_x"], r["c_y"]) == (
            "new", "york", 3, 3, 3
        )
        expected = math.floor(1e6 * math.log((3 * 9) * 9 / (7 * 3) / 3))
        assert r["pmi_micro"] == expected

    def test_empty_and_null_docs_ignored(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, ""), (3, None), (4, "a")],
            "doc_id long, text string",
        )
        rows = pmi_collocations(docs, min_count=2).collect()
        assert {(r["x"], r["y"]) for r in rows} == {("a", "b")}
        # token 'a' appears 3x (the singleton doc counts toward unigrams)
        assert rows[0]["c_x"] == 3

    def test_min_count_prunes(self, spark):
        docs = spark.createDataFrame(
            [(1, "p q p q"), (2, "r s")], "doc_id long, text string"
        )
        got = {
            (r["x"], r["y"])
            for r in pmi_collocations(docs, min_count=1).collect()
        }
        assert ("r", "s") in got and ("q", "p") in got
        assert pmi_collocations(docs, min_count=3).count() == 0

    def test_validation(self, spark):
        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="min_count"):
            pmi_collocations(docs, min_count=0)


def test_head_sample_consistent_and_nested(spark):
    """All-or-nothing per trace; p=0.1 traces are a subset of p=0.5's;
    keep fraction tracks the rate."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.tailsample import (
        head_sample_traces,
    )

    spans = spark.range(6000).select(
        F.concat(F.lit("t"), (F.col("id") % 2000).cast("string")).alias(
            "trace_id"
        ),
        F.col("id").alias("span_id"),
    )
    k10 = head_sample_traces(spans, 100_000)
    k50 = head_sample_traces(spans, 500_000)
    # consistency: every kept trace keeps ALL 3 of its spans
    per = k10.groupBy("trace_id").count().collect()
    assert per and all(r["count"] == 3 for r in per)
    # nesting: the 10% trace set is contained in the 50% set
    t10 = {r["trace_id"] for r in k10.select("trace_id").distinct().collect()}
    t50 = {r["trace_id"] for r in k50.select("trace_id").distinct().collect()}
    assert t10 <= t50
    assert abs(len(t10) / 2000 - 0.1) < 0.03
    assert abs(len(t50) / 2000 - 0.5) < 0.04
    # adjusted count
    assert k10.select("representative_count").first()[0] == 10.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        head_sample_traces(spans, 0)
