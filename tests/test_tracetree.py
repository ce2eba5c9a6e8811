"""Span-tree BFS: depths/paths/cumulative durations, orphan subtrees,
cycle termination, and the critical-path argmax tie-break."""

from __future__ import annotations

import pytest

from opentelemetry_collector_components_spark.operators.tracetree import (
    span_tree_paths,
    trace_critical_path,
)


def _spans(spark, rows):
    return spark.createDataFrame(
        rows, "trace_id string, span_id string, parent_span_id string, dur_us long"
    )


TREE = [
    ("t1", "root", None, 100),
    ("t1", "a", "root", 50),
    ("t1", "b", "root", 10),
    ("t1", "a1", "a", 5),
    ("t1", "b1", "b", 200),
]


def test_depths_paths_and_cum(spark):
    out = {r.span_id: r for r in span_tree_paths(_spans(spark, TREE)).collect()}
    assert out["root"].depth == 0 and out["root"].path == "root"
    assert out["a"].depth == 1 and out["a"].cum_us == 150
    assert out["a1"].depth == 2 and out["a1"].path == "root>a>a1"
    assert out["b1"].cum_us == 310
    assert not any(r.is_orphan for r in out.values())


def test_orphan_subtree_and_empty_string_root(spark):
    rows = [
        ("t1", "r", "", 1),          # '' parent is a root too
        ("t1", "x", "missing", 2),   # broken chain
        ("t1", "x1", "x", 3),        # child of the orphan: also unreachable
    ]
    out = {r.span_id: r for r in span_tree_paths(_spans(spark, rows)).collect()}
    assert out["r"].depth == 0
    assert out["x"].is_orphan and out["x"].depth is None and out["x"].path is None
    assert out["x1"].is_orphan


def test_cycle_terminates_as_orphans(spark):
    rows = [
        ("t1", "r", None, 1),
        ("t1", "c1", "c2", 1),
        ("t1", "c2", "c1", 1),
    ]
    out = {r.span_id: r.is_orphan for r in span_tree_paths(_spans(spark, rows)).collect()}
    assert out == {"r": False, "c1": True, "c2": True}


def test_max_depth_cutoff_marks_deeper_spans_orphan(spark):
    chain = [("t1", "s0", None, 1)] + [
        ("t1", f"s{i}", f"s{i-1}", 1) for i in range(1, 5)
    ]
    out = {r.span_id: r.depth for r in span_tree_paths(_spans(spark, chain), max_depth=2).collect()}
    assert out == {"s0": 0, "s1": 1, "s2": 2, "s3": None, "s4": None}
    with pytest.raises(ValueError):
        span_tree_paths(_spans(spark, chain), max_depth=0)


def test_critical_path_argmax_and_tie_break(spark):
    paths = span_tree_paths(_spans(spark, TREE))
    row = trace_critical_path(paths).collect()[0]
    assert (row.critical_path, row.path_us, row.path_depth) == ("root>b>b1", 310, 2)
    # exact tie on cum: lexicographically smaller path wins
    tie = [
        ("t2", "r", None, 10),
        ("t2", "aa", "r", 7),
        ("t2", "zz", "r", 7),
    ]
    row2 = trace_critical_path(span_tree_paths(_spans(spark, tie))).collect()[0]
    assert row2.critical_path == "r>aa" and row2.path_us == 17


def test_no_python_in_plan(spark):
    out = span_tree_paths(_spans(spark, TREE))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
