"""Category blocklist matching: hand-checked counts, longest-first
phrase precedence, word boundaries, filter threshold, validation."""

from __future__ import annotations

import pytest


def test_blocklist_hand_checked_counts(spark):
    from opentelemetry_collector_components_spark.operators.blocklist import (
        blocklist_matches,
    )

    docs = [
        (1, "Fast cars go fast. FAST!"),        # 3 'fast' hits, case-folded
        (2, "breakfast is not fast food"),      # boundary: breakfast != fast
        (3, "merge batch then merge again"),    # phrase wins over its word
        (4, "nothing here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cats = {"speed": ["fast"], "ops": ["merge batch", "merge"]}
    got = {(r.doc_id, r.category): r.n_hits
           for r in blocklist_matches(df, "doc_id", "text", cats).collect()}
    assert got[(1, "speed")] == 3
    assert got[(2, "speed")] == 1          # 'fast food' only, not breakfast
    # 'merge batch' consumed by the long alternative; lone 'merge' counted
    assert got[(3, "ops")] == 2
    assert (4, "speed") not in got and (4, "ops") not in got


def test_blocklist_filter_threshold(spark):
    from opentelemetry_collector_components_spark.operators.blocklist import (
        blocklist_filter,
    )

    docs = [(1, "clean text"), (2, "one fast hit"), (3, "fast fast")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cats = {"speed": ["fast"]}
    assert {r.doc_id for r in
            blocklist_filter(df, "doc_id", "text", cats).collect()} == {1}
    assert {r.doc_id for r in
            blocklist_filter(df, "doc_id", "text", cats,
                             max_total_hits=1).collect()} == {1, 2}


def test_blocklist_validation_and_metachars(spark):
    from opentelemetry_collector_components_spark.operators.blocklist import (
        blocklist_matches,
        category_pattern,
    )

    with pytest.raises(ValueError):
        category_pattern([])
    with pytest.raises(ValueError):
        category_pattern(["ok", "  "])
    with pytest.raises(ValueError):
        blocklist_matches(None, "id", "text", {})
    # metacharacters are escaped, not interpreted
    assert r"c\+\+" in category_pattern(["c++"])
    df = spark.createDataFrame([(1, "i write c++ daily")],
                               "doc_id long, text string")
    got = blocklist_matches(df, "doc_id", "text", {"lang": ["c++"]}).collect()
    # '\bc\+\+\b' needs a word char after '++' — 'c++ daily' has none,
    # so the boundary form matches zero times (documented semantics)
    assert got == []
