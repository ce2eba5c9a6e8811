"""Zone-map file skipping: envelope build, overlap decisions incl. the
all-NULL-column rule, summary math, validation, JVM-only plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.skipping import (
    file_stats,
    prune_scan,
    scan_summary,
)


def _manifest(spark):
    rows = [
        # file 1: v in [0, 9]     file 2: v in [10, 19]   file 3: all NULL
        *[(1, v) for v in range(10)],
        *[(2, v) for v in range(10, 20)],
        (3, None),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "f int, v: long")
    return file_stats(df, "f", ["v"])


def test_envelopes(spark):
    got = {r.file_id: r for r in _manifest(spark).collect()}
    assert (got[1].v_min, got[1].v_max, got[1].n_rows) == (0, 9, 10)
    assert (got[2].v_min, got[2].v_max) == (10, 19)
    assert got[3].v_min is None and got[3].n_rows == 2


def test_overlap_decisions(spark):
    m = _manifest(spark)
    # [5, 12] overlaps both data files; NULL file skipped
    got = {r.file_id: r.must_read for r in prune_scan(m, [("v", 5, 12)]).collect()}
    assert got == {1: True, 2: True, 3: False}
    # boundary touch counts as overlap (closed intervals)
    got = {r.file_id: r.must_read for r in prune_scan(m, [("v", 9, 9)]).collect()}
    assert got == {1: True, 2: False, 3: False}
    # disjoint range skips everything
    got = {r.file_id: r.must_read for r in prune_scan(m, [("v", 40, 50)]).collect()}
    assert got == {1: False, 2: False, 3: False}


def test_conjunction_requires_all(spark):
    df = spark.createDataFrame(
        [(1, 0, 100), (1, 9, 200), (2, 0, 900)], "f int, a long, b long"
    )
    m = file_stats(df, "f", ["a", "b"])
    # file 1 passes a-range but fails b-range -> skipped
    got = {
        r.file_id: r.must_read
        for r in prune_scan(m, [("a", 0, 5), ("b", 800, 999)]).collect()
    }
    assert got == {1: False, 2: True}


def test_scan_summary(spark):
    m = prune_scan(_manifest(spark), [("v", 0, 9)])
    r = scan_summary(m, "test").collect()[0]
    assert (r.layout, r.files_total, r.files_read) == ("test", 3, 1)
    assert (r.rows_read, r.rows_total) == (10, 22)


def test_validation(spark):
    df = spark.createDataFrame([(1, 1)], "f int, v long")
    with pytest.raises(ValueError, match="stat_cols"):
        file_stats(df, "f", [])
    m = file_stats(df, "f", ["v"])
    with pytest.raises(ValueError, match="predicates"):
        prune_scan(m, [])
    with pytest.raises(ValueError, match="empty predicate range"):
        prune_scan(m, [("v", 5, 4)])


def test_jvm_only_plan(spark):
    df = spark.createDataFrame([(1, v) for v in range(50)], "f int, v long")
    plan = (
        scan_summary(prune_scan(file_stats(df, "f", ["v"]), [("v", 1, 2)]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- point-lookup Bloom pruning --------------------------------------------
from opentelemetry_collector_components_spark.operators.skipping import (  # noqa: E402
    file_bloom_stats,
    prune_point_lookups,
)


def test_bloom_no_false_negatives(spark):
    df = spark.createDataFrame(
        [(f, v) for f in range(4) for v in range(f * 100, f * 100 + 50)],
        "f int, v long",
    )
    stats = file_bloom_stats(df, "f", "v", 4096, 3)
    # every present key must mark its own file readable
    for key, holder in [(0, 0), (125, 1), (249, 2), (349, 3)]:
        got = {r.file_id: r.must_read for r in prune_point_lookups(stats, [key], 4096, 3).collect()}
        assert got[holder] is True


def test_bloom_skips_absent_key_at_generous_sizing(spark):
    # 50 keys into 4096 bits x 3 hashes -> fp rate ~ (150/4096)^3 ~ 5e-5
    df = spark.createDataFrame([(1, v) for v in range(50)], "f int, v long")
    stats = file_bloom_stats(df, "f", "v", 4096, 3)
    got = prune_point_lookups(stats, [999_999], 4096, 3).collect()[0]
    assert got.must_read is False


def test_bloom_stats_shape_and_null_keys(spark):
    df = spark.createDataFrame(
        [(1, 5), (1, 5), (1, None), (2, 7)], "f int, v: long"
    )
    got = {r.file_id: r for r in file_bloom_stats(df, "f", "v", 64, 3).collect()}
    # n_rows counts ALL rows (NULL keys too), matching file_stats so the
    # two manifest builders report comparable row volumes
    assert got[1].n_rows == 3
    assert 1 <= len(got[1].bloom_bits) <= 3  # dup rows add no bits; NULL adds none
    assert got[1].bloom_bits == sorted(got[1].bloom_bits)


def test_bloom_stats_all_null_file(spark):
    df = spark.createDataFrame([(9, None), (9, None)], "f int, v: long")
    got = file_bloom_stats(df, "f", "v", 64, 3).collect()[0]
    assert got.n_rows == 2 and list(got.bloom_bits) == []


def test_bloom_validation(spark):
    df = spark.createDataFrame([(1, 1)], "f int, v long")
    with pytest.raises(ValueError, match="m_bits"):
        file_bloom_stats(df, "f", "v", 4, 3)
    with pytest.raises(ValueError, match="k_hashes"):
        file_bloom_stats(df, "f", "v", 64, 0)
    with pytest.raises(ValueError, match="keys"):
        prune_point_lookups(file_bloom_stats(df, "f", "v"), [])
