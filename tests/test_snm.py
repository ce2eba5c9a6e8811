"""Sorted-neighborhood blocking + distributed global positions."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.dedup import (
    sorted_neighborhood_pairs,
)
from opentelemetry_collector_components_spark.operators.partition import (
    global_positions,
)


def test_global_positions_dense_and_ordered(spark):
    rows = [(i, f"k{i % 7:02d}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, key string")
    got = global_positions(df, ["key", "id"], pos_col="pos", partitions=5)
    data = got.collect()
    assert sorted(r["pos"] for r in data) == list(range(200))
    by_order = sorted(data, key=lambda r: (r["key"], r["id"]))
    assert [r["pos"] for r in by_order] == list(range(200))


def test_global_positions_empty(spark):
    df = spark.createDataFrame([], "id long, key string")
    assert global_positions(df, ["key", "id"]).count() == 0


def _brute_pairs(rows, window):
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (aid, akey) in enumerate(order):
        for j in range(i + 1, min(i + window + 1, len(order))):
            out.add((aid, order[j][0], akey, order[j][1], j - i))
    return out


@pytest.mark.parametrize("window", [1, 3])
def test_snm_pairs_match_bruteforce(spark, window):
    # duplicate-ish keys cluster adjacent rows; ids break ties
    rows = [(i, f"title {i % 13:03d}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, key string")
    got = {
        (r["a_id"], r["b_id"], r["a_key"], r["b_key"], r["gap"])
        for r in sorted_neighborhood_pairs(df, "key", window=window).collect()
    }
    assert got == _brute_pairs(rows, window)
    # candidate count is exactly window*n - window*(window+1)/2
    assert len(got) == window * len(rows) - window * (window + 1) // 2


def test_snm_validation_and_no_global_window(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, key string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "key", window=0)
    plan = (
        sorted_neighborhood_pairs(df, "key", window=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # positions come from range repartition + per-partition windows,
    # never a partition-less global sort window
    assert "rangepartitioning" in plan
    for line in plan.splitlines():
        if "Window " in line or line.strip().startswith("Window"):
            assert "_pid" in line
