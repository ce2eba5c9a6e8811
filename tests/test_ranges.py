"""Range join: broadcast and bucketized forms, edge semantics."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.ranges import (
    range_lookup_broadcast,
    range_lookup_bucketed,
)


@pytest.fixture(scope="module")
def tables(spark):
    facts = spark.createDataFrame(
        [(1, 0), (2, 7), (3, 8), (4, 25), (5, -3), (6, 99)],
        "fact_id long, v long",
    )
    ranges = spark.createDataFrame(
        [(0, 8, "a"), (20, 30, "b"), (-10, 0, "neg"), (50, 50, "empty")],
        "lo long, hi long, tag string",
    )
    return facts, ranges


EXPECTED = {1: "a", 2: "a", 3: None, 4: "b", 5: "neg", 6: None}


@pytest.mark.parametrize(
    "impl",
    [
        range_lookup_broadcast,
        lambda f, r, v: range_lookup_bucketed(f, r, v, bucket_size=7),
        lambda f, r, v: range_lookup_bucketed(f, r, v, bucket_size=1000),
    ],
)
def test_containment_semantics(spark, tables, impl):
    facts, ranges = tables
    got = {r["fact_id"]: r["tag"] for r in impl(facts, ranges, "v").collect()}
    assert got == EXPECTED


def test_overlapping_ranges_emit_all_matches(spark, tables):
    facts, _ = tables
    overlapping = spark.createDataFrame(
        [(0, 10, "x"), (5, 15, "y")], "lo long, hi long, tag string"
    )
    rows = range_lookup_bucketed(facts, overlapping, "v", bucket_size=4).collect()
    tags_for_7 = sorted(r["tag"] for r in rows if r["fact_id"] == 2)
    assert tags_for_7 == ["x", "y"]


def test_bucketed_join_is_equi_not_nested_loop(spark, tables):
    facts, ranges = tables
    plan = (
        range_lookup_bucketed(facts, ranges, "v", bucket_size=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan


def test_fractional_bounds_final_partial_bucket(spark):
    """Review r4: fractional hi must keep the final partial bucket — the
    old floor((hi-1)/bs) form dropped matches there."""
    facts = spark.createDataFrame([(1, 10.2), (2, 10.6)], "fact_id long, v double")
    ranges = spark.createDataFrame([(5.0, 10.5, "x")], "lo double, hi double, tag string")
    got = {
        r["fact_id"]: r["tag"]
        for r in range_lookup_bucketed(facts, ranges, "v", bucket_size=10).collect()
    }
    assert got == {1: "x", 2: None}


def test_boundary_hi_excludes_next_bucket(spark):
    """hi exactly on a bucket boundary must not leak the interval into
    the next bucket (open upper bound)."""
    facts = spark.createDataFrame([(1, 9), (2, 10)], "fact_id long, v long")
    ranges = spark.createDataFrame([(0, 10, "x")], "lo long, hi long, tag string")
    got = {
        r["fact_id"]: r["tag"]
        for r in range_lookup_bucketed(facts, ranges, "v", bucket_size=10).collect()
    }
    assert got == {1: "x", 2: None}


def test_longs_beyond_double_precision(spark):
    """Review r4: bucket arithmetic is decimal — longs above 2^53 must not
    land in adjacent buckets via double rounding."""
    v = (1 << 53) + 3
    facts = spark.createDataFrame([(1, v)], "fact_id long, v long")
    ranges = spark.createDataFrame(
        [(v - 1, v + 2, "big")], "lo long, hi long, tag string"
    )
    a = range_lookup_broadcast(facts, ranges, "v").collect()[0]["tag"]
    b = range_lookup_bucketed(facts, ranges, "v", bucket_size=7).collect()[0]["tag"]
    assert a == b == "big"


# ---------------------------------------------------------------------------
# interval_overlap_join
# ---------------------------------------------------------------------------
def test_overlap_join_matches_naive_at_any_bucket_width(spark):
    import random

    from opentelemetry_collector_components_spark.operators.ranges import (
        interval_overlap_join,
    )

    rng = random.Random(12)

    def mk(n):
        out = []
        for i in range(n):
            lo = rng.randint(0, 500)
            out.append(("h1", i, lo, lo + rng.randint(1, 80)))
        return out

    L, R = mk(40), mk(40)
    L += [("h2", 100, 0, 50)]
    R += [("h2", 200, 49, 60), ("h2", 201, 50, 60)]  # touching != overlap
    la = spark.createDataFrame(L, ["host", "aid", "lo", "hi"])
    rb = spark.createDataFrame(R, ["host", "bid", "lo", "hi"])

    exp = {
        (h1, i, j, max(alo, blo), min(ahi, bhi))
        for h1, i, alo, ahi in L
        for h2, j, blo, bhi in R
        if h1 == h2 and alo < bhi and blo < ahi
    }
    for bs in (16, 64, 1000):
        got = {
            (r["host"], r["aid"], r["bid"], r["overlap_lo"], r["overlap_hi"])
            for r in interval_overlap_join(
                la, rb, "aid", "bid", bs, key_cols=["host"]
            ).collect()
        }
        assert got == exp, bs
    assert ("h2", 100, 201, 50, 50) not in exp  # half-open boundary


def test_overlap_join_empty_intervals_and_validation(spark):
    import pytest

    from opentelemetry_collector_components_spark.operators.ranges import (
        interval_overlap_join,
    )

    la = spark.createDataFrame([(1, 10, 10), (2, 0, 5)], ["aid", "lo", "hi"])
    rb = spark.createDataFrame([(9, 0, 100)], ["bid", "lo", "hi"])
    out = interval_overlap_join(la, rb, "aid", "bid", 8).collect()
    # empty interval (hi <= lo) matches nothing
    assert {r["aid"] for r in out} == {2}
    assert out[0]["overlap_len"] == 5
    with pytest.raises(ValueError, match="bucket_size"):
        interval_overlap_join(la, rb, "aid", "bid", 0)


def test_overlap_join_same_id_name_renames(spark):
    from opentelemetry_collector_components_spark.operators.ranges import (
        interval_overlap_join,
    )

    la = spark.createDataFrame([(1, 0, 10)], ["iid", "lo", "hi"])
    rb = spark.createDataFrame([(2, 5, 15)], ["iid", "lo", "hi"])
    out = interval_overlap_join(la, rb, "iid", "iid", 8).collect()[0]
    assert (out["left_id"], out["right_id"]) == (1, 2)
    assert (out["overlap_lo"], out["overlap_hi"], out["overlap_len"]) == (5, 10, 5)
