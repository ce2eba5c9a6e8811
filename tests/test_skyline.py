"""Skyline: hand-checked frontier, tie survival, direction handling,
local-prune exactness across partitions, NULL rejection."""

from __future__ import annotations

import pytest


def test_skyline_hand_checked_2d(spark):
    from opentelemetry_collector_components_spark.operators.skyline import (
        skyline,
    )

    # maximize x, minimize y: frontier is (5,1), (3,0); (5,2) dominated
    # by (5,1); (2,1) dominated by (5,1); (1,0) dominated by (3,0)
    rows = [(1, 5, 1), (2, 5, 2), (3, 3, 0), (4, 2, 1), (5, 1, 0)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r.id for r in skyline(df, maximize=["x"], minimize=["y"]).collect()}
    assert got == {1, 3}
    # flipping directions flips the frontier: minimize x, maximize y —
    # (5,2), (2,1), (1,0) are now the mutual trade-offs
    flipped = {r.id for r in skyline(df, maximize=["y"], minimize=["x"]).collect()}
    assert flipped == {2, 4, 5}


def test_skyline_ties_survive_and_exact_across_partitions(spark):
    from opentelemetry_collector_components_spark.operators.skyline import (
        skyline,
    )

    # two identical optimal points: neither dominates -> both kept
    rows = [(1, 9, 9), (2, 9, 9), (3, 1, 1)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r.id for r in skyline(df, maximize=["x", "y"]).collect()}
    assert got == {1, 2}

    # anti-correlated staircase split over many partitions: every point
    # is on the frontier and the two-phase prune must lose none
    stair = [(i, i, 100 - i) for i in range(100)]
    sdf = spark.createDataFrame(stair, "id long, x long, y long").repartition(8)
    out = skyline(sdf, maximize=["x", "y"]).count()
    assert out == 100
    # and a dominated grid interior vanishes entirely
    grid = stair + [(1000 + i, i // 2, (100 - i) // 2) for i in range(4, 100)]
    gdf = spark.createDataFrame(grid, "id long, x long, y long").repartition(8)
    assert {r.id for r in skyline(gdf, maximize=["x", "y"]).collect()} == set(
        range(100)
    )


def test_skyline_validation(spark):
    from opentelemetry_collector_components_spark.operators.skyline import (
        skyline,
    )

    df = spark.createDataFrame([(1, 2, None)], "id long, x long, y long")
    with pytest.raises(ValueError):
        skyline(df, maximize=["x"], minimize=["y"])  # NULL criterion
    with pytest.raises(ValueError):
        skyline(df)  # no criteria
    with pytest.raises(ValueError):
        skyline(df, maximize=["x"], minimize=["x"])  # duplicate
    # NaN is just as incomparable as NULL — and under Spark's
    # NaN-sorts-largest semantics it would otherwise dominate and
    # silently delete the whole real frontier
    ndf = spark.createDataFrame(
        [(1, float("nan")), (2, 5.0)], "id long, x double"
    )
    with pytest.raises(ValueError):
        skyline(ndf, maximize=["x"])


def test_skyline_int64_past_float53_and_nan_free_floats(spark):
    from opentelemetry_collector_components_spark.operators.skyline import (
        skyline,
    )

    # 2^53 and 2^53+1 collide in float64; both rows are true frontier
    # points and the native-dtype phase-1 compare must keep both
    big = 1 << 53
    rows = [(1, big, 5), (2, big + 1, 4)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r.id for r in skyline(df, maximize=["x", "y"]).collect()}
    assert got == {1, 2}
    # clean float criteria still work end-to-end
    fdf = spark.createDataFrame(
        [(1, 1.5, 0.1), (2, 2.5, 0.2), (3, 0.5, 0.9)],
        "id long, x double, y double",
    )
    assert {
        r.id for r in skyline(fdf, maximize=["x"], minimize=["y"]).collect()
    } == {1, 2}
