"""Exponentially-decayed trending scores: weight math, merge==direct
re-anchoring, skew-proof top-k."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.trending import (
    decay_weight,
    decayed_scores,
    merge_decayed,
    trending_topk,
)

T0 = datetime(2024, 3, 1, 0, 0, 0)
T0_EPOCH = 1709251200
HL = 3600


def _events(spark):
    rows = []
    # "old" path: 8 hits exactly 2 half-lives ago -> score 8 * 0.25 = 2
    rows += [("old", T0 - timedelta(seconds=2 * HL))] * 8
    # "hot" path: 4 hits now -> score 4
    rows += [("hot", T0)] * 4
    # "mixed": 2 now + 4 one half-life ago -> 2 + 2 = 4
    rows += [("mixed", T0)] * 2 + [("mixed", T0 - timedelta(seconds=HL))] * 4
    return spark.createDataFrame(rows, "path string, ts timestamp")


def test_decay_weight_boundaries(spark):
    df = spark.createDataFrame(
        [(T0,), (T0 - timedelta(seconds=HL),), (T0 + timedelta(seconds=999),)],
        "ts timestamp",
    )
    got = df.select(
        F.round(decay_weight(F.col("ts"), T0_EPOCH, HL), 6).alias("w")
    ).collect()
    assert [r.w for r in got] == [1.0, 0.5, 1.0]  # future clamps to 1


def test_decayed_scores_exact(spark):
    got = {
        r.path: (r.score, r.n)
        for r in decayed_scores(
            _events(spark), ["path"], "ts", T0_EPOCH, HL
        ).collect()
    }
    assert got == {"old": (2.0, 8), "hot": (4.0, 4), "mixed": (4.0, 6)}
    with pytest.raises(ValueError):
        decayed_scores(_events(spark), ["path"], "ts", T0_EPOCH, 0)


def test_merge_reanchors_to_direct_scores(spark):
    ev = _events(spark).withColumn("day", F.to_date("ts"))
    anchor = (
        F.floor(F.unix_timestamp(F.col("day").cast("timestamp"))).cast("long")
        + 86400
    )
    daily = (
        ev.withColumn("anchor_s", anchor)
        .groupBy("path", "anchor_s")
        .agg(
            F.sum(
                F.pow(
                    F.lit(0.5),
                    (F.col("anchor_s") - F.floor(F.unix_timestamp("ts")))
                    .cast("double")
                    / F.lit(float(HL)),
                )
            ).alias("score")
        )
    )
    merged = {
        r.path: r.score
        for r in merge_decayed(daily, ["path"], T0_EPOCH, HL).collect()
    }
    direct = {
        r.path: r.score
        for r in decayed_scores(_events(spark), ["path"], "ts", T0_EPOCH, HL).collect()
    }
    for p in direct:
        assert abs(merged[p] - direct[p]) < 1e-6, p


def test_topk_order_and_rank(spark):
    top = trending_topk(_events(spark), ["path"], "ts", T0_EPOCH, HL, k=2).collect()
    # hot and mixed tie at 4.0; tie broken by path name ascending
    assert [(r.path, r.rank) for r in sorted(top, key=lambda r: r.rank)] == [
        ("hot", 1),
        ("mixed", 2),
    ]


def test_plan_is_jvm_only(spark):
    plan = (
        decayed_scores(_events(spark), ["path"], "ts", T0_EPOCH, HL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
