"""Streaming maintenance of decayed trending counters.

The third instantiation of the touched-partition MERGE discipline
(streaming/mergesink.py): each micro-batch folds its rows into per-key
partial scores anchored at their own interval end, and partials at the
SAME anchor are additive (decay is memoryless), so the maintained table
answers "what is trending as of now" via ``operators/trending.py::
merge_decayed`` — one multiply per partial row, raw events never
retained.  Anchoring at interval boundaries (default: day end) keeps the
partition count bounded and the re-anchor factor shared per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .mergesink import streaming_merge_partials


def streaming_decayed_partials(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    half_life_s: int,
    partials_path: str,
    checkpoint_dir: str,
    anchor_interval_s: int = 86400,
    query_name: str = "stream_decayed_partials",
    stats: list | None = None,
):
    """Maintain ``(anchor_s, key..., score)`` partials from a stream.

    ``anchor_s`` = the event's interval END (next boundary), so every
    weight exponent is non-negative; partials merge by summation at the
    shared anchor.  Scores round to 4 dp at the partial level (the repo's
    oracle convention) — multi-batch drains can drift by ≤1e-4 per merge,
    which tests bound explicitly.
    """
    if half_life_s < 1 or anchor_interval_s < 1:
        raise ValueError("half_life_s and anchor_interval_s must be >= 1")

    def partial_fn(batch: DataFrame) -> DataFrame:
        sec = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
        anchor = (
            (F.floor(sec / anchor_interval_s) + 1).cast("long")
            * anchor_interval_s
        )
        w = F.pow(
            F.lit(0.5),
            (anchor - sec).cast("double") / F.lit(float(half_life_s)),
        )
        return (
            batch.withColumn("anchor_s", anchor)
            .groupBy("anchor_s", *key_cols)
            .agg(F.round(F.sum(w), 4).alias("score"))
        )

    return streaming_merge_partials(
        stream,
        part_col="anchor_s",
        partial_fn=partial_fn,
        merge_fn=lambda pool: pool.groupBy("anchor_s", *key_cols).agg(
            F.round(F.sum("score"), 4).alias("score")
        ),
        partials_path=partials_path,
        checkpoint_dir=checkpoint_dir,
        query_name=query_name,
        stats=stats,
    )


def read_trending(
    spark,
    partials_path: str,
    key_cols: list[str],
    now_epoch_s: int,
    half_life_s: int,
) -> DataFrame:
    """Current trending scores from the maintained partials: one
    re-anchoring merge over |anchors|·|keys| partial rows."""
    from ..operators.trending import merge_decayed

    return merge_decayed(
        spark.read.parquet(partials_path),
        key_cols,
        now_epoch_s,
        half_life_s,
    )
