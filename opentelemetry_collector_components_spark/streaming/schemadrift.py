"""Streaming observed-schema maintenance: payload drift from a stream.

The streaming twin of ``operators/jsonprofile.py``: each micro-batch
profiles ITS OWN rows into (day, path, jtype, n) partial counts and
MERGEs them into the touched day partitions of a partials table — the
update-rollup discipline factored in ``mergesink.streaming_merge_partials``
(counts are associative, so partial + existing re-aggregates exactly).
Raw payloads are never retained; the maintained grid is tiny (days x
paths x types) and ``read_schema_drift`` derives first-seen novelty
flags from it at read time, so "what key shipped today" is queryable
continuously without rescanning any events.

Per-batch sink writes are bounded by the batch's touched days (asserted
in tests via the ``stats`` hook), not by total state — the property
that keeps an unbounded stream's maintenance cost flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_schema_profile(
    stream: DataFrame,
    json_col: str,
    day_col: str,
    partials_path: str,
    checkpoint_dir: str,
    max_depth: int = 2,
    query_name: str = "stream_schema_profile",
    stats: list | None = None,
):
    """Maintain the (day, path, jtype, n) grid from a stream; returns
    the started availableNow query."""
    from ..operators.jsonprofile import json_schema_profile
    from .mergesink import streaming_merge_partials

    return streaming_merge_partials(
        stream,
        part_col=day_col,
        partial_fn=lambda b: json_schema_profile(
            b, json_col, group_cols=[day_col], max_depth=max_depth
        ),
        merge_fn=lambda pool: pool.groupBy(day_col, "path", "jtype").agg(
            F.sum("n").alias("n")
        ),
        partials_path=partials_path,
        checkpoint_dir=checkpoint_dir,
        query_name=query_name,
        stats=stats,
    )


def read_schema_drift(spark, partials_path: str, day_col: str) -> DataFrame:
    """Current drift view of the maintained grid: per-row ``is_new``
    first-seen flags (jsonprofile.schema_novelty over the tiny grid)."""
    from ..operators.jsonprofile import schema_novelty

    return schema_novelty(spark.read.parquet(partials_path), day_col)
