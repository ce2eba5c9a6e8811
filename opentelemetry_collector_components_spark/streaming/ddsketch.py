"""Streaming DDSketch maintenance: latency quantiles from a stream.

The p95/p99 twin of ``streaming/sketches.py`` (HLL distinct): each
micro-batch sketches ITS OWN rows into (day, bucket, n) DDSketch rows
and MERGEs them into touched day partitions (bucket counts are plain
sums — exactly associative, the mergeability DDSketch was designed
for).  Raw latencies are never retained; per-day AND coarser (weekly /
global) quantiles come from ``operators/sketches.ddsketch_merge`` +
``ddsketch_quantiles`` over the tiny maintained grid at read time,
with the same alpha relative-error guarantee as the batch sketch —
merging loses nothing.

Per-batch sink writes are bounded by touched partitions' bucket rows
(asserted via the ``stats`` hook in tests), not by total state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_ddsketch(
    stream: DataFrame,
    part_col: str,
    value_col: str,
    partials_path: str,
    checkpoint_dir: str,
    alpha: float = 0.01,
    query_name: str = "stream_ddsketch",
    stats: list | None = None,
):
    """Maintain a ``(part, bucket, n)`` DDSketch table from a stream;
    returns the started availableNow query."""
    from ..operators.sketches import ddsketch_build, ddsketch_merge
    from .mergesink import streaming_merge_partials

    return streaming_merge_partials(
        stream,
        part_col=part_col,
        partial_fn=lambda b: ddsketch_build(
            b, [part_col], value_col, alpha=alpha
        ),
        merge_fn=lambda pool: ddsketch_merge(pool, [part_col]),
        partials_path=partials_path,
        checkpoint_dir=checkpoint_dir,
        query_name=query_name,
        stats=stats,
    )


def read_ddsketch_quantiles(
    spark,
    partials_path: str,
    key_cols: list[str],
    qs: list[float],
    alpha: float = 0.01,
) -> DataFrame:
    """Quantile estimates from the maintained sketch table — per
    maintained key, or any coarser grouping via ``ddsketch_merge`` on
    the same rows (pass the coarser ``key_cols``)."""
    from ..operators.sketches import ddsketch_merge, ddsketch_quantiles

    rows = ddsketch_merge(spark.read.parquet(partials_path), key_cols)
    return ddsketch_quantiles(rows, key_cols, qs, alpha=alpha)
