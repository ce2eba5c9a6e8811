"""Generic touched-partition MERGE sink for streaming partial tables.

Three streaming surfaces in this repo maintain the same shape — a
partitioned parquet table of MERGEABLE partials kept current from a
stream (update-mode interval rollup, HLL sketch rows, decayed trending
counters) — and the sink discipline is identical every time:

1. reduce the micro-batch to partial rows (``partial_fn``),
2. read back ONLY the partitions those rows touch (partition pruning),
3. re-merge existing ∪ fresh with the partials' own associative merge
   (``merge_fn``),
4. dynamic-partition-overwrite just the touched partitions.

``streaming_merge_partials`` is that discipline once, parameterized by
the two frame functions, so per-batch sink cost is always bounded by the
batch's touched partitions — never total accumulated state, never raw
history.  ``merge_fn`` must be idempotent aggregation over the partial
rows (a groupBy that re-applying to already-merged rows leaves fixed):
hll_union_agg, sum of decayed scores at a shared anchor, sums of counts.

The merged frame is localCheckpoint-ed before the write because source
and destination are the same path — without materialization the
overwrite would corrupt its own lazy input (same reasoning as
streaming/interval.py::streaming_interval_rollup_update; on Iceberg this
closure collapses to MERGE INTO with a snapshot-atomic commit).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_merge_partials(
    stream: DataFrame,
    part_col: str,
    partial_fn: Callable[[DataFrame], DataFrame],
    merge_fn: Callable[[DataFrame], DataFrame],
    partials_path: str,
    checkpoint_dir: str,
    query_name: str,
    stats: list | None = None,
):
    """Maintain ``merge_fn``-mergeable partials from a stream.

    ``partial_fn``: micro-batch rows -> partial rows (must include
    ``part_col``).  ``merge_fn``: partial rows -> merged partial rows
    (idempotent aggregation).  Returns the started availableNow query.
    """

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        fresh = partial_fn(batch_df).persist()
        touched = [r[0] for r in fresh.select(part_col).distinct().collect()]
        if not touched:
            fresh.unpersist()
            return
        try:
            existing = spark.read.parquet(partials_path).filter(
                F.col(part_col).isin(touched)
            )
            existing.schema  # force resolution; missing path raises here
        except AnalysisException:
            existing = None
        pool = (
            existing.unionByName(fresh.select(*existing.columns))
            if existing is not None
            else fresh
        )
        merged = merge_fn(pool).localCheckpoint()
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(part_col)
            .parquet(partials_path)
        )
        if stats is not None:
            stats.append(
                {
                    "batch_id": batch_id,
                    "partitions_touched": len(touched),
                    "rows_written": merged.count(),
                }
            )
        fresh.unpersist()

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(_merge)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
