"""Streaming fan-out sink — the ES-exporter data-stream routing, streaming.

Batch mode fans out with one ``partitionBy(route)`` write
(plans/sinks.py).  In streaming, the same semantics land on
``foreachBatch``: each micro-batch is routed once and written per sink,
with a lineage row per (batch, sink).  Exactly-once: foreachBatch is
at-least-once, so both sinks partition by batch_id and dynamically
overwrite their own partitions on replay.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_fanout(
    routed_stream: DataFrame,
    base_dir: str,
    checkpoint_dir: str,
    route_col: str = "sink",
):
    """Start a foreachBatch query writing each micro-batch partitioned by
    the route column, plus per-batch lineage rows."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # idempotent per batch: both sinks partition on the batch id and
        # use DYNAMIC overwrite, so a micro-batch replayed after a crash
        # (foreachBatch is at-least-once) rewrites its own partitions
        # instead of appending duplicates.  persist: the batch feeds two
        # actions — without it the source files are scanned twice.
        batch_df = batch_df.persist()
        try:
            out = os.path.join(base_dir, "stream_fanout")
            (
                batch_df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id", route_col)
                .parquet(out)
            )
            lineage = batch_df.groupBy(route_col).agg(
                F.count(F.lit(1)).alias("rows_out"),
                F.lit(batch_id).alias("batch_id"),
            )
            (
                lineage.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(os.path.join(base_dir, "stream_lineage"))
            )
        finally:
            batch_df.unpersist()

    return (
        routed_stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
