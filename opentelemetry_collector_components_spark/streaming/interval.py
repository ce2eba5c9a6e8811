"""Streaming interval aggregation — the true lsminterval analog.

The reference is a push-based streaming system: datapoints buffer in pebble
and matured intervals flush on a wall-clock timer
(processor/lsmintervalprocessor/processor.go:181-208).  Structured Streaming
gives the same contract declaratively:

- pebble buffer + merge operator  -> state store + windowed hash aggregate
- timer flush of matured windows  -> watermark + append output mode
- WAL/commit batch                -> checkpointLocation

``streaming_interval_agg`` works on any streaming DataFrame with an event
timestamp; tests feed it a file/memory source of the same pages rows the
batch path uses and assert batch/stream result equality.

The reference keys state by PROCESSING time (arrival), not event time
(SURVEY.md §2.8) — we improve on it with event-time windows + watermark,
which is the Spark-native (and strictly more useful) semantic; the
equivalence test pins behavior on in-order data where both agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_agg(
    stream: DataFrame,
    keys: list[str],
    time_col: str = "warc_ts",
    interval: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Windowed count/sum aggregate with late-data watermark.

    Output append-mode rows appear once a window falls behind the watermark
    — the "matured interval harvest" analog.
    """
    win = F.window(F.col(time_col), interval)
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(win.alias("_w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("dur_us").alias("dur_us_sum"),
            F.sum("success_count").alias("success_count"),
            F.sum("failure_count").alias("failure_count"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            *keys,
            "docs",
            "dur_us_sum",
            "success_count",
            "failure_count",
        )
    )


def run_stream_to_memory(
    stream_agg: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    mode: str = "append",
):
    """Start the query against the in-memory sink (tests/bench harness)."""
    return (
        stream_agg.writeStream.outputMode(mode)
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
