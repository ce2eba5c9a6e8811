"""Streaming exactly-once projection of an at-least-once event stream.

Every collector delivery path in the reference is at-least-once (the
exporter retry queues re-send on ack timeout; akamaisiem resumes from the
last checkpointed cursor and may replay the tail — see
`receiver/akamaisiemreceiver/receiver.go` checkpoint handling), so the
downstream store sees duplicate records and is expected to suppress them
by id.  In Spark the suppression is a first-class stateful streaming
operator rather than a sink concern:

- ``dedup_stream(df, keys)``: ``dropDuplicates`` over the key columns —
  state holds every key ever seen (exact, unbounded; right for bounded
  replays/backfills).
- ``dedup_stream(df, keys, watermark_col=..., delay=...)``:
  ``dropDuplicatesWithinWatermark`` — state is evicted once the
  watermark passes a key's event time + delay, so memory is bounded by
  the key arrival rate x the delay window.  A replay arriving LATER than
  the delay is emitted again — the documented trade: pick ``delay``
  larger than the maximum redelivery lag (retry-queue TTL).

Both forms keep the stream append-mode (no aggregation), so any
downstream windowed aggregate still gets exactly-once inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream_df: DataFrame,
    key_cols: list[str],
    watermark_col: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """First occurrence per key; see module docstring for the state-size
    trade between the exact and watermarked forms."""
    if watermark_col is not None:
        return stream_df.withWatermark(
            watermark_col, delay
        ).dropDuplicatesWithinWatermark(key_cols)
    return stream_df.dropDuplicates(key_cols)
