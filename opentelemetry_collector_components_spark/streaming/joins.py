"""Stream-stream event-time interval join.

The reference pipeline correlates signals batch-side (spanmetrics-style
connectors); a Spark-first engine gets the streaming analog for free
from Structured Streaming's stream-stream join: two unbounded inputs,
each watermarked, joined on a key plus an event-time range.  The range
condition is what makes the state BOUNDED — Spark keeps a left row only
until the watermark passes ``left_ts + upper`` (no range => state grows
forever), so at 100 TB/day the per-executor state is (join-window x
input rate), not history.

Inner join rows are emitted as soon as both sides arrive (append mode);
the watermark only bounds state retention, it does not delay inner-join
output — so availableNow replay of a finite input produces exactly the
batch join's rows, which is the oracle contract the gate pins.

Replay-equality caveat: that equality is unconditional only when the
replay runs as a single micro-batch (one file source, no
maxFilesPerTrigger).  Split the replay into multiple batches and the
watermark advances BETWEEN batches — a row arriving more than
``watermark`` of event time after the other side's maximum is evicted
from state before its match shows up, exactly as it would be on a live
unbounded stream.  Size ``watermark`` to the worst cross-input event-
time disorder you must tolerate; that is its production meaning, not a
formality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    upper: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join two streams on ``key_cols`` where ``right_ts`` falls in
    (left_ts, left_ts + upper].  ``upper`` is a SQL interval string like
    ``'30 minutes'``.  Column names must be disjoint apart from the key
    columns — prefix/rename upstream (the usual stream-stream hygiene).

    The strict lower bound (>) keeps the pairing causal: a right event
    at exactly the left timestamp is NOT a response to it.  Both sides
    get the same watermark delay; the join tolerates inputs that lag
    each other by up to that much event time."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    overlap = (set(left.columns) & set(right.columns)) - set(key_cols)
    if overlap:
        raise ValueError(
            f"non-key columns appear on both sides: {sorted(overlap)} — "
            "rename before joining"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = None
    for k in key_cols:
        c = lw[k] == rw[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (F.col(right_ts) > F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    joined = lw.join(rw, cond, "inner")
    # drop the duplicated key columns from the right side
    return joined.drop(*[rw[k] for k in key_cols])
