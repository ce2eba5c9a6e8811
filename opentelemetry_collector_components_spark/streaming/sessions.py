"""Streaming sessionization: Spark's native ``session_window`` on a stream.

The streaming twin of ``operators/sessions.py`` (batch lag-gap windows)
and of the batch ``session_window_native`` gate.  Session state lives in
the state store and MERGES ACROSS MICRO-BATCHES: an event arriving in a
later batch within ``gap`` of an open session extends it (and can fuse
two previously-separate sessions) — semantics a per-batch batch job
cannot provide, and the reason stream == batch equality is the gate.

Boundary semantics are the empirically-pinned rule shared by every
session operator in this repo (tests/test_sessions.py): a session splits
strictly on ``delta > gap`` — an event at exactly ``last + gap`` extends.

Two production modes:

- ``watermark`` set (the scale mode): append output — a session emits
  exactly once, after the watermark passes its close; state is bounded by
  open sessions within the watermark horizon.  Late events beyond the
  watermark are dropped (the documented trade of every watermarked
  streaming aggregate here).
- ``watermark=None``: complete output for bounded drains
  (``availableNow`` replay, backfills, gates) — state holds all sessions,
  the final table equals the batch sessionization of the full input.

State sizing at 100 TB/day: rows in state = open sessions ~ active keys,
not events — each session row is a merged aggregate; the per-key hash
partitioning of the state store is the same shuffle the batch window
pays once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    stream: DataFrame,
    keys: list[str],
    time_col: str = "ts",
    gap: str = "4 hours",
    watermark: str | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Per-key session aggregate over a streaming DataFrame.

    Returns (window_start, window_end, *keys, n_events, *aggs) where
    ``window_end`` is ``last event ts + gap`` (Spark's session_window
    contract, matching the shared session oracle text).  Pass
    ``watermark`` for append-mode production topologies; leave None for
    complete-mode bounded drains.
    """
    if not keys:
        raise ValueError("keys must be non-empty (a global session is a window)")
    src = stream.withWatermark(time_col, watermark) if watermark else stream
    agg_cols = [F.count(F.lit(1)).cast("long").alias("n_events")]
    agg_cols += list(aggs or [])
    g = src.groupBy(
        F.session_window(F.col(time_col), gap).alias("_sw"), *keys
    ).agg(*agg_cols)
    measures = [c for c in g.columns if c != "_sw" and c not in keys]
    return g.select(
        F.col("_sw.start").alias("window_start"),
        F.col("_sw.end").alias("window_end"),
        *keys,
        *measures,
    )
