"""Exact distinct-count per event-time window on a stream.

Spark rejects ``count_distinct`` inside a streaming aggregate — the
aggregation state would have to hold the full id set per group.  The
composable exact form chains TWO stateful operators:

1. ``dropDuplicates`` over ``(window, group..., id)`` — state is one row
   per distinct id per open window, the unavoidable information cost of
   an exact answer (an approximate answer at bounded state is
   ``approx_count_distinct``, which the cardinality router already uses:
   ``operators/route.py``);
2. a plain windowed ``count`` over the survivor stream — each id now
   contributes exactly once per window.

With a watermark, both states evict once the watermark passes the
window end (pass the event-time column through — eviction keys off it);
without one (bounded replays / backfills) dedup state grows with the
number of distinct ids, which is exactly the exact-answer floor.

Reference analog: the collector's cardinality tracking
(`connector/signaltometricsconnector` unique-dimension counting) makes
the same exact-vs-sketch trade; there it picks the sketch, and so does
``route_with_cardinality`` — this operator is the exact twin for audits
and backfills where the true count is the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_distinct_count(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    id_col: str = "user_id",
    group_cols: tuple[str, ...] = ("event_type",),
    watermark_delay: str | None = None,
) -> DataFrame:
    """Distinct ``id_col`` count per (event-time window, ``group_cols``).
    Exact — stream output equals the batch ``count_distinct`` over the
    same input (the gate condition).  See module docstring for the
    state-size trade and when to prefer the HLL sketch instead."""
    base = stream_df
    if watermark_delay is not None:
        base = base.withWatermark(ts_col, watermark_delay)
    w = F.window(ts_col, window).alias("_w")
    dedup = base.select(w, *group_cols, id_col).dropDuplicates()
    return dedup.groupBy("_w", *group_cols).agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
