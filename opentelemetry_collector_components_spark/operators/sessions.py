"""Sessionization: split per-key event streams into gap-bounded sessions.

The classic log-analytics operator over the parse -> enrich stream: a new
session starts when the gap since the key's previous event exceeds the
threshold.  Expressed as the standard two-window composition — lag() to
measure the gap, a running sum of session-start flags to number sessions —
both inside whole-stage codegen, one shuffle on the key.

Scale shape: windows partition by key, so cost is linear per key and keys
parallelize; a single pathological key (one user with a billion events)
serializes its partition — the same caveat as every per-key ordered scan
in this package, with the same mitigation (split that key by coarse time
range and stitch boundary sessions).  Session *stats* add one
partial-aggregated groupBy on (key, session) — combiner-friendly, skew
bounded by events-per-session.

Reference parity: the collector has no sessionizer (it forwards points);
this is part of the beyond-the-reference analytics surface the engine
exists for, next to the lsminterval rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap: str = "30 minutes",
    order_col: str | None = None,
) -> DataFrame:
    """Adds ``session_id`` (0-based per key, in time order) and
    ``is_session_start``.  ``order_col`` breaks exact-timestamp ties
    deterministically (defaults to the timestamp alone; pass an event id
    when sub-second collisions matter)."""
    order = [F.col(ts_col).asc()] + (
        [F.col(order_col).asc()] if order_col else []
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    gap_us = F.lit(_gap_micros(gap))
    prev = F.lag(F.unix_micros(F.col(ts_col).cast("timestamp"))).over(w)
    started = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col).cast("timestamp")) - prev) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    out = df.withColumn("is_session_start", started.cast("boolean"))
    run = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return out.withColumn(
        "session_id",
        (F.sum(F.col("is_session_start").cast("long")).over(run) - 1).cast("long"),
    )


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap: str = "30 minutes",
    order_col: str | None = None,
) -> DataFrame:
    """One row per (key, session): start/end, event count, duration."""
    s = sessionize(df, key_cols, ts_col, gap, order_col)
    return s.groupBy(*key_cols, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (
            F.unix_micros(F.max(ts_col).cast("timestamp"))
            - F.unix_micros(F.min(ts_col).cast("timestamp"))
        ).alias("duration_us"),
    )


def _gap_micros(gap: str) -> int:
    qty, unit = gap.split()
    per = {
        "second": 1_000_000, "seconds": 1_000_000,
        "minute": 60_000_000, "minutes": 60_000_000,
        "hour": 3_600_000_000, "hours": 3_600_000_000,
    }
    if unit not in per:
        raise ValueError(f"unsupported gap unit {unit!r}")
    return int(qty) * per[unit]
