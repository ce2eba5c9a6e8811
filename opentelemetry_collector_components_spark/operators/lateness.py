"""Event-time lateness profile — the watermark-choice audit.

Every streaming job in this repo that windows on event time
(``streaming/interval.py``, ``streaming/sessions.py``, ...) needs a
watermark, and the watermark is a BET: too tight drops late events, too
loose holds state forever.  This operator measures the bet's odds from
the data: replay each key's arrival order, track the event-time
frontier (running max of event timestamps seen so far), and score every
event by how far BEHIND the frontier it arrived —

    lateness_i = max(0, frontier_before_i - ts_i)   seconds

The per-key profile (count late, max, exact nearest-rank p95/p99) is
precisely "what watermark would have admitted 95%/99% of this traffic".
The reference pipeline faces the same disorder (its interval processor
buffers by event time while ingest arrives in wall-clock order); here
the audit is a first-class batch operator.

Exactness: timestamps floor to epoch seconds (BIGINT); the frontier is
a running-max window; the percentiles are nearest-rank order statistics
(value at rank ceil(q*n) of lateness ascending — tie order among equal
lateness values cannot change the value at any rank).  Everything is
engine-replayable integers.

Scale shape: two key-partitioned sorts (arrival order for the frontier,
lateness order for the ranks) and one partial-aggregated groupBy —
no unpartitioned stage, nothing beyond the per-key series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def lateness_events(
    df: DataFrame,
    key_cols: list[str],
    arrival_col: str,
    event_ts_col: str,
) -> DataFrame:
    """Per-EVENT lateness vs the key's event-time frontier — the row
    form ``lateness_profile`` aggregates and the batch twin of
    ``streaming.lateness.lateness_stateful`` (same frontier definition:
    exclusive prefix max under the total (arrival, ts) order).  Output:
    the input columns plus ``event_sec`` (epoch seconds BIGINT) and
    ``late_s`` (BIGINT >= 0, 0 for each key's first event)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    ts = F.col(event_ts_col).cast("timestamp")
    secs = F.unix_timestamp(ts)
    warr = Window.partitionBy(*key_cols).orderBy(
        F.col(arrival_col).asc(), secs.asc()
    )
    frontier = F.max(secs).over(warr.rowsBetween(Window.unboundedPreceding, -1))
    return df.withColumn("event_sec", secs.cast("long")).withColumn(
        "late_s",
        F.coalesce(
            F.greatest(
                F.lit(0).cast("long"), (frontier - secs).cast("long")
            ),
            F.lit(0).cast("long"),
        ),
    )


def lateness_profile(
    df: DataFrame,
    key_cols: list[str],
    arrival_col: str,
    event_ts_col: str,
) -> DataFrame:
    """Per-key event-time disorder profile.

    ``arrival_col`` must give the observed ingest order within each key
    (an ingest offset, a monotone event id, a kafka offset); ties in
    arrival order are frontier-order-independent because the frontier
    uses the EXCLUSIVE prefix max (rowsBetween unboundedPreceding, -1)
    under a total (arrival, ts) order, pinned deterministic.

    Output: (*key_cols, n BIGINT, n_late BIGINT, late_ppm BIGINT,
    max_late_s BIGINT, p95_late_s BIGINT, p99_late_s BIGINT) — late_ppm
    is exact integer parts-per-million; p95/p99 are the nearest-rank
    order statistics, i.e. the watermark that would have admitted that
    share of events.  Keys with a single event report zeros.
    """
    staged = lateness_events(df, key_cols, arrival_col, event_ts_col).withColumn(
        "_late", F.col("late_s")
    )
    wrank = Window.partitionBy(*key_cols).orderBy(F.col("_late").asc())
    full = wrank.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = staged.withColumn("_rn", F.row_number().over(wrank).cast("long")
    ).withColumn("_n", F.count(F.lit(1)).over(full))
    p95 = F.expr("(_n * 95 + 99) div 100")
    p99 = F.expr("(_n * 99 + 99) div 100")
    return (
        ranked.groupBy(*key_cols)
        .agg(
            F.max("_n").cast("long").alias("n"),
            F.sum(F.when(F.col("_late") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_late"),
            F.max("_late").cast("long").alias("max_late_s"),
            F.max(F.when(F.col("_rn") == p95, F.col("_late")))
            .cast("long")
            .alias("p95_late_s"),
            F.max(F.when(F.col("_rn") == p99, F.col("_late")))
            .cast("long")
            .alias("p99_late_s"),
        )
        .select(
            *key_cols,
            "n",
            "n_late",
            F.expr("n_late * 1000000 div n").cast("long").alias("late_ppm"),
            "max_late_s",
            "p95_late_s",
            "p99_late_s",
        )
    )
