"""Streaming event-time lateness maintenance — the stateful twin of
``operators.lateness.lateness_events``.

A live pipeline wants the lateness audit CONTINUOUSLY (is disorder
growing? did a relay start buffering?), not as a batch replay.  The
state per key is ONE BIGINT — the event-time frontier (max event
seconds seen) — folded across micro-batches with
``applyInPandasWithState``; each batch's rows score against the
frontier-so-far exactly as the batch twin's exclusive prefix max does,
so stream output over in-order arrival equals ``lateness_events`` row
for row (pinned in tests/test_streaming_lateness.py).

Contract: arrival order within a key must be non-decreasing ACROSS
micro-batches (the source-offset order a log stream naturally has);
within a batch rows are sorted by (arrival, event_sec) before folding —
the same total order the batch twin uses.  A cross-batch arrival
regression raises (frontier state cannot be rewound).

Scale shape: per-key state is O(1); per-batch work is the batch's rows
(numpy cummax, no Python row loop).  A hot key serializes on one task
per batch — same property as the token bucket, same key-sharding
mitigation if it ever binds (lateness per shard is exact since the
frontier of a shard lower-bounds the key's; shares then merge by max).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("frontier", LongType()),
        StructField("arr_last", LongType()),
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("arrival", LongType()),
        StructField("event_sec", LongType()),
        StructField("late_s", LongType()),
    ]
)


def lateness_stateful(
    stream: DataFrame,
    key_col: str,
    arrival_col: str,
    event_sec_col: str,
) -> DataFrame:
    """Per-event lateness across micro-batches.  Input columns:
    ``key_col`` (string), ``arrival_col`` (monotone BIGINT per key
    across batches), ``event_sec_col`` (epoch seconds BIGINT).  Output:
    (key, arrival, event_sec, late_s) in update mode."""

    def fold(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        frontier, arr_last = state.get if state.exists else (None, None)
        chunks = list(pdfs)
        whole = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if not len(whole):
            if state.exists:
                state.update((frontier, arr_last))
            return
        whole = whole.sort_values(
            [arrival_col, event_sec_col]
        ).reset_index(drop=True)
        if arr_last is not None and int(whole[arrival_col].iloc[0]) < arr_last:
            raise ValueError(
                "lateness_stateful: arrival order regressed across batches "
                f"for key {key!r} — state cannot be rewound"
            )
        secs = whole[event_sec_col].astype("int64")
        # frontier BEFORE each row = running max shifted by one, seeded
        # with the cross-batch state
        seed = frontier if frontier is not None else int(secs.iloc[0])
        prev = secs.cummax().shift(1)
        prev.iloc[0] = seed
        prev = prev.astype("int64").clip(lower=seed)
        late = (prev - secs).clip(lower=0)
        if frontier is None:
            late.iloc[0] = 0
        out = pd.DataFrame(
            {
                "key": key[0],
                "arrival": whole[arrival_col].astype("int64"),
                "event_sec": secs,
                "late_s": late.astype("int64"),
            }
        )
        state.update(
            (
                max(int(secs.max()), seed),
                int(whole[arrival_col].iloc[-1]),
            )
        )
        yield out

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
