"""Custom stateful streaming operator — the pebble merge-state analog.

The reference holds merged per-key state in an embedded LSM across batches
and folds each incoming datapoint with an associative merge
(lsmintervalprocessor/processor.go:116-135).  Structured Streaming's
``applyInPandasWithState`` is the same contract: per-key state the runtime
persists in the state store (RocksDB provider in production — itself an
LSM), fold logic in the operator.

``cumulative_latest_stateful`` implements the A3 cumulative merge
(replace-iff-strictly-newer, datapoints.go:65-79) as a streaming operator:
every micro-batch emits, per key, the current newest (ts, value) after
folding the batch into state.  Out-of-order rows arriving in LATER batches
are correctly ignored — the property the reference's fixture comments call
out (testdata/sum_delta/input.yaml).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("latest_ts", TimestampType()),
        StructField("latest_value", DoubleType()),
    ]
)
# ts carried as integer MICROSECONDS: float64 seconds at 2026 epochs only
# resolve ~240ns and round-trip to a latest_ts 1us off the winning event,
# breaking exact-equality joins against the input
STATE_SCHEMA = StructType(
    [StructField("ts_us", LongType()), StructField("value", DoubleType())]
)


def _fold(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        ts_us, value = state.get
    else:
        ts_us, value = None, None
    # vectorized batch-local fold: newest-ts wins; ties keep the earliest
    # arrival (strict > — datapoints.go:75).  After sorting by arrival seq,
    # idxmax returns the FIRST max-ts row, which is exactly the
    # tie-keeps-earlier rule, so one idxmax replaces the row loop.
    chunks = list(pdfs)
    whole = (
        pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
    )
    if len(whole):
        whole = whole.sort_values("seq").reset_index(drop=True)
        ts_arr = whole["ts"].astype("int64") // 1000
        i = int(ts_arr.idxmax())
        t = int(ts_arr.iloc[i])
        if ts_us is None or t > ts_us:
            ts_us, value = t, float(whole["value"].iloc[i])
    state.update((ts_us, value))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "latest_ts": [pd.Timestamp(ts_us, unit="us")],
            "latest_value": [value],
        }
    )


def cumulative_latest_stateful(stream: DataFrame, key_col: str = "key") -> DataFrame:
    """stream(key, ts, seq, value) -> per-key newest value, stateful across
    micro-batches."""
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
