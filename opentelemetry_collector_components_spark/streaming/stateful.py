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

import math
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


def statsd_gauge_stateful(
    decoded: DataFrame, order_col: str = "seq"
) -> DataFrame:
    """STREAMING gauge flush for the statsd intake
    (sources/statsd.py): the current gauge value lives in the state
    store across micro-batches — the statsd server's lifetime-gauge
    semantics, where every flush interval (here: micro-batch) reports
    the running value while counters/timers/sets reset each interval
    (those stay on the stateless per-batch ``statsd_flush``, e.g. via
    ``foreachBatch`` — only gauges need cross-batch memory).

    Fold per name, rows in ``order_col`` order: an absolute value
    replaces the gauge, a signed delta adjusts it; a gauge that has
    only ever seen deltas counts from 0.  Batch-sequential equivalence
    with ``statsd_flush``'s anchor fold is test-pinned: after batch k
    the emitted value equals the batch flush over all rows seen so
    far.  Emits one row per touched name per micro-batch (update
    mode): ``(name, n, n_total, flushed_milli)`` — ``n_total`` is the
    cumulative rows folded into this name's state, so a drained memory
    sink can pick the FINAL emission per name with max_by(flushed_milli,
    n_total).  Expects the decoder's
    ``name`` / ``value`` / ``is_delta`` / ``valid`` columns; a single
    hot gauge serializes on one state partition, same property (and
    same sharding mitigation) as the token bucket."""
    out_schema = StructType(
        [
            StructField("name", StringType()),
            StructField("n", LongType()),
            StructField("n_total", LongType()),
            StructField("flushed_milli", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("value", DoubleType()), StructField("n_total", LongType())]
    )

    def _fold(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        value, n_total = state.get if state.exists else (0.0, 0)
        whole = pd.concat(list(pdfs), ignore_index=True)
        n = len(whole)
        if n:
            whole = whole.sort_values(order_col)
            deltas = whole["is_delta"].to_numpy()
            vals = whole["value"].to_numpy()
            # vectorized anchor fold: value after the batch = (last
            # absolute, else carried state) + sum of deltas after it
            abs_idx = (~deltas).nonzero()[0]
            if len(abs_idx):
                anchor = abs_idx[-1]
                value = float(vals[anchor]) + float(vals[anchor + 1 :].sum())
            else:
                value += float(vals.sum())
        n_total += n
        state.update((float(value), int(n_total)))
        yield pd.DataFrame(
            {
                "name": [key[0]],
                "n": [n],
                "n_total": [n_total],
                # same half-up milli convention as statsd_flush's
                # floor(x*1000 + 0.5) (floor toward -inf, not truncation)
                "flushed_milli": [math.floor(value * 1000 + 0.5)],
            }
        )

    gauges = decoded.where(
        F.col("valid") & (F.col("mtype") == "g")
    ).select("name", order_col, "value", "is_delta")
    return gauges.groupBy("name").applyInPandasWithState(
        _fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
