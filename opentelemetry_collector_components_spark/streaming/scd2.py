"""Streaming SCD2 — dimension history maintained across micro-batches.

The streaming half of ``operators/asof.py::scd2_from_changes``: the
entityanalytics incremental-sync shape (S6) where a change log arrives
continuously and the type-2 history must stay current without re-reading
the full log.  Per-key state in the store (RocksDB provider in
production) carries the OPEN version — its attribute snapshot, version
number, and valid_from — and each micro-batch folds its changes in:

- unchanged re-emitted snapshots compact away (null-safe compare against
  the open version, the full-state-sync heartbeat case);
- a changed snapshot CLOSES the open version — the closed row is what
  the operator EMITS, with its half-open ``[valid_from, valid_to)`` and
  version number — and opens the next one in state.

Emission contract: closed versions only.  The open version is future-
mutable, so a correct stream can't emit it until it closes; batch
equivalence is therefore against ``scd2_from_changes(...).where
("valid_to IS NOT NULL")`` — pinned by the gate and tests, including
cross-batch compaction (a version that opens in batch k and closes in
batch k+2 emits exactly once, with the right version number).

Attribute snapshots ride the state store as a canonical JSON string
(sorted keys), keeping the operator generic over attr schemas; NULL
attribute values are faithful state (JSON null), matching the batch
operator's eqNullSafe rule.  Out-of-order arrivals ACROSS batches raise
(``ts`` regressed vs the open version) — SCD2 history cannot be patched
retroactively in update mode; the batch operator is the replay tool.
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("snapshot_json", StringType()),
        StructField("version", IntegerType()),
        StructField("valid_from_us", LongType()),
    ]
)


def _out_schema(key_cols: list[str], attrs: list[str]) -> StructType:
    return StructType(
        [StructField(k, StringType()) for k in key_cols]
        + [StructField(a, StringType()) for a in attrs]
        + [
            StructField("valid_from", TimestampType()),
            StructField("valid_to", TimestampType()),
            StructField("version", IntegerType()),
        ]
    )


def scd2_stream(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    attrs: list[str] | None = None,
    query_name: str = "scd2_stream",
) -> DataFrame:
    """``changes`` (streaming; string keys/attrs + ``ts_col``) → closed
    SCD2 versions, stateful per key across micro-batches."""
    attrs = attrs or [
        c for c in changes.columns if c not in set(key_cols) | {ts_col}
    ]
    out_schema = _out_schema(key_cols, attrs)
    n_keys = len(key_cols)

    def fold(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            snap_json, version, from_us = state.get
            snap = json.loads(snap_json)
        else:
            snap, version, from_us = None, 0, None
        chunks = list(pdfs)
        whole = (
            pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        )
        rows: list[dict] = []
        if len(whole):
            whole = whole.sort_values(ts_col).reset_index(drop=True)
            ts_us_col = whole[ts_col].astype("int64") // 1000
            for i in range(len(whole)):
                t_us = int(ts_us_col.iloc[i])
                cur = {
                    a: (None if pd.isna(whole[a].iloc[i]) else str(whole[a].iloc[i]))
                    for a in attrs
                }
                if from_us is not None and t_us < from_us:
                    raise ValueError(
                        f"out-of-order change for key {key}: ts regressed"
                        " across batches (replay with the batch operator)"
                    )
                if snap is not None and cur == snap:
                    continue  # re-emitted unchanged snapshot: compact
                if snap is not None:
                    rows.append(
                        {
                            **dict(zip(key_cols, key[:n_keys])),
                            **snap,
                            "valid_from": pd.Timestamp(from_us, unit="us"),
                            "valid_to": pd.Timestamp(t_us, unit="us"),
                            "version": version,
                        }
                    )
                snap, version, from_us = cur, version + 1, t_us
        if snap is not None:
            state.update(
                (json.dumps(snap, sort_keys=True), version, from_us)
            )
        yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return changes.groupBy(*key_cols).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
