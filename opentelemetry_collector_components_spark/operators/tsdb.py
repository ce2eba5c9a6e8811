"""Per-series Gorilla chunk encode/decode over DataFrames.

The reference's lsminterval processor hands merged per-identity series to a
TSDS-style store; this module is that storage hop re-expressed Spark-first:
``encode_gorilla_chunks`` folds each series' (ts, value) stream into ONE
opaque ``binary`` chunk row (delta-of-delta + XOR, ``functions/gorilla.py``),
``decode_gorilla_chunks`` explodes chunks back to rows.

Scale shape: encode is a single ``groupBy(keys).applyInPandas`` — one
shuffle on the series identity (the same key the interval merge already
grouped on, so under the same upstream partitioning AQE elides the
exchange), and each task handles whole series with no cross-series state.
Chunks are bounded by ``max_samples`` (Gorilla's 2h block analog) so one
pathological series cannot produce an unbounded row: a series longer than
the cap emits multiple chunks keyed by ``chunk_seq``.  Decode is
``mapInPandas`` — embarrassingly parallel over chunk rows, no shuffle.
Python-side bit packing is Arrow-batched (never per-row Python UDFs);
the bit loop itself is inherent to the format, exactly as it is in every
TSDB's Go/C implementation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.gorilla import gorilla_decode, gorilla_encode


def encode_gorilla_chunks(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
    max_samples: int = 7200,
) -> DataFrame:
    """One binary Gorilla chunk per series (per key-tuple), samples sorted
    by timestamp (ties broken by value bits for determinism).  ``ts_col``
    must be an integral epoch column (ms by convention); convert timestamps
    with ``F.unix_millis`` before calling.  Output columns: keys +
    ``chunk_seq`` + ``n`` + ``chunk`` + ``enc_bytes`` + ``raw_bytes``."""
    if max_samples < 1:
        raise ValueError("max_samples must be >= 1")
    key_fields = [df.schema[k] for k in key_cols]
    out_schema = T.StructType(
        list(key_fields)
        + [
            T.StructField("chunk_seq", T.IntegerType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("chunk", T.BinaryType()),
            T.StructField("enc_bytes", T.IntegerType()),
            T.StructField("raw_bytes", T.IntegerType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        # tie-break duplicate timestamps on the value's BIT pattern, not the
        # float (0.0 == -0.0 and NaN ordering would leave chunk bytes
        # dependent on incoming row order)
        pdf = pdf.assign(
            _bits=pdf[value_col].astype("float64").to_numpy().view("uint64")
        ).sort_values([ts_col, "_bits"], kind="mergesort")
        ts = pdf[ts_col].astype("int64").to_numpy()
        vals = pdf[value_col].astype("float64").to_numpy()
        keys = {k: pdf[k].iloc[0] for k in key_cols}
        rows = []
        for seq, start in enumerate(range(0, len(ts), max_samples)):
            t_slice = ts[start : start + max_samples].tolist()
            v_slice = vals[start : start + max_samples].tolist()
            chunk = gorilla_encode(t_slice, v_slice)
            rows.append(
                {
                    **keys,
                    "chunk_seq": seq,
                    "n": len(t_slice),
                    "chunk": chunk,
                    "enc_bytes": len(chunk),
                    "raw_bytes": 16 * len(t_slice),
                }
            )
        return pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.groupBy(*key_cols).applyInPandas(fold, schema=out_schema)


def decode_gorilla_chunks(
    chunks: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    value_col: str = "value",
) -> DataFrame:
    """Explode chunk rows back to (keys, ts, value) sample rows — the exact
    multiset that went in (bit-identical doubles, NaN/-0.0 included)."""
    key_fields = [chunks.schema[k] for k in key_cols]
    out_schema = T.StructType(
        list(key_fields)
        + [
            T.StructField(ts_col, T.LongType()),
            T.StructField(value_col, T.DoubleType()),
        ]
    )
    cols = key_cols + ["chunk"]

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in [*key_cols, ts_col, value_col]}
            for row in pdf.itertuples(index=False):
                rec = dict(zip(cols, row))
                ts, vals = gorilla_decode(bytes(rec["chunk"]))
                for k in key_cols:
                    out[k].extend([rec[k]] * len(ts))
                out[ts_col].extend(ts)
                out[value_col].extend(vals)
            yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return chunks.select(*cols).mapInPandas(explode, schema=out_schema)
