"""Broadcast Bloom-filter membership prefilter.

The canonical 100 TB pattern for "does this row's key appear in a much
smaller reference set": build a compact bitmap over the reference keys
ONCE, broadcast it (a few MB, not the key strings), and prefilter the
big side with a vectorized membership test before any join.  The big
side never shuffles for the lookup; only the (tiny) surviving fraction
pays a broadcast equi-join for exact verification.  Bloom filters have
no false negatives, so prefilter + exact verify is semantically
identical to the plain join — the oracle for any operator built on this
is the exact-join SQL.

Sizing: m bits / n keys = 16 with k = 5 hashes gives ~5e-3 false-positive
rate; an eval-suite reference set of 1e6 n-grams fits in 2 MB.  The
bitmap build collects at most min(k*n, m) distinct bit positions to the
driver — bounded by m by construction, never by the corpus.

Hashing is Spark's JVM ``xxhash64(key, seed)`` (positions are computed
engine-side, whole-stage-codegen); the Python side only tests bits with
numpy on Arrow batches.  Membership is engine-internal (a prefilter), so
no cross-engine hash reproducibility is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _bit_positions(col: Column, m_bits: int, k_hashes: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)).cast("long")
        for i in range(k_hashes)
    ]


def build_bloom_bitmap(
    keys: DataFrame, col: str, m_bits: int = 1 << 20, k_hashes: int = 5
) -> bytes:
    """Bitmap (little-endian bit order within each byte) over the distinct
    values of ``keys[col]``.  One distributed distinct over bit positions;
    the driver materializes <= m_bits/8 bytes."""
    if m_bits <= 0 or m_bits % 8:
        raise ValueError("m_bits must be a positive multiple of 8")
    if k_hashes < 1:
        raise ValueError("k_hashes must be >= 1")
    pos = (
        keys.select(
            F.explode(F.array(*_bit_positions(F.col(col), m_bits, k_hashes))).alias(
                "pos"
            )
        )
        .distinct()
        .toPandas()["pos"]
        .to_numpy(dtype=np.int64)
    )
    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bitmap.tobytes()


def bloom_might_contain(
    df: DataFrame, col: str, bitmap: bytes, m_bits: int = 1 << 20, k_hashes: int = 5
) -> DataFrame:
    """Rows of ``df`` whose ``col`` MIGHT be in the set the bitmap encodes
    (superset of the true members; follow with an exact verify join).
    Bit positions are JVM expressions; the UDF is a pure numpy bitmap
    gather over Arrow batches — no Python string hashing in the hot path."""
    if len(bitmap) * 8 != m_bits:
        raise ValueError(f"bitmap is {len(bitmap) * 8} bits, expected {m_bits}")
    if k_hashes < 1:
        raise ValueError("k_hashes must be >= 1")
    # ship the bitmap once per executor (torrent broadcast), not once per
    # task inside the pickled UDF closure; registered with any active
    # caching.scoped_intermediates block so long-lived drivers looping
    # over many bitmaps can release executor copies deterministically
    from ..caching import track_handle

    bc = track_handle(df.sparkSession.sparkContext.broadcast(bitmap))

    @pandas_udf("boolean")
    def _member(*pos_cols: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        acc = np.ones(len(pos_cols[0]), dtype=bool)
        for s in pos_cols:
            p = s.to_numpy(dtype=np.int64)
            acc &= ((bm[p >> 3] >> (p & 7).astype(np.uint8)) & 1).astype(bool)
        return pd.Series(acc)

    return df.where(_member(*_bit_positions(F.col(col), m_bits, k_hashes)))
