"""Content-defined chunking (Gear/FastCDC-style) for binary blob dedup.

Fixed-size chunking breaks under insertion (every later chunk shifts);
content-defined chunking cuts where a rolling hash of the trailing bytes
hits a mask, so an edit only disturbs the chunks around it — the
standard technique for storage dedup (Muthitacharoen et al., LBFS, SOSP
2001; Xia et al., FastCDC, USENIX ATC 2016).  Over a web corpus this
dedups at the sub-document level: shared page furniture, syndicated
article bodies, and re-crawled near-identical HTML collapse to shared
chunk hashes even when the surrounding bytes differ.

Algorithm (Gear rolling hash): h_0 = 0, h_i = (h_{i-1} << 1 + G[b_i])
mod 2^64 with a fixed 256-entry random table G; a cut is placed AFTER
byte i when ``h_i & mask == 0`` (mask = 2^mask_bits - 1, so average
chunk length ~ 2^mask_bits), subject to a minimum chunk length (skip
cuts too close to the previous one) and a maximum (force a cut).  The
shift makes the hash depend on only the trailing 64 bytes, which is
what bounds edit damage.  G is derived from splitmix64 (Steele et al.,
OOPSLA 2014) seeded by the byte value — fully deterministic, no RNG
state.

Spark shape: ``mapInPandas`` binary-in / chunk-rows-out (Arrow batches,
no per-row Python at the plan level); inside a batch the hash is
vectorized numpy — h_i = sum over k<64 of G[b_{i-k}] << k (the shift
recurrence unrolled; shifts >= 64 vanish), computed as 64 vectorized
shift-adds in uint64 wraparound arithmetic, then the min/max constraint
pass walks only the CANDIDATE cut list (|cuts| entries, not |bytes|).
Chunk identity is the md5 of the chunk bytes.

No SQL oracle exists for a rolling hash (the driver records a rows-only
check); the exact semantics are pinned by tests/test_cdc.py against an
independent pure-Python byte-loop reference plus the shift-invariance
property (identical suffix content >= 64 bytes past an edit produces
identical cuts, offset-shifted).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_WINDOW = 64  # bytes the gear hash actually depends on (64-bit shifts)


def _splitmix64(x: int) -> int:
    """splitmix64 finalizer — the documented public mixing constants."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


GEAR = np.array([_splitmix64(i) for i in range(256)], dtype=np.uint64)


def gear_cuts(data: bytes, mask_bits: int, min_len: int, max_len: int) -> list[int]:
    """Cut offsets (exclusive chunk ends) for one blob — vectorized gear
    hash + candidate walk.  The final offset len(data) is always a cut
    (the tail chunk), except for empty input (no chunks)."""
    n = len(data)
    if n == 0:
        return []
    b = np.frombuffer(data, dtype=np.uint8)
    g = GEAR[b]
    h = np.zeros(n, dtype=np.uint64)
    for k in range(min(_WINDOW, n)):
        # h[i] += G[b[i-k]] << k  — uint64 wraparound is the mod 2^64
        h[k:] += g[: n - k] << np.uint64(k)
    mask = np.uint64((1 << mask_bits) - 1)
    # candidate cut after byte i  ->  offset i+1
    cand = (np.nonzero((h & mask) == 0)[0] + 1).tolist()
    cuts: list[int] = []
    start = 0
    for off in cand:
        while off - start > max_len:  # force cuts the candidates skipped
            start += max_len
            cuts.append(start)
        if off - start < min_len:
            continue
        cuts.append(off)
        start = off
    while n - start > max_len:
        start += max_len
        cuts.append(start)
    if start < n:
        cuts.append(n)
    return cuts


CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("offset", LongType()),
        StructField("length", LongType()),
        StructField("chunk_md5", StringType()),
    ]
)


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "data",
    mask_bits: int = 6,
    min_len: int = 16,
    max_len: int = 256,
) -> DataFrame:
    """Chunk a binary column content-definedly.

    Output: (doc_id, chunk_idx 0-based, offset, length, chunk_md5) —
    one row per chunk, ``offset + length`` contiguous and covering the
    blob.  Average chunk ~ 2^mask_bits bytes; production blob stores use
    mask_bits ~ 13 (8 KiB) — the default 6 suits test-scale documents.

    NULL/empty blobs produce no rows (nothing to store).  The map is
    narrow (no shuffle); downstream dedup is ``groupBy(chunk_md5)`` —
    one shuffle of (hash, length) pairs, never the bytes.
    """
    if not 1 <= mask_bits <= 32:
        raise ValueError("mask_bits must be in [1, 32]")
    if min_len < 1 or max_len < min_len:
        raise ValueError("need 1 <= min_len <= max_len")

    def chunk_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            offs: list[int] = []
            lens: list[int] = []
            md5s: list[str] = []
            for doc_id, data in zip(pdf["doc_id"], pdf["_bytes"]):
                if data is None:
                    continue
                data = bytes(data)
                start = 0
                for i, off in enumerate(
                    gear_cuts(data, mask_bits, min_len, max_len)
                ):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    offs.append(start)
                    lens.append(off - start)
                    md5s.append(hashlib.md5(data[start:off]).hexdigest())
                    start = off
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "offset": pd.Series(offs, dtype="int64"),
                    "length": pd.Series(lens, dtype="int64"),
                    "chunk_md5": pd.Series(md5s, dtype="object"),
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(bin_col).cast("binary").alias("_bytes"),
    )
    return src.mapInPandas(chunk_batches, CHUNK_SCHEMA)


def chunk_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Corpus-level chunk-store dedup summary from ``cdc_chunks`` output:
    one row (n_chunks, n_unique, stored_bytes, logical_bytes,
    dedup_ratio 4dp).  ``stored_bytes`` counts each distinct chunk once
    (its canonical length); two aggregates, both map-side combined."""
    uniq = chunks.groupBy("chunk_md5").agg(
        F.min("length").alias("_len"), F.count(F.lit(1)).alias("_refs")
    )
    return uniq.agg(
        F.sum("_refs").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.sum("_len").cast("long").alias("stored_bytes"),
        F.sum(F.col("_len") * F.col("_refs")).cast("long").alias("logical_bytes"),
        F.round(
            F.sum(F.col("_len") * F.col("_refs")) / F.sum("_len"), 4
        ).alias("dedup_ratio"),
    )
