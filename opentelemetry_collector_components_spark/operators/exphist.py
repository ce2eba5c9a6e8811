"""Exponential-histogram merge — the one genuinely custom aggregate (A5).

Re-implements, from the public OpenTelemetry exponential-histogram spec and
the behavior documented in the reference (processor/lsmintervalprocessor/
internal/data/add.go:109-166, expo/scale.go:65-163, expo/zero.go:35-88,
bucket cap 160 at config/config.go:30-33), the merge of base-2 exponential
histograms:

1. align scales by downscaling the higher-scale histogram to the lower
   (bucket index remap ``idx -> idx >> d`` — each downscale-by-1 halves
   resolution and merges adjacent buckets);
2. widen the zero bucket to the max of the two zero thresholds, absorbing
   buckets that fall entirely below it (and snapping the threshold up to a
   bucket boundary when it lands inside one);
3. cap the per-sign bucket span at ``max_buckets`` (160) by further
   downscaling;
4. fold count/sum/min/max.

Every step is order-independent: downscaling distributes over bucket-count
addition (``downscale(a)+downscale(b) == downscale(a+b)``), so applying the
cap once at finalize equals the reference's apply-during-every-merge — the
associativity pebble's merge operator requires anyway (merger.go:40-86).

Spark shape: ``applyInPandas`` per (keys, window) group — Arrow-batched,
numpy-vectorized inside; no per-row Python UDFs.  At 100 TB the group count
(metric series x windows) is orders of magnitude smaller than the row count,
and rows arrive to the UDAF already combined per partition if callers
pre-merge with the same function (it is its own partial aggregate).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAX_BUCKETS = 160  # lsmintervalprocessor default, config/config.go:30-33

EXPHIST_VALUE_FIELDS = [
    StructField("scale", IntegerType()),
    StructField("zero_count", LongType()),
    StructField("zero_threshold", DoubleType()),
    StructField("pos_offset", IntegerType()),
    StructField("pos_counts", ArrayType(LongType())),
    StructField("neg_offset", IntegerType()),
    StructField("neg_counts", ArrayType(LongType())),
    StructField("count", LongType()),
    StructField("sum", DoubleType()),
    StructField("min", DoubleType()),
    StructField("max", DoubleType()),
]


def _downscale(offset: int, counts: np.ndarray, d: int) -> tuple[int, np.ndarray]:
    """Remap bucket indexes by ``idx >> d`` (floor division — correct for
    negative indexes too), summing counts that land in the same bucket."""
    if d <= 0 or len(counts) == 0:
        return offset, counts
    idx = np.arange(offset, offset + len(counts), dtype=np.int64)
    new_idx = idx >> d
    lo, hi = int(new_idx[0]), int(new_idx[-1])
    out = np.zeros(hi - lo + 1, dtype=np.int64)
    np.add.at(out, new_idx - lo, counts)
    return lo, out


def _bucket_upper(idx: int, scale: int) -> float:
    """Upper boundary of bucket ``idx`` at ``scale``: 2^((idx+1) * 2^-scale)."""
    return math.pow(2.0, (idx + 1) * math.pow(2.0, -scale))


def _trim(offset: int, counts: np.ndarray) -> tuple[int, np.ndarray]:
    """Drop leading/trailing zero buckets (expo/merge.go:32-86 trim)."""
    nz = np.nonzero(counts)[0]
    if len(nz) == 0:
        return 0, np.zeros(0, dtype=np.int64)
    return offset + int(nz[0]), counts[nz[0] : nz[-1] + 1]


def _fold_sign(offsets: np.ndarray, downs: np.ndarray, counts_col) -> tuple[int, np.ndarray]:
    """Vectorized fold of many (offset, counts[]) bucket runs into one dense
    array at the target scale.  Flattens all runs into parallel (index,
    count) vectors — ``np.repeat``/``cumsum`` arithmetic, no per-row Python
    loop — then scatter-adds with ``np.add.at``.  ``downs[i]`` is the
    downscale amount (source scale - target scale) applied as ``idx >> d``."""
    parts = [
        np.asarray(c, dtype=np.int64)
        for c in counts_col
        if c is not None and len(c) > 0
    ]
    if not parts:
        return 0, np.zeros(0, dtype=np.int64)
    lens = np.fromiter(
        (0 if c is None else len(c) for c in counts_col),
        dtype=np.int64,
        count=len(counts_col),
    )
    flat = np.concatenate(parts)
    total = int(lens.sum())
    starts = np.repeat(offsets, lens)
    run_start = np.repeat(np.cumsum(lens) - lens, lens)
    idx = (starts + np.arange(total, dtype=np.int64) - run_start) >> np.repeat(downs, lens)
    lo, hi = int(idx.min()), int(idx.max())
    out = np.zeros(hi - lo + 1, dtype=np.int64)
    np.add.at(out, idx - lo, flat)
    return lo, out


def merge_exphist_group(
    pdf: pd.DataFrame, max_buckets: int = MAX_BUCKETS, finalize: bool = True
) -> dict:
    """Merge all exponential-histogram datapoints in one group; returns the
    merged value fields as a plain dict (caller attaches group keys).

    ``finalize=False`` performs only the associative part (scale-align +
    bucket add + count/sum/min/max/threshold folds) and skips zero-bucket
    widening and the bucket cap — the partial-aggregate form: since
    downscaling distributes over addition, merging partials and finalizing
    once is bit-identical to a single full merge."""
    scales = pdf["scale"].astype(int).to_numpy()
    target_scale = int(scales.min())
    downs = scales - target_scale

    acc: dict[str, tuple[int, np.ndarray]] = {}
    for sign, ocol, ccol in (("pos", "pos_offset", "pos_counts"), ("neg", "neg_offset", "neg_counts")):
        offsets = pdf[ocol].fillna(0).astype(np.int64).to_numpy()
        acc[sign] = _fold_sign(offsets, downs, list(pdf[ccol]))

    zero_count = int(pdf["zero_count"].fillna(0).sum())
    zero_threshold = float(pdf["zero_threshold"].fillna(0.0).max())
    scale = target_scale

    # zero-bucket widening (expo/zero.go:35-88): absorb buckets entirely
    # below the widened threshold; snap threshold to a bucket boundary if it
    # lands strictly inside one.
    def _widen(offset: int, counts: np.ndarray, thr: float) -> tuple[int, np.ndarray, int, float]:
        absorbed = 0
        while len(counts) > 0 and _bucket_upper(offset, scale) <= thr:
            absorbed += int(counts[0])
            offset += 1
            counts = counts[1:]
        if len(counts) > 0 and counts[0] > 0:
            lower = math.pow(2.0, offset * math.pow(2.0, -scale))
            if lower < thr:  # threshold inside this bucket -> snap up
                thr = _bucket_upper(offset, scale)
                absorbed += int(counts[0])
                offset += 1
                counts = counts[1:]
        return offset, counts, absorbed, thr

    if finalize and zero_threshold > 0.0:
        for sign in ("pos", "neg"):
            o, c = acc[sign]
            o, c, absorbed, zero_threshold = _widen(o, c, zero_threshold)
            zero_count += absorbed
            acc[sign] = (o, c)

    # bucket cap (add.go:120-133, expo/scale.go:141): downscale until the
    # widest sign fits in max_buckets
    def _span() -> int:
        return max(len(acc["pos"][1]), len(acc["neg"][1]))

    while finalize and _span() > max_buckets:
        for sign in ("pos", "neg"):
            o, c = acc[sign]
            acc[sign] = _downscale(o, c, 1)
        scale -= 1

    pos_o, pos_c = _trim(*acc["pos"])
    neg_o, neg_c = _trim(*acc["neg"])

    mins = pdf["min"].dropna()
    maxs = pdf["max"].dropna()
    return {
        "scale": scale,
        "zero_count": zero_count,
        "zero_threshold": zero_threshold,
        "pos_offset": pos_o,
        "pos_counts": pos_c.tolist(),
        "neg_offset": neg_o,
        "neg_counts": neg_c.tolist(),
        "count": int(pdf["count"].fillna(0).sum()),
        "sum": float(pdf["sum"].fillna(0.0).sum()),
        "min": float(mins.min()) if len(mins) else None,
        "max": float(maxs.max()) if len(maxs) else None,
    }


def merge_exp_histograms(df: DataFrame, keys: list[str], max_buckets: int = MAX_BUCKETS) -> DataFrame:
    """groupBy(keys) -> one merged exponential histogram per group.

    Two-phase: a map-side local combine first merges each Arrow batch's rows
    per key inside its input partition (``mapInPandas`` — NO shuffle of raw
    datapoints), then the final ``applyInPandas`` merges the per-partition
    partials.  A hot series with millions of datapoints shuffles only
    ~(partitions x batches) partial histograms instead of every raw row, so
    skewed keys cannot strangle one reducer task.  The partial phase runs
    only the associative fold (finalize=False); widening and the bucket cap
    apply once at the end — bit-identical to a single-pass merge because
    downscaling distributes over bucket addition (see module docstring)."""
    schema = StructType(
        [StructField(k, StringType()) for k in keys] + EXPHIST_VALUE_FIELDS
    )
    field_order = [f.name for f in schema.fields]

    def _local_combine(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for key_vals, grp in pdf.groupby(keys, dropna=False, sort=False):
                if not isinstance(key_vals, tuple):
                    key_vals = (key_vals,)
                partial = merge_exphist_group(grp, max_buckets=max_buckets, finalize=False)
                for k, v in zip(keys, key_vals):
                    partial[k] = None if pd.isna(v) else str(v)
                out.append(partial)
            yield pd.DataFrame(out)[field_order]

    partials = df.select(
        *[F.col(k).cast("string").alias(k) for k in keys],
        *[f.name for f in EXPHIST_VALUE_FIELDS],
    ).mapInPandas(_local_combine, schema=schema)

    def _apply(key_vals: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        merged = merge_exphist_group(pdf, max_buckets=max_buckets)
        for k, v in zip(keys, key_vals):
            merged[k] = v
        return pd.DataFrame([merged])[field_order]

    return partials.groupBy(*keys).applyInPandas(_apply, schema=schema)


def values_to_exphist(values: list[float], scale: int, zero_threshold: float = 0.0) -> dict:
    """Build an exponential histogram from raw values (test fixture helper).

    index(v) = ceil(log2(v) * 2^scale) - 1, the standard base-2 mapping —
    bucket i covers (2^(i*2^-s), 2^((i+1)*2^-s)].
    """
    pos: dict[int, int] = {}
    neg: dict[int, int] = {}
    zero_count = 0
    total, s = 0, 0.0
    mn, mx = None, None
    for v in values:
        total += 1
        s += v
        mn = v if mn is None else min(mn, v)
        mx = v if mx is None else max(mx, v)
        if abs(v) <= zero_threshold or v == 0.0:
            zero_count += 1
            continue
        mag = abs(v)
        idx = math.ceil(math.log2(mag) * (2**scale)) - 1
        (pos if v > 0 else neg)[idx] = (pos if v > 0 else neg).get(idx, 0) + 1

    def _dense(d: dict[int, int]) -> tuple[int, list[int]]:
        if not d:
            return 0, []
        lo, hi = min(d), max(d)
        return lo, [d.get(i, 0) for i in range(lo, hi + 1)]

    po, pc = _dense(pos)
    no, nc = _dense(neg)
    return {
        "scale": scale,
        "zero_count": zero_count,
        "zero_threshold": zero_threshold,
        "pos_offset": po,
        "pos_counts": pc,
        "neg_offset": no,
        "neg_counts": nc,
        "count": total,
        "sum": s,
        "min": mn,
        "max": mx,
    }
