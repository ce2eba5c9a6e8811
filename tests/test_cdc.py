"""Content-defined chunking: reference parity, invariants, dedup stats."""

import hashlib

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.cdc import (
    GEAR,
    cdc_chunks,
    chunk_dedup_stats,
    gear_cuts,
)

MASK64 = (1 << 64) - 1


def ref_cuts(data: bytes, mask_bits: int, min_len: int, max_len: int):
    """Independent pure-Python byte-loop reference for gear CDC."""
    mask = (1 << mask_bits) - 1
    h = 0
    cand = []
    for i, byte in enumerate(data):
        h = ((h << 1) + int(GEAR[byte])) & MASK64
        if h & mask == 0:
            cand.append(i + 1)
    cuts, start = [], 0
    for off in cand:
        while off - start > max_len:
            start += max_len
            cuts.append(start)
        if off - start >= min_len:
            cuts.append(off)
            start = off
    n = len(data)
    while n - start > max_len:
        start += max_len
        cuts.append(start)
    if start < n:
        cuts.append(n)
    return cuts


def _blob(n: int, seed: int = 7) -> bytes:
    # deterministic pseudo-random bytes, no RNG state
    return bytes(
        hashlib.md5(f"{seed}:{i}".encode()).digest()[0] for i in range(n)
    )


def test_gear_cuts_match_byte_loop_reference():
    for n in (0, 1, 63, 64, 500, 3000):
        data = _blob(n)
        for mb, lo, hi in ((4, 4, 64), (6, 16, 256), (2, 1, 8)):
            assert gear_cuts(data, mb, lo, hi) == ref_cuts(data, mb, lo, hi), (
                n,
                mb,
            )


def test_gear_cuts_invariants():
    data = _blob(2000, seed=3)
    cuts = gear_cuts(data, 5, 8, 100)
    assert cuts[-1] == len(data)
    assert cuts == sorted(set(cuts))
    lens = [b - a for a, b in zip([0] + cuts[:-1], cuts)]
    assert all(ln <= 100 for ln in lens)
    assert all(ln >= 8 for ln in lens[:-1])  # only the tail may be short


def test_candidate_shift_invariance():
    """The gear hash sees 64 trailing bytes: prepending a prefix must
    not move candidate cuts that sit > 64 bytes past the prefix."""
    a = _blob(1500, seed=11)
    prefix = _blob(137, seed=12)
    big = 1 << 20
    cand_a = set(gear_cuts(a, 5, 1, big)[:-1])  # min=1, max=inf -> raw cands
    cand_b = set(gear_cuts(prefix + a, 5, 1, big)[:-1])
    shifted = {c + len(prefix) for c in cand_a if c > 64}
    assert shifted == {c for c in cand_b if c > len(prefix) + 64}


def test_cdc_chunks_dataframe(spark):
    rows = [
        (1, _blob(700, seed=1)),
        (2, _blob(700, seed=1)),  # exact duplicate of 1
        (3, _blob(300, seed=2) + _blob(700, seed=1)),  # shares 1's content
        (4, b""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, data binary")
    out = cdc_chunks(df, mask_bits=4, min_len=4, max_len=64)
    pdf = out.toPandas().sort_values(["doc_id", "chunk_idx"])
    # coverage: contiguous offsets, lengths sum to blob size, md5 correct
    by_doc = {d: bytes(b) for d, b in rows[:3]}
    for doc_id, grp in pdf.groupby("doc_id"):
        data = by_doc[doc_id]
        assert list(grp["offset"]) == [0] + list(
            (grp["offset"] + grp["length"]).iloc[:-1]
        )
        assert grp["length"].sum() == len(data)
        for _, r in grp.iterrows():
            seg = data[r["offset"] : r["offset"] + r["length"]]
            assert hashlib.md5(seg).hexdigest() == r["chunk_md5"]
    # empty/NULL blobs emit nothing
    assert set(pdf["doc_id"]) == {1, 2, 3}
    # duplicate blobs share every chunk hash
    h1 = list(pdf[pdf.doc_id == 1]["chunk_md5"])
    h2 = list(pdf[pdf.doc_id == 2]["chunk_md5"])
    assert h1 == h2
    # doc 3's shared suffix re-uses doc 1's chunk hashes past the window
    h3 = set(pdf[pdf.doc_id == 3]["chunk_md5"])
    assert len(set(h1) & h3) >= len(h1) // 2

    stats = chunk_dedup_stats(out).head()
    assert stats["n_chunks"] == len(pdf)
    assert stats["n_unique"] == pdf["chunk_md5"].nunique()
    assert stats["logical_bytes"] == 700 + 700 + 1000
    assert stats["stored_bytes"] < stats["logical_bytes"]
    assert stats["dedup_ratio"] == round(
        stats["logical_bytes"] / stats["stored_bytes"], 4
    )


def test_cdc_no_batch_eval_python(spark):
    df = spark.createDataFrame([(1, b"xyz" * 50)], "doc_id long, data binary")
    plan = cdc_chunks(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
