"""Z-order keys and compaction planning: Morton correctness, locality,
SQL-expression parity, streaming-fill invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.layout import (
    plan_compaction,
    zorder_key,
    zorder_sql,
)


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_reference_interleave(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x int, y int"
    )
    got = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=4).alias("z")
    ).collect()
    for r in got:
        assert r.z == _morton2(r.x, r.y, 4), (r.x, r.y)


def test_zorder_sql_expression_parity(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x int, y int"
    )
    both = df.select(
        zorder_key([F.col("x"), F.col("y")], bits=3).alias("a"),
        F.expr(zorder_sql(["x", "y"], 3)).alias("b"),
    ).collect()
    assert all(r.a == r.b for r in both)


def test_zorder_masks_high_bits_and_validates(spark):
    df = spark.createDataFrame([(5 + 8, 2)], "x int, y int")  # x overflows 3 bits
    z = df.select(zorder_key([F.col("x"), F.col("y")], bits=3).alias("z")).collect()
    assert z[0].z == _morton2(5, 2, 3)  # high bit masked off, not corrupting
    with pytest.raises(ValueError):
        zorder_key([F.col("x")], bits=3)
    with pytest.raises(ValueError):
        zorder_key([F.col("x"), F.col("y")], bits=32)  # 64 bits > 63


def test_zorder_gives_two_dimensional_locality(spark):
    # 32x32 grid; chunk z-sorted rows into files of 64: every chunk must
    # span a bounded range in BOTH dims, unlike a single-column sort
    # (where the second dim spans the whole domain in every chunk)
    df = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x int, y int"
    )
    rows = (
        df.select("x", "y", zorder_key([F.col("x"), F.col("y")], bits=5).alias("z"))
        .orderBy("z")
        .collect()
    )
    chunks = [rows[i : i + 64] for i in range(0, len(rows), 64)]
    for ch in chunks:
        assert max(r.x for r in ch) - min(r.x for r in ch) <= 8
        assert max(r.y for r in ch) - min(r.y for r in ch) <= 8


def test_zorder_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, 2)], "x int, y int")
    plan = (
        df.select(zorder_key([F.col("x"), F.col("y")]).alias("z"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# compaction
# ---------------------------------------------------------------------------
def _manifest(spark):
    sizes = {"a": [30, 30, 30, 80, 10, 120, 10, 40, 40, 40], "b": [200, 5, 5]}
    rows = [
        (d, f"f{i:02d}", s) for d, ss in sizes.items() for i, s in enumerate(ss)
    ]
    return spark.createDataFrame(rows, "dir string, file string, size long")


def test_compaction_prefix_fill_invariant(spark):
    out = plan_compaction(_manifest(spark), ["dir"], "file", "size", 50).collect()
    # the offset-bucketing guarantee: cumulative bytes through every
    # non-final bin reach (bin+1) * target (bins fill to target ON
    # AVERAGE; an individual bin may underfill by its predecessor's
    # overhang — see layout.py module docstring)
    for d in ("a", "b"):
        rows = sorted((r for r in out if r.dir == d), key=lambda r: r.file)
        bins = [r.bin for r in rows]
        assert bins == sorted(bins)  # consecutive files, monotone bins
        assert set(bins) == set(range(max(bins) + 1))  # dense ids
        cum = 0
        for r in rows:
            cum += r.size
            if r.bin != max(bins) and rows[rows.index(r) + 1].bin != r.bin:
                # r closes its bin: prefix through bin b >= (b+1)*target
                assert cum >= (r.bin + 1) * 50, (d, r.bin, cum)


def test_compaction_huge_file_gets_own_bin(spark):
    out = {
        r.file: r.bin
        for r in plan_compaction(
            _manifest(spark), ["dir"], "file", "size", 50
        ).collect()
        if r.dir == "b"
    }
    # 200-byte file fills bin 0 alone; the two 5-byte files share bin 1
    assert out == {"f00": 0, "f01": 1, "f02": 1}


def test_compaction_validation(spark):
    m = _manifest(spark)
    with pytest.raises(ValueError):
        plan_compaction(m, [], "file", "size", 50)
    with pytest.raises(ValueError):
        plan_compaction(m, ["dir"], "file", "size", 0)


# ---------------------------------------------------------------------------
# sketch-driven balanced range splits
# ---------------------------------------------------------------------------
def test_bucket_by_splits_assignment_and_validation(spark):
    from opentelemetry_collector_components_spark.operators.layout import (
        bucket_by_splits,
    )

    df = spark.createDataFrame(
        [(0.5,), (1.0,), (1.5,), (99.0,), (None,)], "v double"
    )
    got = [
        r.p
        for r in df.select(
            bucket_by_splits(F.col("v"), [1.0, 2.0, 10.0]).alias("p")
        ).collect()
    ]
    assert got == [0, 1, 1, 3, None]
    with pytest.raises(ValueError):
        bucket_by_splits(F.col("v"), [])
    with pytest.raises(ValueError):
        bucket_by_splits(F.col("v"), [2.0, 1.0])


def test_balanced_splits_equalize_a_skewed_distribution(spark):
    from opentelemetry_collector_components_spark.operators.layout import (
        balanced_splits,
        bucket_by_splits,
    )
    from opentelemetry_collector_components_spark.operators.sketches import (
        ddsketch_build,
    )

    # heavy-tailed values: x^3 over a deterministic grid
    df = spark.range(8000).select(
        ((F.col("id") % 997 + 1).cast("double") ** 3).alias("v")
    )
    sk = ddsketch_build(df, [], "v", alpha=0.01)
    splits = balanced_splits(sk, 8, alpha=0.01)
    assert splits == sorted(splits) and len(splits) == 7
    counts = [
        r.n
        for r in df.groupBy(bucket_by_splits(F.col("v"), splits).alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(counts) == 8
    assert max(counts) <= 2 * min(counts)  # equi-depth within sketch error
    with pytest.raises(ValueError):
        balanced_splits(sk, 1)
