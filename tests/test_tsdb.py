"""Gorilla chunk codec: bit-exact round trips, compression, Spark operators."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.functions.gorilla import (
    gorilla_decode,
    gorilla_encode,
)
from opentelemetry_collector_components_spark.operators.tsdb import (
    decode_gorilla_chunks,
    encode_gorilla_chunks,
)


def _bits(x: float) -> int:
    return struct.unpack(">Q", struct.pack(">d", x))[0]


def _roundtrip(ts, vals):
    t2, v2 = gorilla_decode(gorilla_encode(ts, vals))
    assert t2 == list(ts)
    assert [_bits(v) for v in v2] == [_bits(v) for v in vals]


def test_empty_and_singleton():
    assert gorilla_decode(gorilla_encode([], [])) == ([], [])
    _roundtrip([1767225600000], [3.5])
    _roundtrip([0], [float("nan")])


def test_two_samples_and_constant_series():
    _roundtrip([10, 25], [1.0, 1.0])
    _roundtrip([10, 25], [1.0, -1.0])
    _roundtrip([5, 5], [2.0, 2.0])  # zero delta allowed (non-decreasing)


def test_special_float_bit_patterns():
    vals = [0.0, -0.0, float("inf"), float("-inf"), float("nan"), 5e-324, 1.7e308]
    ts = [i * 1000 for i in range(len(vals))]
    _roundtrip(ts, vals)


def test_dod_bucket_boundaries():
    # drive every delta-of-delta bucket including the 64-bit escape
    deltas = [1000, 1000, 1063, 1000, 1256, 1000, 3048, 1000, 10_000_000, 1]
    ts = [0]
    for d in deltas:
        ts.append(ts[-1] + d)
    vals = [float(i) for i in range(len(ts))]
    _roundtrip(ts, vals)


def test_negative_t0_and_decreasing_raises():
    _roundtrip([-5000, -4000, -3500], [1.0, 2.0, 3.0])
    with pytest.raises(ValueError):
        gorilla_encode([10, 5], [1.0, 2.0])
    with pytest.raises(ValueError):
        gorilla_encode([10, 20, 15], [1.0, 2.0, 3.0])


def test_random_series_bit_exact():
    rng = np.random.RandomState(7)
    for trial in range(20):
        n = int(rng.randint(1, 400))
        ts = np.cumsum(rng.randint(0, 5000, size=n)).tolist()
        kind = trial % 4
        if kind == 0:
            vals = rng.standard_normal(n).tolist()
        elif kind == 1:
            vals = np.round(rng.standard_normal(n), 1).tolist()  # repeated bit windows
        elif kind == 2:
            vals = np.full(n, 42.5).tolist()
        else:
            vals = rng.choice([0.0, -0.0, np.nan, np.inf, 1.25, -3e200], size=n).tolist()
        _roundtrip(ts, vals)


def test_compression_on_wellbehaved_telemetry():
    # constant value, constant step: ~1 bit/timestamp + 1 bit/value
    n = 3600
    ts = [i * 60_000 for i in range(n)]
    vals = [250.0] * n
    chunk = gorilla_encode(ts, vals)
    assert len(chunk) < n  # < 1 byte/sample vs 16 raw
    # gauge wobbling in a narrow range still beats raw comfortably
    vals2 = [250.0 + (i % 7) * 0.25 for i in range(n)]
    chunk2 = gorilla_encode(ts, vals2)
    assert len(chunk2) < 16 * n / 3


def test_spark_chunk_roundtrip(spark):
    sdf = (
        spark.range(2000)
        .select(
            (F.col("id") % 8).cast("string").alias("series"),
            (F.lit(1767225600000) + F.col("id") * 250).alias("ts_ms"),
            (
                F.when(F.col("id") % 5 == 0, F.lit(42.0))
                .otherwise((F.col("id") % 97).cast("double") / 8.0 - 3.0)
            ).alias("value"),
        )
    )
    chunks = encode_gorilla_chunks(sdf, ["series"], max_samples=100)
    cpd = chunks.toPandas()
    assert set(cpd["series"]) == {str(i) for i in range(8)}
    assert (cpd.groupby("series")["chunk_seq"].max() == 2).all()  # 250 rows -> 3 chunks
    assert (cpd["enc_bytes"] < cpd["raw_bytes"]).all()
    back = decode_gorilla_chunks(chunks, ["series"])
    got = back.toPandas().sort_values(["series", "ts_ms"]).reset_index(drop=True)
    want = sdf.toPandas().sort_values(["series", "ts_ms"]).reset_index(drop=True)
    assert got["ts_ms"].tolist() == want["ts_ms"].tolist()
    assert got["series"].tolist() == want["series"].tolist()
    assert [_bits(v) for v in got["value"]] == [_bits(v) for v in want["value"]]


def test_spark_plan_stays_arrow(spark):
    sdf = spark.range(100).select(
        (F.col("id") % 2).cast("string").alias("series"),
        F.col("id").alias("ts_ms"),
        F.col("id").cast("double").alias("value"),
    )
    plan = encode_gorilla_chunks(sdf, ["series"])._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_duplicate_timestamp_ties_break_on_bit_pattern(spark):
    # 0.0 vs -0.0 at the same timestamp: chunk bytes must not depend on
    # incoming row order
    rows_fwd = [("s", 1000, 0.0), ("s", 1000, -0.0), ("s", 2000, 1.0)]
    rows_rev = [("s", 1000, -0.0), ("s", 1000, 0.0), ("s", 2000, 1.0)]
    chunks = []
    for rows in (rows_fwd, rows_rev):
        df = spark.createDataFrame(rows, "series string, ts_ms long, value double")
        c = encode_gorilla_chunks(df, ["series"]).collect()[0]["chunk"]
        chunks.append(bytes(c))
    assert chunks[0] == chunks[1]
