"""Property tests (hypothesis) over the session-g pure kernels: Morton
round trips, compaction invariants vs a Python reference, CIDR bound
algebra, grok compile/match agreement, Poisson threshold monotonicity.

Spark evaluation happens once per property over a batched frame (one
action per test, not one per example) — hypothesis drives the INPUTS,
Spark evaluates them in bulk, Python re-derives the truth.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# zorder: interleave/deinterleave round trip
# ---------------------------------------------------------------------------
def _deinterleave2(z: int, bits: int) -> tuple[int, int]:
    x = y = 0
    for i in range(bits):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2**10 - 1), st.integers(0, 2**10 - 1)),
                min_size=1, max_size=20))
def test_zorder_roundtrip_property(spark, pairs):
    from opentelemetry_collector_components_spark.operators.layout import (
        zorder_key,
    )

    df = spark.createDataFrame(pairs, "x long, y long")
    got = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=10).alias("z")
    ).collect()
    for r in got:
        assert _deinterleave2(r.z, 10) == (r.x, r.y)


# ---------------------------------------------------------------------------
# compaction: offset-bucketing reference + the prefix fill invariant
# (hypothesis found the original "every bin >= target" claim false: a
# boundary-straddling file leaves its successor bin underfilled — the
# honest guarantee is the prefix property below; see layout.py docstring)
# ---------------------------------------------------------------------------
def _offset_bins(sizes: list[int], target: int) -> list[int]:
    bins, start = [], 0
    for s in sizes:
        bins.append(start // target)
        start += s
    remap = {v: i for i, v in enumerate(sorted(set(bins)))}
    return [remap[v] for v in bins]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(1, 500), min_size=1, max_size=30),
    st.integers(50, 400),
)
def test_compaction_matches_offset_reference_and_prefix_invariant(
    spark, sizes, target
):
    from opentelemetry_collector_components_spark.operators.layout import (
        plan_compaction,
    )

    rows = [("d", f"f{i:03d}", s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "dir string, file string, size long")
    got = [
        r.bin
        for r in sorted(
            plan_compaction(df, ["dir"], "file", "size", target).collect(),
            key=lambda r: r.file,
        )
    ]
    assert got == _offset_bins(sizes, target)
    # prefix invariant: cumulative bytes through each non-final bin
    # reach (bin_index + 1) * target; ids dense and monotone
    assert got == sorted(got) and set(got) == set(range(max(got) + 1))
    cum = 0
    for i, s in enumerate(sizes):
        cum += s
        closes_bin = i + 1 == len(sizes) or got[i + 1] != got[i]
        if closes_bin and got[i] != max(got):
            assert cum >= (got[i] + 1) * target


# ---------------------------------------------------------------------------
# CIDR bounds: size/alignment/containment algebra
# ---------------------------------------------------------------------------
@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2**32 - 1), st.integers(0, 32)),
                min_size=1, max_size=25))
def test_cidr_bounds_algebra(spark, blocks):
    from opentelemetry_collector_components_spark.operators.iplookup import (
        cidr_bounds,
    )

    df = spark.createDataFrame(blocks, "net long, plen int")
    lo, hi = cidr_bounds(F.col("net"), F.col("plen"))
    got = df.select("net", "plen", lo.alias("lo"), hi.alias("hi")).collect()
    for r in got:
        size = 1 << (32 - r.plen)
        assert r.hi - r.lo == size  # exact block size
        assert r.lo % size == 0  # aligned
        assert r.lo <= r.net < r.hi  # the input address is inside


# ---------------------------------------------------------------------------
# grok: compiled regex matches what the library pattern promises
# ---------------------------------------------------------------------------
@settings(max_examples=50, deadline=None)
@given(st.integers(-10**9, 10**9), st.floats(allow_nan=False,
       allow_infinity=False, width=32))
def test_grok_numeric_patterns_match_and_capture(n, f):
    from opentelemetry_collector_components_spark.functions.grok import (
        grok_compile,
    )

    rx, fields = grok_compile("v=%{INT:i} w=%{NUMBER:x}")
    # plain decimal formatting: BASE10NUM (like classic grok) does not
    # match exponent notation, so 1e+16-style reprs are out of domain
    fstr = f"{float(f):.6f}"
    m = re.match(rx, f"v={n} w={fstr}")
    assert m, (n, fstr)
    assert m.group(fields[0][1]) == str(n)
    assert m.group(fields[1][1]) == fstr


# ---------------------------------------------------------------------------
# Poisson thresholds: CDF monotone, in range, mass sums below 1
# ---------------------------------------------------------------------------
def test_poisson_thresholds_properties():
    import math

    from opentelemetry_collector_components_spark.operators.bootstrap import (
        poisson1_thresholds,
    )

    for k in range(1, 9):
        ts = poisson1_thresholds(k)
        assert len(ts) == k and ts == sorted(ts)
        assert all(0 < t < 1 << 60 for t in ts)
        # threshold_k / 2^60 == CDF(k) within float error
        cdf = 0.0
        for i, t in enumerate(ts):
            cdf += math.exp(-1) / math.factorial(i)
            assert abs(t / (1 << 60) - cdf) < 1e-12
