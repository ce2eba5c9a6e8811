"""Property-based tests for the exponential-histogram merge kernel
(mirrors the reference's unit tests on merge math,
internal/data/expo/*_test.go — re-derived, not copied)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_components_spark.operators.exphist import (
    merge_exphist_group,
    values_to_exphist,
)

values = st.lists(
    st.floats(min_value=1e-6, max_value=1e12, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=40,
)
scales = st.integers(min_value=-2, max_value=8)


def _df(*hists):
    return pd.DataFrame(list(hists))


@settings(max_examples=60, deadline=None)
@given(values, values, scales, scales)
def test_commutative(va, vb, sa, sb):
    a, b = values_to_exphist(va, sa), values_to_exphist(vb, sb)
    m1 = merge_exphist_group(_df(a, b))
    m2 = merge_exphist_group(_df(b, a))
    assert m1 == m2


@settings(max_examples=60, deadline=None)
@given(values, values, values, scales, scales, scales)
def test_associative_via_concat(va, vb, vc, sa, sb, sc):
    """Merging all three == histogramming the concatenation at min scale
    (as long as no bucket-cap downscale kicks in, which concat shares)."""
    hs = [values_to_exphist(v, s) for v, s in ((va, sa), (vb, sb), (vc, sc))]
    merged = merge_exphist_group(_df(*hs))
    concat = values_to_exphist(va + vb + vc, min(sa, sb, sc))
    if merged["scale"] == concat["scale"]:  # no cap-triggered downscale
        assert merged["pos_offset"] == concat["pos_offset"]
        assert merged["pos_counts"] == concat["pos_counts"]
    assert merged["count"] == concat["count"]


@settings(max_examples=60, deadline=None)
@given(values, scales)
def test_counts_conserved(v, s):
    h = values_to_exphist(v, s)
    m = merge_exphist_group(_df(h, h))
    assert m["count"] == 2 * len(v)
    assert sum(m["pos_counts"]) + sum(m["neg_counts"]) + m["zero_count"] == 2 * len(v)


@settings(max_examples=40, deadline=None)
@given(values, scales, st.floats(min_value=0.0, max_value=100.0))
def test_zero_threshold_monotone(v, s, thr):
    """Widening the zero threshold never loses datapoints."""
    a = values_to_exphist(v, s, zero_threshold=0.0)
    b = values_to_exphist([1.0], s, zero_threshold=thr)
    m = merge_exphist_group(_df(a, b))
    assert sum(m["pos_counts"]) + sum(m["neg_counts"]) + m["zero_count"] == len(v) + 1
    assert m["zero_threshold"] >= thr or m["zero_threshold"] >= 0.0
