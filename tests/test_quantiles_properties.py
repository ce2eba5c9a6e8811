"""Property-based check: iterative range-narrowing quantiles equal the
sorted-order elements (quantile_disc index rule) on arbitrary inputs —
duplicates, negatives, single values, adversarial cluster shapes."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

VALUES = st.lists(
    st.one_of(
        st.integers(min_value=-1000, max_value=1000).map(float),
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        # adversarial: tight clusters around a point, heavy duplication
        st.sampled_from([0.0, 1e-9, 2e-9, 42.0, 42.0000000001, -7.25]),
    ),
    min_size=1,
    max_size=300,
)
QS = st.lists(
    st.sampled_from([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]),
    min_size=1,
    max_size=3,
    unique=True,
)


def _truth(vals, q):
    s = sorted(vals)
    k = min(len(s), max(1, math.ceil(q * len(s))))
    return s[k - 1]


@settings(max_examples=25, deadline=None)
@given(vals=VALUES, qs=QS)
def test_equals_sorted_truth(spark_module, vals, qs):
    from opentelemetry_collector_components_spark.operators.quantiles import (
        exact_quantiles,
    )

    df = spark_module.createDataFrame([(v,) for v in vals], "v double")
    got = {
        r["quantile"]: r["value"]
        for r in exact_quantiles(df, "v", qs, buckets=4, final_threshold=3).collect()
    }
    for q in qs:
        assert got[q] == _truth(vals, q), (q, vals)


# hypothesis forbids function-scoped fixtures with @given; reuse the
# session fixture through a module alias like the other property suites
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_module(spark):
    return spark
