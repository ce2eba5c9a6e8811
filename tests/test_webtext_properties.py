"""Property-based check: the O(n log n) run-fold repetition stats equal a
naive Python reference on arbitrary token streams."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

TOKENS = st.lists(
    st.sampled_from(["a", "bb", "ccc", "dd", "e"]), min_size=1, max_size=40
)


def _naive(units):
    c = Counter(units)
    best = max(n * len(u) for u, n in c.items())
    dup = sum(n * len(u) for u, n in c.items() if n > 1)
    return best, dup


@pytest.fixture(scope="module")
def run_fold_df(spark):
    from opentelemetry_collector_components_spark.functions.webtext import _run_fold

    def compute(units):
        df = spark.createDataFrame([(units,)], "u array<string>")
        row = df.select(
            _run_fold(F.col("u"), lambda acc: acc["best"]).alias("best"),
            _run_fold(F.col("u"), lambda acc: acc["dup"]).alias("dup"),
        ).first()
        return row.best, row.dup

    return compute


@settings(max_examples=25, deadline=None)
@given(units=TOKENS)
def test_run_fold_matches_naive(run_fold_df, units):
    assert run_fold_df(units) == _naive(units)
