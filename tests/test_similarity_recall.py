"""ANN quality: measured recall@10 must clear the documented per-method
floors (the determinism gates only prove reproducibility)."""

import os

import pytest

from opentelemetry_collector_components_spark.operators.similarity import (
    ANN_RECALL_FLOORS,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def recall_rows(spark):
    from opentelemetry_collector_components_spark.queries import SPARK_QUERIES

    df = SPARK_QUERIES["ann_recall_floor"](spark, SF_DIR)
    return {r["method"]: r for r in df.collect()}


def test_all_methods_measured(recall_rows):
    assert set(recall_rows) == set(ANN_RECALL_FLOORS)
    for r in recall_rows.values():
        assert r["n_returned"] == 10


def test_recall_meets_documented_floor(recall_rows):
    for method, floor in ANN_RECALL_FLOORS.items():
        got = recall_rows[method]["recall"]
        assert got >= floor, f"{method}: recall {got} under floor {floor}"


def test_exact_method_dominates(recall_rows):
    """IVF probes real floats (no compression) so it must beat or match the
    compressed/bucketed methods — a sanity ordering on the quality ladder."""
    ivf = recall_rows["ivf"]["recall"]
    for m in ("pq", "ivf_pq", "lsh_md5"):
        assert ivf >= recall_rows[m]["recall"]
