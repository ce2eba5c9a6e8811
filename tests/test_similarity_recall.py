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


def test_nprobe_sensitivity_monotone(spark):
    """The nprobe knob's contract: more probed cells can only WIDEN the
    candidate set (monotone recall/cost curve).  Asserted structurally —
    candidate counts non-decreasing in nprobe and the nprobe=5 (=K)
    probe equals the whole corpus — plus recall non-decreasing."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.similarity import (
        _probe_candidates,
        ivf_topk,
        topk_cosine,
    )
    from opentelemetry_collector_components_spark.queries import load

    emb = load(spark, SF_DIR, "embeddings")
    seeds = emb.filter(F.col("vec_id") < 5).orderBy("vec_id").collect()
    cents = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in seeds]
    qvec = cents[0][1]
    truth = {r["vec_id"] for r in topk_cosine(emb, qvec, k=10).collect()}

    counts, recalls = [], []
    for nprobe in (1, 2, 4):
        counts.append(_probe_candidates(emb, qvec, cents, nprobe, "embedding").count())
        ids = {r["vec_id"] for r in ivf_topk(emb, qvec, cents, k=10, nprobe=nprobe).collect()}
        recalls.append(len(ids & truth) / 10.0)
    assert counts == sorted(counts)
    assert counts[0] < counts[-1]  # cells really prune at nprobe=1
    assert recalls == sorted(recalls)
    full = _probe_candidates(emb, qvec, cents, 5, "embedding").count()
    assert full == emb.count()
