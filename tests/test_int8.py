"""int8 scalar quantization: hand-checked codes, reconstruction bound,
zero-vector safety, top-k agreement with exact cosine ranking on
separable data, JVM-only plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_int8_codes_and_reconstruction_bound(spark):
    from opentelemetry_collector_components_spark.operators.similarity import (
        int8_quantize,
    )

    vec = [0.5, -1.0, 0.24, 0.0, -0.013]
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<double>")
    row = int8_quantize(df).collect()[0]
    m = 1.0
    expect = []
    for x in vec:
        mag = math.floor(abs(x) * 127.0 / m + 0.5)
        expect.append(int(-mag if x < 0 else mag))
    assert row.codes == expect and row.maxabs == pytest.approx(1.0)
    # reconstruction error bounded by half a quantization step
    scale = row.maxabs / 127.0
    for x, c in zip(vec, row.codes):
        assert abs(x - c * scale) <= scale / 2 + 1e-12
    # extreme entries hit exactly +/-127
    assert min(row.codes) == -127


def test_int8_zero_vector_is_safe(spark):
    from opentelemetry_collector_components_spark.operators.similarity import (
        int8_quantize,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    row = int8_quantize(df).collect()[0]
    assert row.codes == [0, 0, 0]


def test_int8_topk_matches_exact_ranking_on_separable_data(spark):
    from opentelemetry_collector_components_spark.operators.similarity import (
        int8_topk,
        topk_cosine,
    )

    # 40 vectors pointing at distinct angles in 2D plus a magnitude
    # dimension: int8 error (<0.4%) cannot reorder well-separated dots
    rows = []
    for i in range(40):
        a = 2.0 * math.pi * i / 40.0
        rows.append((i, [math.cos(a), math.sin(a), 0.1]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, 0.05, 0.1]
    approx = [r.vec_id for r in int8_topk(df, q, k=5).collect()]
    exact = [r.vec_id for r in topk_cosine(df, q, k=5).collect()]
    # same top-5 set (cosine vs dot agree here: near-unit norms)
    assert set(approx) == set(exact)
    with pytest.raises(ValueError):
        int8_topk(df, q, k=0)


def test_int8_plan_is_jvm_only(spark):
    from opentelemetry_collector_components_spark.operators.similarity import (
        int8_topk,
    )

    df = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    plan = int8_topk(df, [1.0, 0.0], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
