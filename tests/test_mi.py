"""Mutual information: perfect dependence == entropy, independence == 0,
hand-checked PMI cells, NULL normalization guard."""

from __future__ import annotations

import math

import pytest


def test_perfect_dependence_mi_equals_entropy(spark):
    from opentelemetry_collector_components_spark.operators.mi import (
        mutual_information,
    )

    # b = a bijectively, 4 equally likely values: MI = H(A) = H(B) = ln 4
    rows = [(str(i % 4), i % 4) for i in range(400)]
    df = spark.createDataFrame(rows, "a string, b int")
    out = mutual_information(df, "a", "b").collect()[0]
    ln4_micro = math.floor(1_000_000 * math.log(4.0))
    assert out.mi_micro == out.h_a_micro == out.h_b_micro == ln4_micro
    assert out.nmi_ppm == 1_000_000
    assert out.cells == 4 and out.n == 400


def test_independence_mi_zero(spark):
    from opentelemetry_collector_components_spark.operators.mi import (
        mutual_information,
    )

    # a and b cycle coprime periods -> exactly uniform joint = product of
    # marginals -> every cell PMI is ln(1)=0
    rows = [(i % 3, i % 5) for i in range(300)]
    df = spark.createDataFrame(rows, "a int, b int")
    out = mutual_information(df, "a", "b").collect()[0]
    assert out.mi_micro == 0 and out.cells == 15
    assert out.h_a_micro == math.floor(1_000_000 * math.log(3.0))


def test_pairwise_pmi_cells_hand_checked(spark):
    from opentelemetry_collector_components_spark.operators.mi import (
        pairwise_pmi,
    )

    # joint: (x,1):3  (x,2):1  (y,2):4  -> n=8
    rows = [("x", 1)] * 3 + [("x", 2)] + [("y", 2)] * 4
    df = spark.createDataFrame(rows, "a string, b int")
    got = {(r.a, r.b): r for r in pairwise_pmi(df, "a", "b").collect()}
    cell = got[("x", 1)]
    assert (cell.c_ab, cell.c_a, cell.c_b) == (3, 4, 3)
    assert cell.pmi_micro == math.floor(1e6 * math.log(3 * 8 / (4 * 3)))
    assert got[("x", 2)].pmi_micro == math.floor(1e6 * math.log(1 * 8 / (4 * 5)))


def test_constant_column_nmi_null(spark):
    from opentelemetry_collector_components_spark.operators.mi import (
        mutual_information,
    )

    df = spark.createDataFrame([("k", i % 3) for i in range(30)],
                               "a string, b int")
    out = mutual_information(df, "a", "b").collect()[0]
    assert out.h_a_micro == 0 and out.mi_micro == 0
    assert out.nmi_ppm is None
