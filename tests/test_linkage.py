"""Fellegi–Sunter linkage: comparators, weight math, scoring, bands."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.linkage import (
    classify_links,
    field_agreement,
    fs_score,
    fs_weights,
)


def test_field_agreement_modes(spark):
    df = spark.createDataFrame(
        [
            ("Alice ", "alice", "12 Oak Street", "12 Oak St", 10.0, 10.015),
            ("Bob", "Carol", "5 Elm", "9 Pine", 1.0, 2.0),
            (None, None, "x", None, 3.0, 3.0),
        ],
        "a string, b string, p string, q string, x double, y double",
    )
    got = df.select(
        field_agreement(F.col("a"), F.col("b"), "norm").alias("norm"),
        field_agreement(F.col("p"), F.col("q"), "prefix", 6).alias("pre"),
        field_agreement(F.col("x"), F.col("y"), "abs_tol", 0.02).alias("tol"),
        field_agreement(F.col("a"), F.col("b"), "exact").alias("ex"),
    ).collect()
    assert (got[0].norm, got[0].pre, got[0].tol, got[0].ex) == (
        True, True, True, False,
    )
    assert (got[1].norm, got[1].pre, got[1].tol) == (False, False, False)
    # both-NULL agrees (null-safe), NULL-vs-value disagrees
    assert got[2].norm is True and got[2].pre is False
    with pytest.raises(ValueError):
        field_agreement(F.col("a"), F.col("b"), "prefix")
    with pytest.raises(ValueError):
        field_agreement(F.col("x"), F.col("y"), "abs_tol", -1)
    with pytest.raises(ValueError):
        field_agreement(F.col("a"), F.col("b"), "soundex")


def test_fs_weights_math_and_validation():
    wa, wd = fs_weights(0.9, 0.1)
    assert abs(wa - math.log2(9)) < 1e-12
    assert abs(wd - math.log2(0.1 / 0.9)) < 1e-12
    for m, u in ((0.5, 0.5), (0.1, 0.9), (1.0, 0.1), (0.9, 0.0)):
        with pytest.raises(ValueError):
            fs_weights(m, u)


def test_fs_score_and_bands(spark):
    pairs = spark.createDataFrame(
        [
            (1, 2, "ann", "ann", 5.0, 5.0),  # full agreement
            (3, 4, "ann", "bob", 5.0, 99.0),  # full disagreement
            (5, 6, "ann", "ann", 5.0, 99.0),  # mixed
        ],
        "ra long, rb long, na string, nb string, xa double, xb double",
    )
    comps = [
        {"name": "nm", "left": "na", "right": "nb", "mode": "norm",
         "m": 0.9, "u": 0.1},
        {"name": "x", "left": "xa", "right": "xb", "mode": "abs_tol",
         "param": 0.5, "m": 0.8, "u": 0.2},
    ]
    scored = fs_score(pairs, comps)
    got = {r.ra: r for r in scored.collect()}
    w_nm, w_x = fs_weights(0.9, 0.1), fs_weights(0.8, 0.2)
    assert got[1].fs_score == round(w_nm[0] + w_x[0], 4)
    assert got[3].fs_score == round(w_nm[1] + w_x[1], 4)
    assert got[5].fs_score == round(w_nm[0] + w_x[1], 4)
    assert got[1].agree_nm and not got[3].agree_nm

    bands = {
        r.ra: r.band
        for r in classify_links(scored, upper=4.0, lower=0.0).collect()
    }
    assert bands == {1: "match", 3: "nonmatch", 5: "possible"}
    with pytest.raises(ValueError):
        classify_links(scored, upper=0.0, lower=4.0)
    with pytest.raises(ValueError):
        fs_score(pairs, [])


def test_planted_duplicates_link_and_strangers_do_not(spark):
    recs = [(i, f"person {i:03d}", f"{i} main street", float(i)) for i in range(40)]
    dups = [
        (100 + i, f"PERSON {i:03d}", f"{i} main st", float(i) + 0.01)
        for i in range(0, 40, 4)
    ]
    df = spark.createDataFrame(
        recs + dups, "rid long, name string, addr string, bal double"
    )
    a = df.select(*[F.col(c).alias(f"{c}_a") for c in df.columns])
    b = df.select(*[F.col(c).alias(f"{c}_b") for c in df.columns])
    pairs = a.crossJoin(b).where(F.col("rid_a") < F.col("rid_b"))
    comps = [
        {"name": "name", "left": "name_a", "right": "name_b", "mode": "norm",
         "m": 0.95, "u": 0.01},
        {"name": "addr", "left": "addr_a", "right": "addr_b", "mode": "prefix",
         "param": 7, "m": 0.9, "u": 0.02},
        {"name": "bal", "left": "bal_a", "right": "bal_b", "mode": "abs_tol",
         "param": 0.05, "m": 0.95, "u": 0.05},
    ]
    out = classify_links(fs_score(pairs, comps), upper=8.0, lower=0.0).collect()
    matches = {(r.rid_a, r.rid_b) for r in out if r.band == "match"}
    assert matches == {(i, 100 + i) for i in range(0, 40, 4)}


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "a", "a")], "rid long, na string, nb string")
    plan = (
        fs_score(
            df,
            [{"name": "n", "left": "na", "right": "nb", "m": 0.9, "u": 0.1}],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- EM estimation ----------------------------------------------------------
def test_fs_em_separates_planted_mixture(spark):
    from opentelemetry_collector_components_spark.operators.linkage import (
        estimate_fs_em_quantized,
    )

    # planted: 200 matches agree on ~all fields, 1800 non-matches on few
    rows = []
    for i in range(200):
        rows.append((True, True, i % 10 != 0))
    for i in range(1800):
        rows.append((i % 10 == 0, i % 7 == 0, i % 9 == 0))
    df = spark.createDataFrame(rows, "f1 boolean, f2 boolean, f3 boolean")
    params, post = estimate_fs_em_quantized(df, ["f1", "f2", "f3"], iterations=5)
    p = {r.field: r for r in params.collect()}
    for f in ("f1", "f2", "f3"):
        assert p[f].m_micro > 800_000 > p[f].u_micro  # mixture separated
    prev = p["_prevalence"].m_micro
    assert 50_000 < prev < 300_000  # ~10% matches
    # the all-agree pattern is near-certainly a match
    g = {(r.f1, r.f2, r.f3): r.posterior_micro for r in post.collect()}
    assert g[(1, 1, 1)] > 900_000


def test_fs_em_determinism_and_guards(spark):
    import pytest as _pt

    from opentelemetry_collector_components_spark.operators.linkage import (
        estimate_fs_em_quantized,
    )

    df = spark.createDataFrame(
        [(i % 2 == 0, i % 3 == 0) for i in range(500)], "f1 boolean, f2 boolean"
    )
    a = estimate_fs_em_quantized(df.repartition(1), ["f1", "f2"])[0].collect()
    b = estimate_fs_em_quantized(df.repartition(7), ["f1", "f2"])[0].collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with _pt.raises(ValueError, match="iterations"):
        estimate_fs_em_quantized(df, ["f1"], iterations=0)
    with _pt.raises(ValueError, match="fields"):
        estimate_fs_em_quantized(df, [])
    with _pt.raises(ValueError, match="empty"):
        estimate_fs_em_quantized(df.where("f1 AND NOT f1"), ["f1"])


def test_fs_em_null_agreements_raise(spark):
    import pytest as _pt

    from opentelemetry_collector_components_spark.operators.linkage import (
        estimate_fs_em_quantized,
    )

    df = spark.createDataFrame(
        [(True, None), (False, True)], "f1 boolean, f2: boolean"
    )
    with _pt.raises(ValueError, match="NULL agreement"):
        estimate_fs_em_quantized(df, ["f1", "f2"])
