"""Kaplan-Meier: hand-computed curve on the textbook example, censoring
vs event distinction, d=0 rows as exact no-ops, per-key independence."""

from __future__ import annotations

import pytest


def test_km_matches_hand_computation(spark):
    from opentelemetry_collector_components_spark.operators.survival import (
        km_survival,
    )

    # classic toy: events at t=1 (2 of 10), t=3 (1 of 8, after 1 censored
    # at t=2), censored at t=4, event at t=5 (1 of 5)
    rows = (
        [("g", 1, 1)] * 2
        + [("g", 2, 0)]
        + [("g", 3, 1)]
        + [("g", 4, 0)] * 2
        + [("g", 5, 1)]
        + [("g", 6, 0)] * 3
    )
    df = spark.createDataFrame(rows, "k string, t long, ev int")
    out = {r.t: r for r in km_survival(df, ["k"], "t", "ev").collect()}

    # S(1) = 1e6 * 8 // 10 = 800000
    assert (out[1].n_risk, out[1].d, out[1].surv_micro) == (10, 2, 800_000)
    # t=2 censoring only: survival unchanged EXACTLY, risk set shrinks
    assert (out[2].n_risk, out[2].d, out[2].surv_micro) == (8, 0, 800_000)
    # S(3) = 800000 * 6 // 7 = 685714
    assert (out[3].n_risk, out[3].surv_micro) == (7, 685_714)
    # t=4: two censored, no change
    assert (out[4].n_risk, out[4].surv_micro) == (6, 685_714)
    # S(5) = 685714 * 3 // 4 = 514285
    assert (out[5].n_risk, out[5].surv_micro) == (4, 514_285)
    # t=6: the remaining 3 censored at the end
    assert (out[6].n_risk, out[6].n_obs, out[6].surv_micro) == (3, 3, 514_285)


def test_km_censoring_differs_from_events(spark):
    from opentelemetry_collector_components_spark.operators.survival import (
        km_survival,
    )

    # same durations, one cohort all events, one all censored: survival
    # must drop to 0 in the first and stay at 1e6 in the second
    rows = [("ev", t, 1) for t in (1, 2, 3)] + [("cn", t, 0) for t in (1, 2, 3)]
    df = spark.createDataFrame(rows, "k string, t long, ev int")
    out = km_survival(df, ["k"], "t", "ev").collect()
    ev_last = max((r for r in out if r.k == "ev"), key=lambda r: r.t)
    assert ev_last.surv_micro == 0
    assert all(r.surv_micro == 1_000_000 for r in out if r.k == "cn")


def test_km_null_durations_dropped_and_validation(spark):
    from opentelemetry_collector_components_spark.operators.survival import (
        km_survival,
    )

    df = spark.createDataFrame(
        [("k", 1, 1), ("k", None, 1)], "k string, t long, ev int"
    )
    out = km_survival(df, ["k"], "t", "ev").collect()
    assert len(out) == 1 and out[0].n_risk == 1
    with pytest.raises(ValueError):
        km_survival(df, [], "t", "ev")


def test_na_hazard_hand_computed(spark):
    from opentelemetry_collector_components_spark.operators.survival import (
        na_hazard,
    )

    # subjects: durations/events — t=1: 1 event of 4 at risk (+250000);
    # t=2: censored only (+0); t=3: 1 event of 2 at risk (+500000)
    rows = [("k", 1, 1), ("k", 2, 0), ("k", 3, 1), ("k", 3, 0)]
    df = spark.createDataFrame(rows, "k string, dur long, ev int")
    got = {r["t"]: r for r in na_hazard(df, ["k"], "dur", "ev").collect()}
    assert got[1]["n_risk"] == 4 and got[1]["increment_micro"] == 250000
    assert got[2]["n_risk"] == 3 and got[2]["increment_micro"] == 0
    assert got[3]["n_risk"] == 2 and got[3]["increment_micro"] == 500000
    assert got[3]["hazard_micro"] == 750000


def test_na_hazard_oracle_matches(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.survival import (
        na_hazard,
        na_oracle_sql,
    )

    rows = []
    for i in range(200):
        rows.append((f"c{i % 2}", 1 + (i * 7) % 9, 1 if i % 3 else 0))
    df = spark.createDataFrame(rows, "c string, dur long, ev int")
    spark_rows = {
        (r["c"], r["t"]): (r["n_risk"], r["d"], r["n_obs"],
                           r["increment_micro"], r["hazard_micro"])
        for r in na_hazard(df, ["c"], "dur", "ev").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE s AS SELECT * FROM (VALUES "
        + ", ".join(f"('{c}', {d}, {e})" for c, d, e in rows)
        + ") v(c, dur, ev)"
    )
    sql = na_oracle_sql("SELECT * FROM s", ["c"], "dur", "ev")
    oracle = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5], r[6])
        for r in con.sql(sql).fetchall()
    }
    assert oracle == spark_rows


def test_na_vs_km_consistency(spark):
    """exp(-H) must upper-bound KM's S (standard inequality) and both
    must agree on the at-risk grid."""
    import math

    from opentelemetry_collector_components_spark.operators.survival import (
        km_survival,
        na_hazard,
    )

    rows = [("k", 1 + i % 5, 1 if i % 4 else 0) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, dur long, ev int")
    km = {r["t"]: r for r in km_survival(df, ["k"], "dur", "ev").collect()}
    na = {r["t"]: r for r in na_hazard(df, ["k"], "dur", "ev").collect()}
    assert set(km) == set(na)
    for t in km:
        assert km[t]["n_risk"] == na[t]["n_risk"]
        s_km = km[t]["surv_micro"] / 1e6
        s_na = math.exp(-na[t]["hazard_micro"] / 1e6)
        assert s_na >= s_km - 1e-5
