"""MAD anomaly scoring, CUSUM changepoints, expectation audits, template
novelty: hand-computed statistics, recursion equivalence, NULL rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.anomaly import (
    cusum_changepoints,
    mad_anomaly,
)
from opentelemetry_collector_components_spark.operators.validate import (
    validate_expectations,
)


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, w long, v long")


def test_mad_hand_computed(spark):
    # values 10,12,11,13,50: sorted 10,11,12,13,50 -> lower median 12
    # abs devs 2,0,1,1,38 -> sorted 0,1,1,2,38 -> MAD 1; 38*2 > 7*1 -> flag
    rows = [("a", i, v) for i, v in enumerate([10, 12, 11, 13, 50])]
    out = {r.w: r for r in mad_anomaly(_series(spark, rows), ["k"], "w", "v").collect()}
    assert all(out[i].med == 12 and out[i].mad == 1 for i in range(5))
    assert [out[i].is_anomaly for i in range(5)] == [False, False, False, False, True]
    assert out[4].abs_dev == 38


def test_mad_degenerate_zero_mad_flags_any_deviation(spark):
    rows = [("a", i, 5) for i in range(4)] + [("a", 9, 6)]
    out = {r.w: r.is_anomaly for r in mad_anomaly(_series(spark, rows), ["k"], "w", "v").collect()}
    assert out == {0: False, 1: False, 2: False, 3: False, 9: True}


def test_mad_null_values_excluded_from_median_and_unscored(spark):
    # a NULL value must not shift the median rank (it would otherwise
    # sort first and displace the pick) and comes back is_anomaly=NULL
    rows = [("a", 0, 10), ("a", 1, None), ("a", 2, 12), ("a", 3, 11),
            ("a", 4, 13), ("a", 5, 50)]
    out = {r.w: r for r in mad_anomaly(_series(spark, rows), ["k"], "w", "v").collect()}
    # non-null values 10,11,12,13,50 -> lower median 12, MAD 1 (unchanged
    # from the hand-computed case despite the NULL row)
    assert all(out[i].med == 12 and out[i].mad == 1 for i in (0, 2, 3, 4, 5))
    assert out[5].is_anomaly is True
    assert out[1].is_anomaly is None and out[1].abs_dev is None


def test_mad_threshold_boundary_and_keys(spark):
    # devs 0,0,4 around med 10 with MAD 0 -> uses 7/2: 4*2 > 7*0 flags;
    # with num=0 every nonzero dev flags; strict > means dev==0 never flags
    rows = [("a", 0, 10), ("a", 1, 10), ("a", 2, 14), ("b", 0, 1)]
    out = mad_anomaly(_series(spark, rows), ["k"], "w", "v", 0, 1).collect()
    got = {(r.k, r.w): r.is_anomaly for r in out}
    assert got == {("a", 0): False, ("a", 1): False, ("a", 2): True, ("b", 0): False}
    with pytest.raises(ValueError):
        mad_anomaly(_series(spark, rows), [], "w", "v")
    with pytest.raises(ValueError):
        mad_anomaly(_series(spark, rows), ["k"], "w", "v", -1, 2)


def _cusum_naive(vals, target, slack, h):
    s_hi = s_lo = 0
    out = []
    for v in vals:
        s_hi = max(0, s_hi + (v - target - slack))
        s_lo = max(0, s_lo + (target - v - slack))
        out.append((s_hi, s_lo, s_hi >= h, s_lo >= h))
    return out


def test_cusum_matches_recursion(spark):
    vals = [10, 11, 9, 10, 15, 16, 17, 10, 3, 2, 10, 10]
    rows = [("a", i, v) for i, v in enumerate(vals)]
    out = cusum_changepoints(_series(spark, rows), ["k"], "w", "v", 10, 1, 8)
    got = [
        (r.s_high, r.s_low, r.alarm_high, r.alarm_low)
        for r in out.orderBy("w").collect()
    ]
    assert got == _cusum_naive(vals, 10, 1, 8)
    assert any(r[2] for r in got) and any(r[3] for r in got)


def test_cusum_keys_independent_and_validation(spark):
    rows = [("a", 0, 100), ("b", 0, 10)]
    out = {r.k: r.s_high for r in cusum_changepoints(_series(spark, rows), ["k"], "w", "v", 10, 0, 5).collect()}
    assert out == {"a": 90, "b": 0}
    with pytest.raises(ValueError):
        cusum_changepoints(_series(spark, rows), ["k"], "w", "v", 10, 0, 0)
    with pytest.raises(ValueError):
        cusum_changepoints(_series(spark, rows), ["k"], "w", "v", 10, -1, 5)


def test_validate_counts_and_ppm(spark):
    df = spark.createDataFrame(
        [(1, "x", 5.0), (2, "y", -1.0), (3, None, 2.0), (None, "x", 0.5)],
        "id long, cat string, v double",
    )
    out = {
        r.rule: (r.n_rows, r.n_violations, r.violation_ppm)
        for r in validate_expectations(
            df,
            {
                "id_not_null": F.col("id").isNotNull(),
                "v_positive": F.col("v") > 0,
                "cat_known": F.col("cat").isin("x", "y"),
            },
        ).collect()
    }
    assert out["id_not_null"] == (4, 1, 250_000)
    assert out["v_positive"] == (4, 1, 250_000)
    # NULL cat: predicate is NULL -> counts as a violation
    assert out["cat_known"] == (4, 1, 250_000)


def test_validate_null_predicate_is_violation_and_empty(spark):
    df = spark.createDataFrame([(None,), (2,)], "v int")
    out = validate_expectations(df, {"in_range": F.col("v") < 10}).collect()[0]
    assert (out.n_violations, out.violation_ppm) == (1, 500_000)
    empty = validate_expectations(
        df.where(F.lit(False)), {"any": F.lit(True)}
    ).collect()[0]
    assert (empty.n_rows, empty.n_violations, empty.violation_ppm) == (0, 0, 0)
    with pytest.raises(ValueError):
        validate_expectations(df, {})


def test_template_novelty_periods(spark):
    from opentelemetry_collector_components_spark.operators.textmine import (
        template_novelty,
    )

    rows = [
        # day 1: two templates (err code=<NUM>, ok) -> both new
        ("2024-01-01 10:00:00", "err code=17"),
        ("2024-01-01 11:00:00", "err code=99"),
        ("2024-01-01 12:00:00", "ok"),
        # day 2: err recurs (not new), one genuinely new template
        ("2024-01-02 10:00:00", "err code=3"),
        ("2024-01-02 10:05:00", "warn disk full"),
    ]
    df = spark.createDataFrame(rows, "ts string, text string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {
        str(r.period)[:10]: (r.n_lines, r.n_templates, r.n_new_templates)
        for r in template_novelty(df).collect()
    }
    assert out == {"2024-01-01": (3, 2, 2), "2024-01-02": (2, 2, 1)}
