"""Alert for-duration state machine, SLO burn rate, service dependency
map: hand-checked transitions, gap resets, edge resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.alerts import (
    alert_for_duration,
    slo_burn_rate,
)
from opentelemetry_collector_components_spark.operators.servicemap import (
    service_dependency_edges,
)


def _metrics(spark, rows):
    return spark.createDataFrame(rows, "svc string, w long, v double")


def test_for_duration_pending_then_firing(spark):
    # threshold 5, for 2: w0 ok, w1 pending, w2 fires, w3 still firing,
    # w4 resolves.
    rows = [("a", 0, 1.0), ("a", 1, 9.0), ("a", 2, 9.0), ("a", 3, 9.0), ("a", 4, 1.0)]
    out = (
        alert_for_duration(_metrics(spark, rows), ["svc"], "w", "v", 5.0, 2)
        .orderBy("w")
        .collect()
    )
    assert [r.state for r in out] == ["ok", "pending", "firing", "firing", "ok"]
    assert [r.transition for r in out] == [None, None, "fires", None, "resolves"]
    assert [r.streak for r in out] == [0, 1, 2, 3, 0]


def test_for_duration_gap_resets_streak(spark):
    # breaches at w0, w1, then a GAP (w3 missing -> w4): streak restarts.
    rows = [("a", 0, 9.0), ("a", 1, 9.0), ("a", 3, 9.0), ("a", 4, 9.0)]
    out = (
        alert_for_duration(_metrics(spark, rows), ["svc"], "w", "v", 5.0, 3)
        .orderBy("w")
        .collect()
    )
    assert [r.streak for r in out] == [1, 2, 1, 2]
    assert all(r.state == "pending" for r in out)


def test_for_duration_keys_independent_and_ops(spark):
    rows = [("a", 0, 9.0), ("b", 0, 1.0), ("b", 1, 1.0)]
    out = alert_for_duration(
        _metrics(spark, rows), ["svc"], "w", "v", 5.0, 1, op="<"
    )
    got = {(r.svc, r.w): r.state for r in out.collect()}
    assert got == {("a", 0): "ok", ("b", 0): "firing", ("b", 1): "firing"}
    with pytest.raises(ValueError):
        alert_for_duration(_metrics(spark, rows), ["svc"], "w", "v", 5.0, 0)
    with pytest.raises(ValueError):
        alert_for_duration(_metrics(spark, rows), ["svc"], "w", "v", 5.0, 1, op="!=")


def _counts(spark, rows):
    return spark.createDataFrame(rows, "svc string, w long, bad long, total long")


def test_burn_rate_exact_micro_units(spark):
    # budget = 0.001; w1 short frame: 2/1000 bad -> burn 2.0 exactly.
    rows = [("a", 0, 0, 1000), ("a", 1, 2, 1000), ("a", 2, 0, 1000)]
    out = (
        slo_burn_rate(
            _counts(spark, rows), ["svc"], "w", "bad", "total",
            slo_target=0.999, short_windows=1, long_windows=3, burn_factor=1.5,
        )
        .orderBy("w")
        .collect()
    )
    # (2/1000)/(1-0.999) = 1.999999... in IEEE doubles; FLOOR(1e6*x)
    assert out[1].short_burn_micro == 1_999_999
    assert out[1].short_burn == 1.999999


def test_burn_rate_page_requires_both_windows(spark):
    rows = [("a", 0, 0, 1000), ("a", 1, 2, 1000), ("a", 2, 0, 1000)]
    out = (
        slo_burn_rate(
            _counts(spark, rows), ["svc"], "w", "bad", "total",
            slo_target=0.999, short_windows=1, long_windows=3, burn_factor=1.5,
        )
        .orderBy("w")
        .collect()
    )
    # w1: short burn 2.0 >= 1.5 but long burn (0+2)/(2000)/0.001 = 1.0 < 1.5
    assert out[1].short_burn_micro >= 1_500_000
    assert out[1].long_burn_micro < 1_500_000
    assert not out[1].page
    # zero-denominator windows yield NULL burns, never a crash
    z = slo_burn_rate(
        _counts(spark, [("z", 0, 0, 0)]), ["svc"], "w", "bad", "total"
    ).collect()[0]
    # page must be a real False (matching the oracle's COALESCE), not a
    # NULL that Python truthiness would also pass
    assert z.short_burn_micro is None and z.page is False
    with pytest.raises(ValueError):
        slo_burn_rate(_counts(spark, rows), ["svc"], "w", "bad", "total", slo_target=1.0)
    with pytest.raises(ValueError):
        slo_burn_rate(
            _counts(spark, rows), ["svc"], "w", "bad", "total",
            short_windows=3, long_windows=2,
        )


def _spans(spark, rows):
    return spark.createDataFrame(
        rows,
        "span_id string, parent_span_id string, service string, "
        "destination string, duration_us long",
    )


def test_service_map_internal_external_edges(spark):
    rows = [
        ("s1", "", "front", None, 100),        # root txn
        ("s2", "s1", "front", "db-main", 40),  # exit span, child below
        ("s3", "s2", "orders", None, 30),      # downstream txn -> internal edge
        ("s4", "s1", "front", "redis", 5),     # exit span, nothing downstream
        ("s5", "s1", "front", None, 7),        # in-process child, no dest: no edge
    ]
    out = service_dependency_edges(
        _spans(spark, rows), duration_col="duration_us"
    ).collect()
    got = {(r.source, r.target, r.edge_type): (r.n_calls, r.sum_duration_us) for r in out}
    assert got == {
        ("front", "orders", "internal"): (1, 30),
        ("front", "redis", "external"): (1, 5),
    }


def test_service_map_same_service_child_is_not_an_edge(spark):
    rows = [
        ("s1", "", "a", None, 1),
        ("s2", "s1", "a", "ext", 2),  # exit span, but resolved by s3 below
        ("s3", "s2", "a", None, 3),   # same-service downstream -> no edge at all
    ]
    out = service_dependency_edges(_spans(spark, rows)).collect()
    assert out == []
