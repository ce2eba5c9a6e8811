"""Multi-touch attribution: hand-checked credits on a planted journey,
exact linear reconciliation, window edges, direct bucket, validation."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )


def test_first_last_linear_credits_hand_checked(spark):
    from opentelemetry_collector_components_spark.operators.attribution import (
        attribute_conversions,
    )

    t0 = datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        # u1: view -> click -> click -> purchase (3 touches)
        (1, t0, "view", 10),
        (1, t0 + timedelta(hours=1), "click", 11),
        (1, t0 + timedelta(hours=2), "click", 12),
        (1, t0 + timedelta(hours=3), "purchase", 13),
        # u2: no touches -> direct
        (2, t0, "purchase", 20),
        # u3: one view exactly at the 48h window start (inclusive)
        (3, t0, "view", 30),
        (3, t0 + timedelta(hours=48), "purchase", 31),
        # u4: touch exactly AT the conversion ts -> not a touch (strict <)
        (4, t0, "purchase", 40),
        (4, t0, "click", 41),
    ]
    out = {r.channel: r for r in attribute_conversions(
        _df(spark, rows), "user_id", "ts", "event_type", "event_id",
        "purchase", ["view", "click", "signup"], 172800,
    ).collect()}

    # u1: first=view, last=click; linear: 333333 view, click gets
    # 333333 + (333333 + remainder 1) = 666667
    # u3: view opens AND closes its conversion (1000000 linear)
    assert (out["view"].first_touch, out["view"].last_touch) == (2, 1)
    assert out["click"].first_touch == 0 and out["click"].last_touch == 1
    assert out["view"].linear_micro == 333_333 + 1_000_000
    assert out["click"].linear_micro == 666_667
    assert out["(direct)"].first_touch == 2  # u2 and u4
    assert out["(direct)"].linear_micro == 2_000_000
    # reconciliation: every model sums to the 4 conversions
    assert sum(r.first_touch for r in out.values()) == 4
    assert sum(r.last_touch for r in out.values()) == 4
    assert sum(r.linear_micro for r in out.values()) == 4_000_000


def test_window_excludes_older_touches(spark):
    from opentelemetry_collector_components_spark.operators.attribution import (
        attribute_conversions,
    )

    t0 = datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        (1, t0, "view", 1),                                # outside 1h window
        (1, t0 + timedelta(minutes=90), "click", 2),        # inside
        (1, t0 + timedelta(minutes=120), "purchase", 3),
    ]
    out = {r.channel: r for r in attribute_conversions(
        _df(spark, rows), "user_id", "ts", "event_type", "event_id",
        "purchase", ["view", "click"], 3600,
    ).collect()}
    assert "view" not in {c for c, r in out.items() if r.first_touch > 0}
    assert out["click"].first_touch == 1 and out["click"].linear_micro == 1_000_000


def test_attribution_validation(spark):
    from opentelemetry_collector_components_spark.operators.attribution import (
        attribute_conversions,
    )

    df = _df(spark, [(1, datetime(2024, 1, 1), "purchase", 1)])
    with pytest.raises(ValueError):
        attribute_conversions(df, "user_id", "ts", "event_type", "event_id",
                              "purchase", ["purchase"], 3600)
    with pytest.raises(ValueError):
        attribute_conversions(df, "user_id", "ts", "event_type", "event_id",
                              "purchase", [], 3600)
    with pytest.raises(ValueError):
        attribute_conversions(df, "user_id", "ts", "event_type", "event_id",
                              "purchase", ["view"], 0)
