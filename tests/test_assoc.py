"""Association mining: hand-checked metrics on planted baskets,
duplicate-row dedup, basket-size cap, min-support pruning,
validation."""

from __future__ import annotations

import pytest


def test_assoc_metrics_hand_checked(spark):
    from opentelemetry_collector_components_spark.operators.assoc import (
        pair_associations,
    )

    # 4 baskets: {A,B}, {A,B}, {A,C}, {B} (plus a duplicate (1,A) row
    # that distinct must collapse)
    rows = [
        (1, "A"), (1, "A"), (1, "B"),
        (2, "A"), (2, "B"),
        (3, "A"), (3, "C"),
        (4, "B"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {(r.item_a, r.item_b): r for r in pair_associations(
        df, "basket", "item", min_support=1
    ).collect()}
    ab = out[("A", "B")]
    # n_a=3, n_b=3, n_ab=2, N=4
    assert (ab.n_ab, ab.n_a, ab.n_b) == (2, 3, 3)
    assert ab.jaccard_ppm == 2 * 1_000_000 // 4        # 500000
    assert ab.confidence_ppm == 2 * 1_000_000 // 3     # 666666
    assert ab.lift_ppm == 2 * 4 * 1_000_000 // 9       # 888888
    ac = out[("A", "C")]
    assert (ac.n_ab, ac.lift_ppm) == (1, 1 * 4 * 1_000_000 // 3)
    # min_support=2 prunes the A-C pair
    pruned = {(r.item_a, r.item_b) for r in pair_associations(
        df, "basket", "item", min_support=2
    ).collect()}
    assert pruned == {("A", "B")}


def test_assoc_basket_cap_and_validation(spark):
    from opentelemetry_collector_components_spark.operators.assoc import (
        pair_associations,
    )

    # basket 1 has 5 items (> cap 4) -> dropped entirely; basket 2 pairs
    rows = [(1, f"i{j}") for j in range(5)] + [(2, "x"), (2, "y")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = pair_associations(
        df, "basket", "item", min_support=1, max_basket_size=4
    ).collect()
    assert [(r.item_a, r.item_b, r.n_ab) for r in out] == [("x", "y", 1)]
    # and the dropped basket no longer counts toward N (lift denominator)
    assert out[0].lift_ppm == 1 * 1 * 1_000_000 // 1

    with pytest.raises(ValueError):
        pair_associations(df, "basket", "item", min_support=0)
    with pytest.raises(ValueError):
        pair_associations(df, "basket", "item", max_basket_size=1)
