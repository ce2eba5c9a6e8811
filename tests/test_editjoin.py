"""PassJoin edit-distance self-join: hand-checked pairs, brute-force
parity on a generated corpus (the completeness proof the segment
windows must uphold), short-string pool, duplicate strings, validation."""

from __future__ import annotations

import pytest


def _brute(strings: dict, k: int) -> set:
    def ed(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    ids = sorted(strings)
    out = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            d = ed(strings[ids[x]], strings[ids[y]])
            if d <= k:
                out.add((ids[x], ids[y], d))
    return out


def test_edit_join_hand_checked(spark):
    from opentelemetry_collector_components_spark.operators.editjoin import (
        edit_distance_join,
    )

    rows = [
        (1, "kitten"), (2, "sitten"), (3, "sittin"),   # 1-2: 1, 2-3: 1, 1-3: 2
        (4, "banana"), (5, "bananas"),                  # 4-5: 1
        (6, "zzzzzzzz"),                                # pairs with nobody
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {(r.id_a, r.id_b, r.dist)
           for r in edit_distance_join(df, "id", "s", k=2).collect()}
    assert got == {(1, 2, 1), (2, 3, 1), (1, 3, 2), (4, 5, 1)}


def test_edit_join_matches_brute_force(spark):
    from opentelemetry_collector_components_spark.operators.editjoin import (
        edit_distance_join,
    )

    # deterministic corpus rich in near-misses: numeric suffix slips,
    # shared prefixes, length-1/2 strings, duplicates under two ids
    strings = {}
    i = 0
    for n in range(40):
        for pat in (f"host-{n}", f"host{n}", f"hst-{n}", f"host-{n}x"):
            strings[i] = pat
            i += 1
    for s in ("a", "b", "ab", "ba", "", "a"):
        strings[i] = s
        i += 1
    df = spark.createDataFrame(
        sorted(strings.items()), "id long, s string"
    ).repartition(7)
    for k in (1, 2):
        got = {(r.id_a, r.id_b, r.dist)
               for r in edit_distance_join(df, "id", "s", k=k).collect()}
        assert got == _brute(strings, k), f"k={k}"


def test_edit_join_validation(spark):
    from opentelemetry_collector_components_spark.operators.editjoin import (
        edit_distance_join,
    )

    df = spark.createDataFrame([(1, "x")], "id long, s string")
    with pytest.raises(ValueError):
        edit_distance_join(df, "id", "s", k=0)
    # NULL strings ignored, no pairs from a single row
    ndf = spark.createDataFrame([(1, "abc"), (2, None)], "id long, s string")
    assert edit_distance_join(ndf, "id", "s", k=2).count() == 0
