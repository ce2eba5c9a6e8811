"""Out-of-fold target encoding: hand-replayed fold hash + exact
m-estimate arithmetic, pure-prior single-fold category, leakage
accounting, validation."""

from __future__ import annotations

import hashlib

import pytest


def _fold(unit, folds=5, salt="te"):
    return int(hashlib.md5(f"{salt}:{unit}".encode()).hexdigest()[:15], 16) % folds


def test_target_encode_exact_replay(spark):
    from opentelemetry_collector_components_spark.operators.encoding import (
        target_encode,
    )

    rows = [(u, "a" if u % 3 else "b", 1 if u % 2 else 0)
            for u in range(200)]
    df = spark.createDataFrame(rows, "unit long, cat string, y long")
    got = {(r.cat, r.fold): (r.n_oof, r.enc_ppm)
           for r in target_encode(df, "cat", "y", "unit",
                                  m=20, folds=5).collect()}

    # pure-python replay of the definition
    stats: dict = {}
    for u, cat, y in rows:
        f = _fold(u)
        s, n = stats.get((cat, f), (0, 0))
        stats[(cat, f)] = (s + y, n + 1)
    tot = {}
    for (cat, f), (s, n) in stats.items():
        ts, tn = tot.get(cat, (0, 0))
        tot[cat] = (ts + s, tn + n)
    gs = sum(s for s, _ in stats.values())
    gn = sum(n for _, n in stats.values())
    prior = (gs * 1_000_000) // gn
    for (cat, f), (s, n) in stats.items():
        ts, tn = tot[cat]
        want = ((ts - s) * 1_000_000 + 20 * prior) // (tn - n + 20)
        assert got[(cat, f)] == (tn - n, want), (cat, f)
    assert set(got) == set(stats)


def test_target_encode_single_fold_category_gets_prior(spark):
    from opentelemetry_collector_components_spark.operators.encoding import (
        target_encode,
    )

    # 'solo' appears only via unit 7 (one fold): its out-of-fold stats
    # are empty, so the encoding is exactly the global prior
    rows = [(u, "big", 1 if u % 4 == 0 else 0) for u in range(100)]
    rows += [(7, "solo", 1)]
    df = spark.createDataFrame(rows, "unit long, cat string, y long")
    out = {(r.cat, r.fold): r for r in
           target_encode(df, "cat", "y", "unit", m=10, folds=5).collect()}
    gs = sum(y for *_, y in rows)
    prior = (gs * 1_000_000) // len(rows)
    solo = out[("solo", _fold(7))]
    assert solo.n_oof == 0 and solo.enc_ppm == prior

    with pytest.raises(ValueError):
        target_encode(df, "cat", "y", "unit", m=0)
    with pytest.raises(ValueError):
        target_encode(df, "cat", "y", "unit", folds=1)
