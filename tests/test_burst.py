"""Kleinberg two-state burst detection: planted-burst recovery,
flap resistance (mid-burst dip stays inside the episode), entry-cost
effect, drop rules, validation."""

from __future__ import annotations

import pytest


def _series(spark, counts, key="k"):
    return spark.createDataFrame(
        [(key, i, c) for i, c in enumerate(counts)],
        "k string, t long, c long",
    )


def test_burst_recovers_planted_window(spark):
    from opentelemetry_collector_components_spark.operators.burst import (
        kleinberg_bursts,
    )

    counts = [2, 2, 2, 2, 12, 12, 12, 12, 12, 2, 2, 2]
    out = kleinberg_bursts(
        _series(spark, counts), ["k"], "t", "c", s=3.0, gamma=1.0
    ).collect()
    states = {r.i: r.state for r in out}
    assert [states[i] for i in range(1, 13)] == \
        [0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0]
    assert {r.c for r in out if r.state == 1} == {12}


def test_burst_gamma_controls_episode_smoothing(spark):
    from opentelemetry_collector_components_spark.operators.burst import (
        kleinberg_bursts,
    )

    # one sub-threshold bin INSIDE a strong burst: at gamma=2 paying
    # the re-entry toll twice is dearer than riding through the dip
    # (one contiguous episode); at gamma=0.5 re-entry is cheap and the
    # optimal path splits into two episodes around the dip
    dip = [1, 1, 20, 20, 12, 20, 20, 1, 1, 1, 1]
    bridged = {r.i: r.state for r in kleinberg_bursts(
        _series(spark, dip), ["k"], "t", "c", s=3.0, gamma=2.0
    ).collect()}
    assert [bridged[i] for i in range(1, 12)] == \
        [0, 0, 1, 1, 1, 1, 1, 0, 0, 0, 0]
    split = {r.i: r.state for r in kleinberg_bursts(
        _series(spark, dip), ["k"], "t", "c", s=3.0, gamma=0.5
    ).collect()}
    assert [split[i] for i in range(1, 12)] == \
        [0, 0, 1, 1, 0, 1, 1, 0, 0, 0, 0]
    # single elevated bin in a long quiet series: gamma=1 suppresses
    # the one-bin episode, gamma=0.1 lets it fire
    blip = [2] * 20 + [6] + [2] * 20
    quiet = {r.i: r.state for r in kleinberg_bursts(
        _series(spark, blip), ["k"], "t", "c", s=3.0, gamma=1.0
    ).collect()}
    assert set(quiet.values()) == {0}
    fired = {r.i: r.state for r in kleinberg_bursts(
        _series(spark, blip), ["k"], "t", "c", s=3.0, gamma=0.1
    ).collect()}
    assert fired[21] == 1 and sum(fired.values()) == 1


def test_burst_drop_and_validation(spark):
    from opentelemetry_collector_components_spark.operators.burst import (
        kleinberg_bursts,
    )

    # single bin or all-zero total: dropped
    assert kleinberg_bursts(
        _series(spark, [5]), ["k"], "t", "c"
    ).count() == 0
    assert kleinberg_bursts(
        _series(spark, [0, 0, 0]), ["k"], "t", "c"
    ).count() == 0
    df = _series(spark, [1, 2])
    with pytest.raises(ValueError):
        kleinberg_bursts(df, ["k"], "t", "c", s=1.0)
    with pytest.raises(ValueError):
        kleinberg_bursts(df, ["k"], "t", "c", gamma=-0.5)


# ---------------------------------------------------------------------------
# burstiness_index
# ---------------------------------------------------------------------------
def test_burstiness_classifies_and_matches_reference(spark):
    import random

    from opentelemetry_collector_components_spark.operators.burst import (
        burstiness_index,
    )

    rng = random.Random(8)
    rows = [("steady", i, rng.randint(8, 12)) for i in range(50)]
    rows += [("bursty", i, 0 if i % 10 else 100) for i in range(50)]
    rows += [("clocked", i, 10) for i in range(50)]
    rows += [("silent", 1, 0)]
    df = spark.createDataFrame(rows, ["k", "w", "c"])
    out = {r["k"]: r for r in burstiness_index(df, ["k"], "c").collect()}

    assert "silent" not in out  # zero total dropped
    vals = [c for k, _, c in rows if k == "steady"]
    n, S, Q = len(vals), sum(vals), sum(v * v for v in vals)
    r = out["steady"]
    assert (r["n"], r["total"], r["sumsq"], r["fano_num"]) == (n, S, Q, n * Q - S * S)
    assert r["fano"] == round((n * Q - S * S) / (n * S), 4)
    assert r["cv2"] == round((n * Q - S * S) / (S * S), 4)
    # classification: clumped >> poissonish > clocked (zero variance)
    assert out["bursty"]["fano"] > 50
    assert out["clocked"]["fano"] == 0.0
    assert 0 < out["steady"]["fano"] < 1


def test_burstiness_validation(spark):
    import pytest

    from opentelemetry_collector_components_spark.operators.burst import (
        burstiness_index,
    )

    df = spark.createDataFrame([("a", 1)], ["k", "c"])
    with pytest.raises(ValueError, match="key_cols"):
        burstiness_index(df, [], "c")
