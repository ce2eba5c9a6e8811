"""Holt linear-trend forecast: recurrence correctness against a hand
recurrence, exact-trend series recovery, horizon extrapolation, edge
rules (short keys, validation)."""

from __future__ import annotations

import pytest


def _holt_reference(ys, alpha, beta, horizon):
    """Plain-Python replay of the documented recurrence."""
    lev, tr = ys[0], ys[1] - ys[0]
    rows = []
    for i in range(1, len(ys)):
        yhat = lev + tr
        lev_new = alpha * ys[i] + (1.0 - alpha) * (lev + tr)
        tr_new = beta * (lev_new - lev) + (1.0 - beta) * tr
        rows.append((i + 1, ys[i], lev_new, tr_new, yhat))
        lev, tr = lev_new, tr_new
    for h in range(1, horizon + 1):
        rows.append((len(ys) + h, None, None, None, lev + h * tr))
    return rows


def test_holt_matches_hand_recurrence(spark):
    from opentelemetry_collector_components_spark.operators.forecast import (
        holt_forecast,
    )

    ys = [4.0, 7.0, 5.0, 9.0, 11.0, 8.0]
    df = spark.createDataFrame(
        [("k", i, y) for i, y in enumerate(ys)], "k string, t long, y double"
    )
    out = holt_forecast(df, ["k"], "t", "y", alpha=0.5, beta=0.25, horizon=3)
    got = {r.i: (r.y, r.level, r.trend, r.yhat) for r in out.collect()}
    for i, y, lev, tr, yhat in _holt_reference(ys, 0.5, 0.25, 3):
        gy, glev, gtr, gyhat = got[i]
        assert gy == (None if y is None else pytest.approx(y))
        if lev is None:
            assert glev is None and gtr is None
        else:
            assert glev == pytest.approx(round(lev, 4))
            assert gtr == pytest.approx(round(tr, 4))
        assert gyhat == pytest.approx(round(yhat, 4))
    assert set(got) == set(range(2, len(ys) + 3 + 1))


def test_holt_recovers_exact_linear_trend(spark):
    from opentelemetry_collector_components_spark.operators.forecast import (
        holt_forecast,
    )

    # y = 10 + 3t: level/trend lock on immediately and every fit + every
    # horizon step is exact — the sanity property of any trend model
    df = spark.createDataFrame(
        [("k", t, 10.0 + 3.0 * t) for t in range(8)],
        "k string, t long, y double",
    )
    out = holt_forecast(df, ["k"], "t", "y", horizon=4).collect()
    for r in out:
        assert r.yhat == pytest.approx(10.0 + 3.0 * (r.i - 1))
        if r.trend is not None:
            assert r.trend == pytest.approx(3.0)


def test_holt_short_keys_dropped_and_keys_independent(spark):
    from opentelemetry_collector_components_spark.operators.forecast import (
        holt_forecast,
    )

    df = spark.createDataFrame(
        [("solo", 0, 5.0), ("pair", 0, 1.0), ("pair", 1, 2.0)],
        "k string, t long, y double",
    )
    out = holt_forecast(df, ["k"], "t", "y", horizon=2).collect()
    assert {r.k for r in out} == {"pair"}
    # n=2: one fitted row (i=2, yhat = l1+b1 = y2) + two horizon rows
    fitted = [r for r in out if r.y is not None]
    assert [(r.i, r.yhat) for r in fitted] == [(2, 2.0)]
    assert sorted(r.i for r in out) == [2, 3, 4]


def test_holt_validation(spark):
    from opentelemetry_collector_components_spark.operators.forecast import (
        holt_forecast,
    )

    df = spark.createDataFrame([("k", 0, 1.0)], "k string, t long, y double")
    with pytest.raises(ValueError):
        holt_forecast(df, ["k"], "t", "y", alpha=0.0)
    with pytest.raises(ValueError):
        holt_forecast(df, ["k"], "t", "y", beta=1.5)
    with pytest.raises(ValueError):
        holt_forecast(df, ["k"], "t", "y", horizon=-1)


def _hw_reference(ys, p, a, b, g, h):
    lev = sum(ys[:p]) / p
    tr = (sum(ys[p:2 * p]) / p - sum(ys[:p]) / p) / p
    season = [y - lev for y in ys[:p]]
    rows = []
    for t in range(p, len(ys)):
        y = ys[t]
        s_old = season[0]
        yhat = lev + tr + s_old
        lev_new = a * (y - s_old) + (1 - a) * (lev + tr)
        tr_new = b * (lev_new - lev) + (1 - b) * tr
        s_new = g * (y - lev_new) + (1 - g) * s_old
        season = season[1:] + [s_new]
        rows.append((t + 1, yhat, lev_new, tr_new, s_new))
        lev, tr = lev_new, tr_new
    fut = [(len(ys) + i, lev + i * tr + season[(i - 1) % p])
           for i in range(1, h + 1)]
    return rows, fut


def test_holt_winters_matches_reference_and_tracks_seasonality(spark):
    from opentelemetry_collector_components_spark.operators.forecast import (
        holt_winters_forecast,
    )

    # period-4 seasonal pattern with upward trend: base t + [10,0,-5,-5]
    season_shape = [10.0, 0.0, -5.0, -5.0]
    ys = [t + season_shape[t % 4] for t in range(16)]
    df = spark.createDataFrame(
        [("k", t, y) for t, y in enumerate(ys)], "k string, t long, y double"
    )
    out = holt_winters_forecast(
        df, ["k"], "t", "y", period=4, alpha=0.5, beta=0.25, gamma=0.25,
        horizon=4,
    ).collect()
    ref_rows, ref_fut = _hw_reference(ys, 4, 0.5, 0.25, 0.25, 4)
    got_fit = {r.i: (r.yhat, r.level, r.trend, r.seasonal)
               for r in out if r.y is not None}
    assert set(got_fit) == {i for i, *_ in ref_rows}
    for i, yhat, lev, tr, s in ref_rows:
        for got, want in zip(got_fit[i], (yhat, lev, tr, s)):
            assert got == round(want, 4), (i, got, want)
    got_fut = {r.i: r.yhat for r in out if r.y is None}
    assert got_fut == {i: round(v, 4) for i, v in ref_fut}
    # the forecast must reproduce the seasonal dips, not a flat trend:
    # horizon step for phase 0 (high season) > phase 2 (low season)
    assert got_fut[17] > got_fut[19]


def test_holt_winters_drop_and_validation(spark):
    from opentelemetry_collector_components_spark.operators.forecast import (
        holt_winters_forecast,
    )

    # 7 points < 2*period=8: key dropped entirely
    df = spark.createDataFrame(
        [("k", t, float(t)) for t in range(7)], "k string, t long, y double"
    )
    assert holt_winters_forecast(df, ["k"], "t", "y", period=4).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        holt_winters_forecast(df, ["k"], "t", "y", period=1)
    with _pytest.raises(ValueError):
        holt_winters_forecast(df, ["k"], "t", "y", period=4, gamma=1.5)
    with _pytest.raises(ValueError):
        holt_winters_forecast(df, ["k"], "t", "y", period=4, horizon=-1)


# --- rolling-origin backtest ------------------------------------------------
from opentelemetry_collector_components_spark.operators.forecast import (  # noqa: E402
    holt_backtest,
)


def test_backtest_hand_checked(spark):
    # perfectly linear series: Holt fits it exactly -> zero error, and the
    # naive walk errs by the slope each step -> mase_milli == 0
    rows = [("k", i, 10.0 + 3.0 * i) for i in range(12)]
    df = spark.createDataFrame(rows, "k string, t long, y double")
    # 12 points -> fitted i = 2..12; warmup 2 -> eval i >= 4: 9 points
    r = holt_backtest(df, ["k"], "t", "y", warmup=2).collect()[0]
    assert (r.n_eval, r.sum_abs_e4, r.bias_e4, r.sse_e8) == (9, 0, 0, 0)
    assert r.mase_milli == 0


def test_backtest_constant_series_null_mase(spark):
    rows = [("k", i, 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, t long, y double")
    r = holt_backtest(df, ["k"], "t", "y", warmup=2).collect()[0]
    assert r.sum_abs_e4 == 0 and r.mase_milli is None  # naive denom zero


def test_backtest_warmup_and_drop(spark):
    rows = [("a", i, float(i * i)) for i in range(6)] + [("b", 0, 1.0)]
    df = spark.createDataFrame(rows, "k string, t long, y double")
    got = {r.k: r for r in holt_backtest(df, ["k"], "t", "y", warmup=3).collect()}
    # a: fitted i=2..6, warmup 3 -> eval i in {5, 6} = 2 points
    assert got["a"].n_eval == 2
    assert "b" not in got  # single point: nothing evaluable
    # all-warmup keys drop too
    assert holt_backtest(df, ["k"], "t", "y", warmup=50).count() == 0


def test_backtest_validation(spark):
    df = spark.createDataFrame([("k", 0, 1.0)], "k string, t long, y double")
    import pytest as _pt
    with _pt.raises(ValueError, match="warmup"):
        holt_backtest(df, ["k"], "t", "y", warmup=-1)
    with _pt.raises(ValueError, match="alpha"):
        holt_backtest(df, ["k"], "t", "y", alpha=0.0)
