from __future__ import annotations

import pytest


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, t long, y long")


def test_recovers_pure_seasonal_signal(spark):
    from opentelemetry_collector_components_spark.operators.decompose import (
        seasonal_decompose,
    )

    # flat level 100 plus a period-4 pattern [+10, 0, -10, 0]
    pat = [10, 0, -10, 0]
    rows = [("k", t, 100 + pat[t % 4]) for t in range(24)]
    out = seasonal_decompose(_mk(spark, rows), ["k"], "t", "y", period=4)
    got = {r["t"]: r for r in out.collect()}
    # edges: first/last h=2 points have no full window
    for t in (0, 1, 22, 23):
        assert got[t]["trend_micro"] is None
        assert got[t]["remainder_micro"] is None
    for t in range(2, 22):
        assert got[t]["trend_micro"] == 100_000_000
        assert got[t]["seasonal_micro"] == pat[t % 4] * 1_000_000
        assert got[t]["remainder_micro"] == 0


def test_gap_gives_null_trend(spark):
    from opentelemetry_collector_components_spark.operators.decompose import (
        seasonal_decompose,
    )

    rows = [("k", t, 10) for t in range(12) if t != 6]
    out = seasonal_decompose(_mk(spark, rows), ["k"], "t", "y", period=4)
    got = {r["t"]: r["trend_micro"] for r in out.collect()}
    # any window spanning the missing t=6 is incomplete
    for t in (4, 5, 7, 8):
        assert got[t] is None
    assert got[2] == 10_000_000


def test_odd_period_plain_ma(spark):
    from opentelemetry_collector_components_spark.operators.decompose import (
        seasonal_decompose,
    )

    rows = [("k", t, t) for t in range(9)]  # linear: MA == center value
    out = seasonal_decompose(_mk(spark, rows), ["k"], "t", "y", period=3)
    got = {r["t"]: r for r in out.collect()}
    for t in range(1, 8):
        assert got[t]["trend_micro"] == t * 1_000_000
    with pytest.raises(ValueError):
        seasonal_decompose(_mk(spark, rows), ["k"], "t", "y", period=1)


def test_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.decompose import (
        seasonal_decompose,
        seasonal_decompose_oracle_sql,
    )

    rows = []
    for k, m in (("a", 3), ("b", 5)):
        for t in range(30):
            rows.append((k, t, 50 + (t * m) % 7 + t // 3))
    out = seasonal_decompose(_mk(spark, rows), ["k"], "t", "y", period=6)
    spark_rows = {
        (r["k"], r["t"]): (r["phase"], r["trend_micro"],
                           r["seasonal_micro"], r["remainder_micro"])
        for r in out.collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE s AS SELECT * FROM (VALUES "
        + ", ".join(f"('{k}', {t}, {y})" for k, t, y in rows)
        + ") v(k, t, y)"
    )
    sql = seasonal_decompose_oracle_sql("SELECT * FROM s", ["k"], "t", "y", 6)
    oracle = {
        (r[0], r[1]): (r[3], r[4], r[5], r[6]) for r in con.sql(sql).fetchall()
    }
    assert oracle == spark_rows


# ---------------------------------------------------------------------------
# acf_dominant_period
# ---------------------------------------------------------------------------
def test_acf_planted_period_and_reference(spark):
    import math
    import random

    from opentelemetry_collector_components_spark.operators.decompose import (
        acf_dominant_period,
    )

    rng = random.Random(5)
    rows = [
        ("a", i, 100 + round(40 * math.sin(2 * math.pi * i / 6)) + rng.randint(-3, 3))
        for i in range(1, 73)
    ]
    df = spark.createDataFrame(rows, ["k", "h", "v"])
    got = acf_dominant_period(df, ["k"], "h", "v", max_lag=24).collect()[0]
    assert got["period"] == 6

    vals = [v for _, _, v in rows]
    n, s = len(vals), sum(vals)
    d = [n * y - s for y in vals]
    best = max(((sum(d[t] * d[t + L] for t in range(n - L)), -L) for L in range(2, 25)))
    assert (got["acf_num"], got["period"]) == (best[0], -best[1])
    assert got["acf_den"] == sum(x * x for x in d)


def test_acf_drops_constant_and_short_keys(spark):
    from opentelemetry_collector_components_spark.operators.decompose import (
        acf_dominant_period,
    )

    rows = (
        [("const", i, 7) for i in range(1, 10)]
        + [("tiny", 1, 3), ("tiny", 2, 9)]
        + [("ok", i, [1, 9][i % 2]) for i in range(1, 13)]
    )
    df = spark.createDataFrame(rows, ["k", "h", "v"])
    out = {r["k"]: r for r in acf_dominant_period(df, ["k"], "h", "v", max_lag=4).collect()}
    assert set(out) == {"ok"}
    assert out["ok"]["period"] == 2  # alternating series


def test_acf_validation(spark):
    import pytest

    from opentelemetry_collector_components_spark.operators.decompose import (
        acf_dominant_period,
    )

    df = spark.createDataFrame([("a", 1, 1)], ["k", "h", "v"])
    with pytest.raises(ValueError, match="min_lag"):
        acf_dominant_period(df, ["k"], "h", "v", max_lag=2, min_lag=3)
    with pytest.raises(ValueError, match="key_cols"):
        acf_dominant_period(df, [], "h", "v", max_lag=2)


# ---------------------------------------------------------------------------
# ccf_lead_lag
# ---------------------------------------------------------------------------
def test_ccf_planted_lag_and_reference(spark):
    import random

    from opentelemetry_collector_components_spark.operators.decompose import (
        ccf_lead_lag,
    )

    rng = random.Random(9)
    base = [rng.randint(0, 50) for _ in range(60)]
    rows = [("k1", t, "deploys", v) for t, v in enumerate(base)]
    rows += [("k1", t + 3, "errors", 2 * v + rng.randint(0, 2)) for t, v in enumerate(base)]
    df = spark.createDataFrame(rows, ["k", "t", "series", "v"])
    r = ccf_lead_lag(df, ["k"], "t", "v", "series", "deploys", "errors", 8).collect()[0]
    assert r["lag"] == 3 and r["ccf"] > 0.9

    a = {t: v for k, t, s, v in rows if s == "deploys"}
    b = {t: v for k, t, s, v in rows if s == "errors"}
    na, sa, nb, sb = len(a), sum(a.values()), len(b), sum(b.values())
    da = {t: na * v - sa for t, v in a.items()}
    db = {t: nb * v - sb for t, v in b.items()}
    num3 = sum(da[t] * db[t + 3] for t in da if t + 3 in db)
    assert r["ccf_num"] == num3
    assert r["den_a"] == sum(d * d for d in da.values())
    assert r["den_b"] == sum(d * d for d in db.values())


def test_ccf_negative_lag_and_symmetry(spark):
    from opentelemetry_collector_components_spark.operators.decompose import (
        ccf_lead_lag,
    )

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9]
    rows = [("k", t, "a", v) for t, v in enumerate(vals)]
    rows += [("k", t - 2, "b", v) for t, v in enumerate(vals)]  # b LEADS a by 2
    df = spark.createDataFrame(rows, ["k", "t", "series", "v"])
    r = ccf_lead_lag(df, ["k"], "t", "v", "series", "a", "b", 5).collect()[0]
    assert r["lag"] == -2
    # swapping the roles flips the sign of the best lag
    r2 = ccf_lead_lag(df, ["k"], "t", "v", "series", "b", "a", 5).collect()[0]
    assert r2["lag"] == 2


def test_ccf_drops_zero_variance_and_missing_series(spark):
    from opentelemetry_collector_components_spark.operators.decompose import (
        ccf_lead_lag,
    )

    rows = [("flat", t, "a", 5) for t in range(10)]
    rows += [("flat", t, "b", t) for t in range(10)]
    rows += [("only_a", t, "a", t) for t in range(10)]
    df = spark.createDataFrame(rows, ["k", "t", "series", "v"])
    assert ccf_lead_lag(df, ["k"], "t", "v", "series", "a", "b", 3).count() == 0


def test_ccf_validation(spark):
    import pytest

    from opentelemetry_collector_components_spark.operators.decompose import (
        ccf_lead_lag,
    )

    df = spark.createDataFrame([("k", 1, "a", 1)], ["k", "t", "series", "v"])
    with pytest.raises(ValueError, match="differ"):
        ccf_lead_lag(df, ["k"], "t", "v", "series", "a", "a", 3)
    with pytest.raises(ValueError, match="max_lag"):
        ccf_lead_lag(df, ["k"], "t", "v", "series", "a", "b", -1)
