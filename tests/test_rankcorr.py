from __future__ import annotations

import pytest


def _rho(spark, rows, **kw):
    from opentelemetry_collector_components_spark.operators.rankcorr import (
        spearman,
    )

    df = spark.createDataFrame(rows, "x long, y long")
    return spearman(df, "x", "y", **kw).collect()[0]


def test_perfect_monotone(spark):
    rows = [(i, i * i) for i in range(1, 11)]  # nonlinear but monotone
    r = _rho(spark, rows)
    assert r["rho_ppm"] == 1000000
    rows = [(i, -i) for i in range(1, 11)]
    assert _rho(spark, rows)["rho_ppm"] == -1000000


def test_ties_hand_computed(spark):
    # x: 1,1,2 -> doubled avg ranks 3,3,6 ; y: 5,7,7 -> 2,5,5
    # centered (n+1=4 doubled): cx = -1,-1,2 ; cy = -2,1,1
    # sxy = 2-1+2 = 3; sxx = 6; syy = 6 -> rho = 3/6 = 0.5
    r = _rho(spark, [(1, 5), (1, 7), (2, 7)])
    assert r["rho_ppm"] == 500000


def test_constant_column_null(spark):
    r = _rho(spark, [(1, 9), (2, 9), (3, 9)])
    assert r["rho_ppm"] is None


def test_null_raises(spark):
    from opentelemetry_collector_components_spark.operators.rankcorr import (
        spearman,
    )

    df = spark.createDataFrame([(1, None)], "x long, y long")
    with pytest.raises(Exception, match="NULL"):
        spearman(df, "x", "y").collect()


def test_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.rankcorr import (
        spearman,
        spearman_oracle_sql,
    )

    rows = []
    for i in range(300):
        g = f"g{i % 2}"
        x = (i * 7) % 23
        y = x * 2 + (i * 13) % 11  # noisy monotone
        rows.append((g, x, y))
    df = spark.createDataFrame(rows, "g string, x long, y long")
    sp = {
        r["g"]: (r["n"], r["rho_ppm"])
        for r in spearman(df, "x", "y", ["g"]).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{g}', {x}, {y})" for g, x, y in rows)
        + ") v(g, x, y)"
    )
    du = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            spearman_oracle_sql("SELECT * FROM t", "x", "y", ["g"])
        ).fetchall()
    }
    assert sp == du
    for n, rho in sp.values():
        assert rho > 500000  # strongly monotone by construction


def _mw_frame(spark, rows):
    return spark.createDataFrame(rows, "k string, v long, g string")


def test_mann_whitney_hand_computed(spark):
    """Treat {1,2,3} vs control {4,5}: every control beats every treat,
    so U_treat = 0, U2 = 0, r = -1.  Swapped arms give U2 = 2*n_t*n_c."""
    from opentelemetry_collector_components_spark.operators.rankcorr import (
        mann_whitney,
    )

    rows = [("a", 1, "t"), ("a", 2, "t"), ("a", 3, "t"), ("a", 4, "c"), ("a", 5, "c")]
    out = mann_whitney(_mw_frame(spark, rows), "v", "g", "t", "c", ["k"]).collect()
    r = out[0]
    assert (r["n_t"], r["n_c"], r["u2"], r["r_ppm"]) == (3, 2, 0, -1_000_000)
    assert r["z_ppm"] < 0
    swapped = mann_whitney(_mw_frame(spark, rows), "v", "g", "c", "t", ["k"]).collect()[0]
    assert (swapped["u2"], swapped["r_ppm"]) == (12, 1_000_000)


def test_mann_whitney_ties_and_symmetry(spark):
    """All-tied values: U2 = n_t*n_c (r = 0), z NULL (zero variance).
    Balanced interleaved arms: z near 0."""
    from opentelemetry_collector_components_spark.operators.rankcorr import (
        mann_whitney,
    )

    tied = [("a", 7, "t"), ("a", 7, "t"), ("a", 7, "c"), ("a", 7, "c")]
    r = mann_whitney(_mw_frame(spark, tied), "v", "g", "t", "c", ["k"]).collect()[0]
    assert (r["u2"], r["r_ppm"], r["z_ppm"]) == (4, 0, None)
    inter = [("a", i, "t" if i % 2 else "c") for i in range(1, 21)]
    r2 = mann_whitney(_mw_frame(spark, inter), "v", "g", "t", "c", ["k"]).collect()[0]
    assert abs(r2["z_ppm"]) < 400_000


def test_mann_whitney_missing_arm_and_other_groups(spark):
    """Rows in neither arm are ignored; a key with one arm yields NULL
    r/z and u2 = 0."""
    from opentelemetry_collector_components_spark.operators.rankcorr import (
        mann_whitney,
    )

    rows = [("a", 1, "t"), ("a", 2, "t"), ("a", 9, "x"), ("b", 1, "t"), ("b", 2, "c")]
    out = {r["k"]: r for r in mann_whitney(
        _mw_frame(spark, rows), "v", "g", "t", "c", ["k"]).collect()}
    assert (out["a"]["n_t"], out["a"]["n_c"], out["a"]["u2"]) == (2, 0, 0)
    assert out["a"]["r_ppm"] is None and out["a"]["z_ppm"] is None
    assert out["b"]["u2"] == 0  # treat value 1 < control 2


def test_mann_whitney_matches_scipy_formula(spark):
    """Random-ish deterministic data vs a direct Python replay of the
    tie-corrected formula (independent implementation, no windows)."""
    import math

    from opentelemetry_collector_components_spark.operators.rankcorr import (
        mann_whitney,
    )

    rows = []
    for i in range(80):
        v = (i * 37) % 23 + (3 if i % 2 else 0)
        rows.append(("a", v, "t" if i % 2 else "c"))
    got = mann_whitney(_mw_frame(spark, rows), "v", "g", "t", "c", ["k"]).collect()[0]

    vals = [(v, g) for _, v, g in rows]
    svals = sorted(v for v, _ in vals)
    # midranks
    from collections import Counter
    cnt = Counter(svals)
    before = {}
    acc = 0
    for v in sorted(cnt):
        before[v] = acc
        acc += cnt[v]
    r_t = sum(before[v] + (cnt[v] + 1) / 2 for v, g in vals if g == "t")
    n_t = sum(1 for _, g in vals if g == "t")
    n_c = len(vals) - n_t
    u = r_t - n_t * (n_t + 1) / 2
    n = n_t + n_c
    ties = sum(c**3 - c for c in cnt.values())
    sigma = math.sqrt(n_t * n_c * ((n**3 - n) - ties) / (12 * n * (n - 1)))
    z = (u - n_t * n_c / 2) / sigma
    assert got["u2"] == int(2 * u)
    assert abs(got["z_ppm"] / 1e6 - z) < 2e-6


def test_mann_whitney_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.rankcorr import (
        mann_whitney,
        mann_whitney_oracle_sql,
    )

    rows = [("a", (i * 13) % 7, "t" if i % 3 == 0 else "c") for i in range(40)]
    rows += [("b", (i * 5) % 11, "t" if i % 2 else "c") for i in range(30)]
    got = sorted(map(tuple, mann_whitney(
        _mw_frame(spark, rows), "v", "g", "t", "c", ["k"]).collect()))
    values = ", ".join(f"('{k}', {v}, '{g}')" for k, v, g in rows)
    sql = mann_whitney_oracle_sql(
        f"SELECT * FROM (VALUES {values}) v(k, v, g)",
        "v",
        "CASE WHEN g = 't' THEN 1 WHEN g = 'c' THEN 0 END",
        ["k"],
    )
    want = sorted(
        tuple(int(x) if x is not None and not isinstance(x, str) else x for x in row)
        for row in duckdb.connect().execute(sql).fetchall()
    )
    assert got == want


def test_jonckheere_hand_computed(spark):
    """Three ordered arms, perfectly increasing, no ties: g0={1,2},
    g1={3,4}, g2={5,6} -> every cross-pair concordant: J = 4+4+4 = 12,
    J2 = 24, z > 0."""
    from opentelemetry_collector_components_spark.operators.rankcorr import (
        jonckheere_terpstra,
    )

    rows = [("a", 1, 0), ("a", 2, 0), ("a", 3, 1), ("a", 4, 1),
            ("a", 5, 2), ("a", 6, 2)]
    df = spark.createDataFrame(rows, "k string, v long, g long")
    r = jonckheere_terpstra(df, "v", "g", ["k"]).collect()[0]
    assert (r["n"], r["k_groups"], r["j2"]) == (6, 3, 24)
    assert r["z_ppm"] > 2_000_000  # strong monotone trend


def test_jonckheere_ties_counted_half(spark):
    """g0={5}, g1={5}: the only cross pair is a tie -> J = 1/2, J2 = 1."""
    from opentelemetry_collector_components_spark.operators.rankcorr import (
        jonckheere_terpstra,
    )

    rows = [("a", 5, 0), ("a", 5, 1)]
    df = spark.createDataFrame(rows, "k string, v long, g long")
    r = jonckheere_terpstra(df, "v", "g", ["k"]).collect()[0]
    assert r["j2"] == 1
    assert r["z_ppm"] is None  # n = 2: no variance headroom


def test_jonckheere_reduces_to_mann_whitney_for_two_arms(spark):
    """k = 2: J equals the Mann-Whitney U of the higher-ordered arm and
    the tie-corrected z matches to ppm."""
    from opentelemetry_collector_components_spark.operators.rankcorr import (
        jonckheere_terpstra,
        mann_whitney,
    )

    rows = [("a", (i * 13) % 9 + (2 if i % 2 else 0), i % 2) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, v long, g long")
    jt = jonckheere_terpstra(df, "v", "g", ["k"]).collect()[0]
    mw = mann_whitney(df, "v", "g", 1, 0, ["k"]).collect()[0]
    assert jt["j2"] == mw["u2"]
    assert abs(jt["z_ppm"] - mw["z_ppm"]) <= 1


def test_jonckheere_matches_reference_formula(spark):
    """Independent brute-force pair count + Lehmann variance replay."""
    import math

    from opentelemetry_collector_components_spark.operators.rankcorr import (
        jonckheere_terpstra,
    )

    rows = [((i * 7) % 11, (i * 3) % 4) for i in range(60)]
    df = spark.createDataFrame(
        [("a", v, g) for v, g in rows], "k string, v long, g long"
    )
    got = jonckheere_terpstra(df, "v", "g", ["k"]).collect()[0]

    j2 = 0
    for i, (v1, g1) in enumerate(rows):
        for v2, g2 in rows:
            if g1 < g2:
                j2 += 2 if v1 < v2 else (1 if v1 == v2 else 0)
    assert got["j2"] == j2

    from collections import Counter
    n = len(rows)
    ng = Counter(g for _, g in rows)
    tv = Counter(v for v, _ in rows)
    A = (
        n * (n - 1) * (2 * n + 5)
        - sum(x * (x - 1) * (2 * x + 5) for x in ng.values())
        - sum(x * (x - 1) * (2 * x + 5) for x in tv.values())
    )
    B = (
        sum(x * (x - 1) * (x - 2) for x in ng.values())
        * sum(x * (x - 1) * (x - 2) for x in tv.values())
    )
    C = (
        sum(x * (x - 1) for x in ng.values())
        * sum(x * (x - 1) for x in tv.values())
    )
    var = A / 72 + B / (36 * n * (n - 1) * (n - 2)) + C / (8 * n * (n - 1))
    ej2 = n * n - sum(x * x for x in ng.values())
    z = (2 * j2 - ej2) / 4.0 / math.sqrt(var)
    assert abs(got["z_ppm"] / 1e6 - z) < 2e-6


def test_jonckheere_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.rankcorr import (
        jonckheere_oracle_sql,
        jonckheere_terpstra,
    )

    rows = [(f"k{i % 2}", (i * 5) % 7, (i * 3) % 3) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, v long, g long")
    got = sorted(map(tuple, jonckheere_terpstra(df, "v", "g", ["k"]).collect()))
    values = ", ".join(f"('{k}', {v}, {g})" for k, v, g in rows)
    sql = jonckheere_oracle_sql(
        f"SELECT * FROM (VALUES {values}) v(k, v, g)", "v", "g", ["k"]
    )
    want = sorted(
        tuple(int(x) if x is not None and not isinstance(x, str) else x for x in row)
        for row in duckdb.connect().execute(sql).fetchall()
    )
    assert got == want
