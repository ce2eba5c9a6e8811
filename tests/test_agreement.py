from __future__ import annotations

import pytest


def test_cohen_kappa_hand_computed(spark):
    from opentelemetry_collector_components_spark.operators.agreement import cohen_kappa

    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r["n_items"] == 50
    assert r["po_ppm"] == 700000 and r["pe_ppm"] == 500000
    assert r["kappa_ppm"] == 400000 and r["band"] == "fair"


def test_cohen_kappa_degenerate_and_negative(spark):
    from opentelemetry_collector_components_spark.operators.agreement import cohen_kappa

    const = spark.createDataFrame([("y", "y")] * 3, "a string, b string")
    r = cohen_kappa(const, "a", "b").collect()[0]
    assert r["kappa_ppm"] is None and r["band"] is None

    anti = spark.createDataFrame([("y", "n"), ("n", "y")], "a string, b string")
    r = cohen_kappa(anti, "a", "b").collect()[0]
    assert r["kappa_ppm"] == -1000000 and r["band"] == "poor"


def test_cohen_kappa_null_raises(spark):
    from opentelemetry_collector_components_spark.operators.agreement import cohen_kappa

    df = spark.createDataFrame([("y", None)], "a string, b string")
    with pytest.raises(Exception, match="NULL"):
        cohen_kappa(df, "a", "b").collect()


def test_fleiss_kappa_hand_computed(spark):
    from opentelemetry_collector_components_spark.operators.agreement import (
        fleiss_kappa,
    )

    rows = [(1, "y"), (1, "y"), (2, "y"), (2, "n")]
    df = spark.createDataFrame(rows, "item long, k string")
    r = fleiss_kappa(df, "item", "k").collect()[0]
    assert (r["n_items"], r["n_raters"]) == (2, 2)
    assert r["pbar_ppm"] == 500000 and r["pe_ppm"] == 625000
    assert r["kappa_ppm"] == -333333 and r["band"] == "poor"


def test_fleiss_kappa_perfect(spark):
    from opentelemetry_collector_components_spark.operators.agreement import (
        fleiss_kappa,
    )

    rows = [(i, lab) for i, lab in enumerate("yynn") for _ in range(3)]
    df = spark.createDataFrame(rows, "item long, k string")
    r = fleiss_kappa(df, "item", "k").collect()[0]
    assert r["kappa_ppm"] == 1000000 and r["band"] == "almost_perfect"


def test_fleiss_kappa_ragged_raises(spark):
    from opentelemetry_collector_components_spark.operators.agreement import (
        fleiss_kappa,
    )

    df = spark.createDataFrame(
        [(1, "y"), (1, "y"), (2, "y")], "item long, k string"
    )
    with pytest.raises(Exception, match="unequal"):
        fleiss_kappa(df, "item", "k").collect()


def test_oracles_match_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.agreement import (
        cohen_kappa,
        cohen_kappa_oracle_sql,
        fleiss_kappa,
        fleiss_kappa_oracle_sql,
    )

    pairs = [("y", "y")] * 7 + [("y", "n")] * 2 + [("n", "y")] * 3 + [("n", "n")] * 4
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p AS SELECT * FROM (VALUES "
        + ", ".join(f"('{a}', '{b}')" for a, b in pairs)
        + ") v(a, b)"
    )
    spark_row = cohen_kappa(
        spark.createDataFrame(pairs, "a string, b string"), "a", "b"
    ).collect()[0]
    d = con.sql(cohen_kappa_oracle_sql("SELECT * FROM p", "a", "b")).fetchone()
    assert (spark_row["po_ppm"], spark_row["pe_ppm"], spark_row["kappa_ppm"],
            spark_row["band"]) == (d[1], d[2], d[3], d[4])

    ratings = [(i, lab) for i in range(5) for lab in ("y", "y", "n")]
    con.execute(
        "CREATE TABLE r AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{k}')" for i, k in ratings)
        + ") v(item, k)"
    )
    spark_row = fleiss_kappa(
        spark.createDataFrame(ratings, "item long, k string"), "item", "k"
    ).collect()[0]
    d = con.sql(fleiss_kappa_oracle_sql("SELECT * FROM r", "item", "k")).fetchone()
    assert (spark_row["pbar_ppm"], spark_row["pe_ppm"], spark_row["kappa_ppm"],
            spark_row["band"]) == (d[2], d[3], d[4], d[5])


def test_cohen_kappa_overflow_regime_matches_oracle(spark):
    """N large enough that sab*1e6 exceeds BIGINT: both engines must
    take the double-division arm and still agree exactly."""
    import duckdb

    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.agreement import (
        cohen_kappa,
        cohen_kappa_oracle_sql,
    )

    n = 6_000_000
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, "y").otherwise("n").alias("a"),
        F.when(F.col("id") % 3 < 2, "y").otherwise("n").alias("b"),
    )
    r = cohen_kappa(df, "a", "b").collect()[0]
    con = duckdb.connect()
    rows = (
        f"SELECT CASE WHEN i % 2 = 0 THEN 'y' ELSE 'n' END AS a, "
        f"CASE WHEN i % 3 < 2 THEN 'y' ELSE 'n' END AS b "
        f"FROM range({n}) t(i)"
    )
    d = con.sql(cohen_kappa_oracle_sql(rows, "a", "b")).fetchone()
    assert (r["n_items"], r["po_ppm"], r["pe_ppm"], r["kappa_ppm"],
            r["band"]) == (d[0], d[1], d[2], d[3], d[4])
    # sanity: this really is the overflow regime for pe's numerator
    assert d[0] * d[0] > (2**63 - 1) // 1_000_000


def test_krippendorff_hand_computed(spark):
    """Krippendorff's own worked nominal example (2004, ch. 11): 4
    items, ragged ratings {a,a}, {b,b}, {a,b}, {b,b,b}: n=9,
    d = 0 + 0 + 2*... exact replay below in integers."""
    from opentelemetry_collector_components_spark.operators.agreement import (
        krippendorff_alpha,
    )

    rows = [(1, "a"), (1, "a"), (2, "b"), (2, "b"),
            (3, "a"), (3, "b"), (4, "b"), (4, "b"), (4, "b")]
    df = spark.createDataFrame(rows, "item long, label string")
    r = krippendorff_alpha(df, "item", "label", max_ratings=5).collect()[0]
    # exact rational: S_o = (4-2*... d_3 = m^2 - sum n^2 = 4 - 2 = 2,
    # weight 1/(2-1) -> S_o = 2; n = 9; n_a = 3, n_b = 6 ->
    # de = 81 - (9 + 36) = 36; alpha = 1 - 8*2/36 = 1 - 4/9 = 5/9
    assert r["n_ratings"] == 9 and r["n_items"] == 4
    assert r["alpha_ppm"] == int(5 * 1_000_000 / 9)  # 555555 (truncated)
    assert r["band"] == "moderate"


def test_krippendorff_singletons_dropped_and_perfect(spark):
    from opentelemetry_collector_components_spark.operators.agreement import (
        krippendorff_alpha,
    )

    rows = [(1, "x"), (1, "x"), (2, "y"), (2, "y"), (3, "z")]
    df = spark.createDataFrame(rows, "item long, label string")
    r = krippendorff_alpha(df, "item", "label").collect()[0]
    assert r["n_items"] == 2 and r["n_ratings"] == 4
    assert r["alpha_ppm"] == 1_000_000 and r["band"] == "almost_perfect"
    # all-one-label slice: expected disagreement 0 -> NULL alpha
    one = spark.createDataFrame([(1, "x"), (1, "x")], "item long, label string")
    r1 = krippendorff_alpha(one, "item", "label").collect()[0]
    assert r1["alpha_ppm"] is None and r1["band"] is None


def test_krippendorff_validation(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from opentelemetry_collector_components_spark.operators.agreement import (
        krippendorff_alpha,
    )

    df = spark.createDataFrame(
        [(1, "a")] * 6 + [(1, "b")] * 6 + [(2, "a"), (2, "b")],
        "item long, label string",
    )
    with _pytest.raises(Exception, match="max_ratings"):
        krippendorff_alpha(df, "item", "label", max_ratings=5).collect()
    with _pytest.raises(ValueError):
        krippendorff_alpha(df, "item", "label", max_ratings=2)


def test_krippendorff_matches_reference_formula(spark):
    """Independent float replay of the coincidence-matrix definition on
    a ragged random-ish panel."""
    from collections import Counter, defaultdict

    from opentelemetry_collector_components_spark.operators.agreement import (
        krippendorff_alpha,
    )

    rows = []
    for i in range(30):
        m = 2 + (i * 7) % 4  # 2..5 ratings
        for j in range(m):
            rows.append((i, f"l{(i * 5 + j * 3) % 4}"))
    df = spark.createDataFrame(rows, "item long, label string")
    got = krippendorff_alpha(df, "item", "label", max_ratings=6).collect()[0]

    per_item = defaultdict(Counter)
    for i, l in rows:
        per_item[i][l] += 1
    so = 0.0
    n = 0
    marg = Counter()
    for cnts in per_item.values():
        m = sum(cnts.values())
        if m < 2:
            continue
        n += m
        marg.update(cnts)
        so += (m * m - sum(c * c for c in cnts.values())) / (m - 1)
    de = n * n - sum(c * c for c in marg.values())
    alpha = 1 - (n - 1) * so / de
    assert got["n_ratings"] == n
    assert abs(got["alpha_ppm"] / 1e6 - alpha) < 2e-6


def test_krippendorff_oracle_matches_duckdb(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.agreement import (
        krippendorff_alpha,
        krippendorff_oracle_sql,
    )

    rows = []
    for i in range(25):
        m = 1 + (i * 3) % 5  # includes singletons
        for j in range(m):
            rows.append((i, f"l{(i + j * 2) % 3}"))
    df = spark.createDataFrame(rows, "item long, label string")
    got = [tuple(r) for r in krippendorff_alpha(df, "item", "label", 7).collect()]
    values = ", ".join(f"({i}, '{l}')" for i, l in rows)
    sql = krippendorff_oracle_sql(
        f"SELECT * FROM (VALUES {values}) v(item, label)", "item", "label", 7
    )
    want = [
        tuple(int(x) if isinstance(x, (int,)) and not isinstance(x, bool) else x
              for x in row)
        for row in duckdb.connect().execute(sql).fetchall()
    ]
    assert got == want


def test_krippendorff_all_singletons_zero_not_null(spark):
    """All-singleton input: n_ratings must be 0 (matching the oracle's
    COALESCE), not NULL (review fix)."""
    from opentelemetry_collector_components_spark.operators.agreement import (
        krippendorff_alpha,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "item long, label string"
    )
    r = krippendorff_alpha(df, "item", "label").collect()[0]
    assert r["n_ratings"] == 0 and r["n_items"] == 0
    assert r["alpha_ppm"] is None
