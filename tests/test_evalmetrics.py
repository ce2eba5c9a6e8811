from __future__ import annotations

import pytest


def _df(spark, rows):
    return spark.createDataFrame(rows, "y long, s long")


def test_roc_auc_ties_hand_computed(spark):
    from opentelemetry_collector_components_spark.operators.evalmetrics import roc_auc

    # ranks asc: score 1 -> avg rank 1.5 (one pos), score 2 -> 3 (pos),
    # score 3 -> 4 (neg); AUC = (4.5 - 3) / (2*2) = 0.375
    df = _df(spark, [(1, 1), (0, 1), (1, 2), (0, 3)])
    r = roc_auc(df, "y", "s").collect()[0]
    assert (r["n"], r["n_pos"], r["n_neg"]) == (4, 2, 2)
    assert r["auc_ppm"] == 375000


def test_roc_auc_perfect_reversed_degenerate(spark):
    from opentelemetry_collector_components_spark.operators.evalmetrics import roc_auc

    perfect = _df(spark, [(0, 1), (0, 2), (1, 3), (1, 4)])
    assert roc_auc(perfect, "y", "s").collect()[0]["auc_ppm"] == 1000000
    reversed_ = _df(spark, [(1, 1), (1, 2), (0, 3), (0, 4)])
    assert roc_auc(reversed_, "y", "s").collect()[0]["auc_ppm"] == 0
    onesided = _df(spark, [(1, 1), (1, 2)])
    assert roc_auc(onesided, "y", "s").collect()[0]["auc_ppm"] is None


def test_roc_auc_grouped(spark):
    from opentelemetry_collector_components_spark.operators.evalmetrics import roc_auc

    df = spark.createDataFrame(
        [("a", 0, 1), ("a", 1, 2), ("b", 1, 1), ("b", 0, 2)],
        "g string, y long, s long",
    )
    rows = {r["g"]: r["auc_ppm"] for r in roc_auc(df, "y", "s", ["g"]).collect()}
    assert rows == {"a": 1000000, "b": 0}


def test_roc_auc_label_guard(spark):
    from opentelemetry_collector_components_spark.operators.evalmetrics import roc_auc

    df = _df(spark, [(2, 1)])
    with pytest.raises(Exception, match="must be 0/1"):
        roc_auc(df, "y", "s").collect()


def test_confusion_at(spark):
    from opentelemetry_collector_components_spark.operators.evalmetrics import (
        confusion_at,
    )

    df = _df(spark, [(1, 5), (1, 1), (0, 7), (0, 2), (0, 3)])
    r = confusion_at(df, "y", "s", threshold=4).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 1, 1, 2)
    assert r["precision_ppm"] == 500000
    assert r["recall_ppm"] == 500000
    assert r["f1_ppm"] == 500000


def test_confusion_null_denominators(spark):
    from opentelemetry_collector_components_spark.operators.evalmetrics import (
        confusion_at,
    )

    df = _df(spark, [(0, 1), (0, 2)])
    r = confusion_at(df, "y", "s", threshold=10).collect()[0]
    assert r["precision_ppm"] is None and r["recall_ppm"] is None
    assert r["f1_ppm"] is None and r["tn"] == 2


def test_calibration_ece_two_bins(spark):
    from opentelemetry_collector_components_spark.operators.evalmetrics import (
        calibration_ece,
    )

    # bin 0: scores 200000/400000, 1 pos of 2 -> acc 500000, conf 300000
    # bin 1: scores 600000/800000, 2 pos of 2 -> acc 1000000, conf 700000
    # ece = (2*200000 + 2*300000) / 4 = 250000
    df = _df(
        spark, [(1, 200000), (0, 400000), (1, 600000), (1, 800000)]
    )
    rows = {r["bin"]: r for r in calibration_ece(df, "y", "s", n_bins=2).collect()}
    assert rows[0]["acc_ppm"] == 500000 and rows[0]["conf_ppm"] == 300000
    assert rows[1]["acc_ppm"] == 1000000 and rows[1]["conf_ppm"] == 700000
    assert rows[-1]["gap_ppm"] == 250000 and rows[-1]["n"] == 4


def test_calibration_score_range_guard(spark):
    from opentelemetry_collector_components_spark.operators.evalmetrics import (
        calibration_ece,
    )

    df = _df(spark, [(1, 2000000)])
    with pytest.raises(Exception, match="ppm"):
        calibration_ece(df, "y", "s").collect()


def test_top_edge_score_lands_in_last_bin(spark):
    from opentelemetry_collector_components_spark.operators.evalmetrics import (
        calibration_ece,
    )

    df = _df(spark, [(1, 1000000)])
    rows = {r["bin"]: r for r in calibration_ece(df, "y", "s", n_bins=10).collect()}
    assert rows[9]["n"] == 1


def test_roc_auc_null_score_raises(spark):
    from opentelemetry_collector_components_spark.operators.evalmetrics import (
        roc_auc,
    )

    df = spark.createDataFrame([(1, 5), (0, None)], "y long, s long")
    with pytest.raises(Exception, match="NULL"):
        roc_auc(df, "y", "s").collect()


def test_lift_curve_hand_computed(spark):
    from opentelemetry_collector_components_spark.operators.evalmetrics import (
        lift_curve,
    )

    # scores desc: 3 -> (2 rows, 2 pos); 2 -> (4 rows, 1 pos);
    # 1 -> (4 rows, 1 pos). total 10 rows, 4 pos.
    rows = ([(1, 3)] * 2 + [(1, 2)] + [(0, 2)] * 3
            + [(1, 1)] + [(0, 1)] * 3)
    df = _df(spark, rows)
    got = {r["s"]: r for r in lift_curve(df, "y", "s").collect()}
    assert got[3]["cum_n"] == 2 and got[3]["cum_pos"] == 2
    assert got[3]["frac_ppm"] == 200000
    assert got[3]["capture_ppm"] == 500000
    assert got[3]["lift_ppm"] == 2500000  # 0.5 / 0.2
    assert got[1]["frac_ppm"] == 1000000
    assert got[1]["capture_ppm"] == 1000000
    assert got[1]["lift_ppm"] == 1000000  # full corpus = baseline


def test_lift_curve_no_positives_null(spark):
    from opentelemetry_collector_components_spark.operators.evalmetrics import (
        lift_curve,
    )

    df = _df(spark, [(0, 1), (0, 2)])
    for r in lift_curve(df, "y", "s").collect():
        assert r["capture_ppm"] is None and r["lift_ppm"] is None


def test_lift_curve_oracle_matches(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.evalmetrics import (
        lift_curve,
        lift_curve_oracle_sql,
    )

    rows = []
    for i in range(300):
        g = f"g{i % 2}"
        s = (i * 11) % 15
        y = 1 if (i * 3) % 15 < s else 0
        rows.append((g, y, s))
    df = spark.createDataFrame(rows, "g string, y long, s long")
    spark_rows = {
        (r["g"], r["s"]): (r["cum_n"], r["cum_pos"], r["frac_ppm"],
                           r["capture_ppm"], r["lift_ppm"])
        for r in lift_curve(df, "y", "s", ["g"]).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{g}', {y}, {s})" for g, y, s in rows)
        + ") v(g, y, s)"
    )
    sql = lift_curve_oracle_sql("SELECT * FROM t", "y", "s", ["g"])
    oracle = {
        (r[0], r[1]): (r[4], r[5], r[6], r[7], r[8])
        for r in con.sql(sql).fetchall()
    }
    assert oracle == spark_rows


def test_average_precision_hand_computed(spark):
    from opentelemetry_collector_components_spark.operators.evalmetrics import (
        average_precision,
    )

    # desc levels: s=3 (1 row, pos) prec 1/1; s=2 (1 row, neg);
    # s=1 (2 rows, 1 pos) prec 2/4 -> AP = (1000000 + 500000) / 2
    df = _df(spark, [(1, 3), (0, 2), (1, 1), (0, 1)])
    r = average_precision(df, "y", "s").collect()[0]
    assert (r["n"], r["n_pos"]) == (4, 2)
    assert r["ap_ppm"] == 750000
    none = _df(spark, [(0, 1), (0, 2)])
    assert average_precision(none, "y", "s").collect()[0]["ap_ppm"] is None


def test_brier_score_hand_computed(spark):
    from opentelemetry_collector_components_spark.operators.evalmetrics import (
        brier_score,
    )

    # (y=1, s=0.8): err 0.04 ; (y=0, s=0.4): err 0.16 -> mean 0.10
    df = _df(spark, [(1, 800000), (0, 400000)])
    r = brier_score(df, "y", "s").collect()[0]
    assert r["brier_micro"] == 100000
    # perfect scores -> 0
    perfect = _df(spark, [(1, 1000000), (0, 0)])
    assert brier_score(perfect, "y", "s").collect()[0]["brier_micro"] == 0


def test_ap_and_brier_oracles_match(spark):
    import duckdb

    from opentelemetry_collector_components_spark.operators.evalmetrics import (
        average_precision,
        average_precision_oracle_sql,
        brier_score,
        brier_oracle_sql,
    )

    rows = []
    for i in range(300):
        g = f"g{i % 2}"
        s = ((i * 11) % 20) * 50000
        y = 1 if (i * 3) % 20 < (s // 50000) else 0
        rows.append((g, y, s))
    df = spark.createDataFrame(rows, "g string, y long, s long")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{g}', {y}, {s})" for g, y, s in rows)
        + ") v(g, y, s)"
    )
    sp = {
        r["g"]: (r["n"], r["n_pos"], r["ap_ppm"])
        for r in average_precision(df, "y", "s", ["g"]).collect()
    }
    du = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(
            average_precision_oracle_sql("SELECT * FROM t", "y", "s", ["g"])
        ).fetchall()
    }
    assert sp == du
    sp = {
        r["g"]: (r["n"], r["brier_micro"])
        for r in brier_score(df, "y", "s", ["g"]).collect()
    }
    du = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            brier_oracle_sql("SELECT * FROM t", "y", "s", ["g"])
        ).fetchall()
    }
    assert sp == du
