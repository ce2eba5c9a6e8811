from __future__ import annotations

import pytest


def test_fold_series_hand_computed():
    from opentelemetry_collector_components_spark.streaming.ewma import _fold_series

    # alpha=1/2, S=1000: y=[4,4,4,40]; warmup=2, z=2
    levels, variances, flags, _ = _fold_series([4, 4, 4, 40], 1, 2, 2, 2)
    # l0=4000 v0=0; t2: d=0 -> l=4000 v=0 flag False (var=0)
    # t3: d=0 -> same; t4: d=36000, d2=1.296e9 > 4*0? var=0 -> no flag
    assert levels == [4000, 4000, 4000, 22000]
    assert variances == [0, 0, 0, 648000000]
    assert flags == [False, False, False, False]
    # same series with noise first so var > 0 when the spike lands
    levels, variances, flags, _ = _fold_series([4, 6, 4, 6, 40], 1, 2, 2, 2)
    assert flags[:4] == [False, False, False, False]
    assert flags[4] is True


def test_fold_series_guards():
    from opentelemetry_collector_components_spark.streaming.ewma import _fold_series

    with pytest.raises(ValueError, match="out of"):
        _fold_series([-1], 1, 2, 2, 2)
    with pytest.raises(ValueError, match="out of"):
        _fold_series([2_000_000], 1, 2, 2, 2)


def test_params_ceiling_raises():
    from opentelemetry_collector_components_spark.streaming.ewma import (
        _check_params,
    )

    # z=10000 drives the y ceiling to ~300 — must refuse loudly
    with pytest.raises(ValueError, match="ceiling"):
        _check_params(1, 4, 10000, 5)
    # default chart ceiling is ~9.5e5
    assert _check_params(1, 4, 3, 5) > 900_000


def test_fold_series_resumes_from_state():
    from opentelemetry_collector_components_spark.streaming.ewma import (
        _fold_series,
    )

    ys = [10, 12, 9, 14, 11, 10, 40, 12]
    full = _fold_series(ys, 1, 4, 3, 5)
    l1, v1, f1, st = _fold_series(ys[:4], 1, 4, 3, 5)
    l2, v2, f2, st2 = _fold_series(ys[4:], 1, 4, 3, 5, state=st)
    assert (l1 + l2, v1 + v2, f1 + f2, st2) == full


def test_batch_ewma_and_oracle(spark):
    import duckdb

    from opentelemetry_collector_components_spark.streaming.ewma import (
        ewma_anomaly,
        ewma_anomaly_oracle_sql,
    )

    rows = []
    for k, base in (("a", 10), ("b", 100)):
        for t in range(20):
            y = base + (t * 7) % 5 + (300 if (k == "a" and t == 15) else 0)
            rows.append((k, t, y))
    df = spark.createDataFrame(rows, "k string, t long, y long")
    out = ewma_anomaly(df, ["k"], "t", "y", 1, 4, 3, 5)
    spark_rows = {
        (r["k"], r["t"]): (r["idx"], r["level_milli"], r["var_milli2"],
                           r["is_anomaly"])
        for r in out.collect()
    }
    assert spark_rows[("a", 15)][3] is True
    assert sum(1 for v in spark_rows.values() if v[3]) >= 1

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE s AS SELECT * FROM (VALUES "
        + ", ".join(f"('{k}', {t}, {y})" for k, t, y in rows)
        + ") v(k, t, y)"
    )
    sql = ewma_anomaly_oracle_sql("SELECT * FROM s", ["k"], "t", "y", 1, 4, 3, 5)
    oracle = {
        (r[0], r[1]): (r[3], r[4], r[5], r[6]) for r in con.sql(sql).fetchall()
    }
    assert oracle == spark_rows


def test_stream_equals_batch_across_micro_batches(spark):
    import glob
    import os
    import shutil
    import tempfile

    from opentelemetry_collector_components_spark.streaming.ewma import (
        ewma_anomaly,
        ewma_anomaly_stateful,
    )

    tmp = tempfile.mkdtemp()
    data, ckpt = f"{tmp}/data", f"{tmp}/ckpt"
    os.makedirs(data)
    try:
        def mk(lo, hi):
            rows = [
                (k, t, 10 + (t * 3) % 7 + (500 if t == 12 else 0))
                for k in ("a", "b")
                for t in range(lo, hi)
            ]
            return spark.createDataFrame(rows, "key string, t long, y long")

        for n, (lo, hi) in enumerate([(0, 8), (8, 16)]):
            stage = f"{tmp}/stage{n}"
            mk(lo, hi).coalesce(1).write.parquet(stage)
            part = glob.glob(f"{stage}/part-*.parquet")[0]
            dst = f"{data}/{n:03d}.parquet"
            shutil.copy(part, dst)
            os.utime(dst, (1000 + n, 1000 + n))

        full = mk(0, 16)
        stream = (
            spark.readStream.schema(full.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(data)
        )
        out = ewma_anomaly_stateful(stream, "key", "t", "y", 1, 4, 3, 5)
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("ewma_state")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["key"], r["t"]): (r["idx"], r["level_milli"],
                                 r["var_milli2"], r["is_anomaly"])
            for r in spark.table("ewma_state").collect()
        }
        want = {
            (r["k"], r["t"]): (r["idx"], r["level_milli"],
                               r["var_milli2"], r["is_anomaly"])
            for r in ewma_anomaly(
                full.withColumnRenamed("key", "k"), ["k"], "t", "y", 1, 4, 3, 5
            ).collect()
        }
        assert got == want
        assert len(got) == 32
        # the spike at t=12 sits in batch 2 and depends on batch-1 state
        assert got[("a", 12)][3] is True
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
