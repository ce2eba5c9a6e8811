"""Streaming Misra-Gries: merge kernel, guarantees, stream==closed-form."""

import glob
import os
import shutil
import tempfile

import pytest

from opentelemetry_collector_components_spark.streaming.heavyhitters import (
    mg_merge,
    misra_gries_oracle_sql,
    streaming_misra_gries,
)


def test_mg_merge_kernel():
    # classic single-pass behavior via repeated unit merges
    s = {}
    for item in ["a", "a", "a", "b", "c", "d"]:
        s = mg_merge(s, {item: 1}, k=2)
    # a survives (freq 3 > 6/3); counts are lower bounds
    assert "a" in s
    assert all(c >= 1 for c in s.values())
    assert len(s) <= 2
    # single compaction = exact counts minus (k+1)-th largest
    s2 = mg_merge({}, {"x": 10, "y": 6, "z": 3, "w": 1}, k=2)
    assert s2 == {"x": 7, "y": 3}
    # under-capacity merge is exact
    assert mg_merge({"x": 2}, {"y": 5}, k=4) == {"x": 2, "y": 5}


def test_mg_guarantee_on_zipf():
    # every item with freq > n/(k+1) must survive any merge schedule
    items = []
    for i in range(1, 40):
        items += [f"i{i}"] * (1000 // i)
    n = len(items)
    k = 8
    for chunk in (7, 97, 1000):
        s = {}
        for start in range(0, n, chunk):
            add = {}
            for it in items[start : start + chunk]:
                add[it] = add.get(it, 0) + 1
            s = mg_merge(s, add, k)
        for i in range(1, 40):
            true = 1000 // i
            if true > n / (k + 1):
                assert f"i{i}" in s, (chunk, i)
            if f"i{i}" in s:
                assert s[f"i{i}"] <= true  # lower bound
                assert true - s[f"i{i}"] <= n / (k + 1) + 1e-9


def _drain(spark, df, name):
    ckpt = tempfile.mkdtemp(prefix="ckpt_mg_")
    try:
        (
            df.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def test_stream_single_batch_equals_closed_form(spark):
    import duckdb

    rows = [(i % 7, f"item{(i * i) % 23}") for i in range(3000)]
    batch = spark.createDataFrame(rows, "shard long, item string")
    tmp = tempfile.mkdtemp()
    try:
        batch.coalesce(1).write.parquet(f"{tmp}/data")
        stream = spark.readStream.schema(batch.schema).parquet(f"{tmp}/data")
        out = streaming_misra_gries(stream, "item", k=5, shard_col="shard")
        got = _drain(spark, out, "mg_single").toPandas()
        got = got.sort_values(["shard", "item"]).reset_index(drop=True)
        con = duckdb.connect()
        con.register("src_rows", batch.toPandas())
        sql = misra_gries_oracle_sql("SELECT * FROM src_rows", "item", "shard", k=5)
        want = con.sql(sql).df().sort_values(["shard", "item"]).reset_index(drop=True)
        assert got["item"].tolist() == want["item"].tolist()
        assert got["count_lower"].tolist() == want["count_lower"].tolist()
        assert got["n_seen"].tolist() == want["n_seen"].tolist()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_cross_batch_state_and_guarantee(spark):
    # two micro-batches; the hot item must survive with a valid lower bound
    tmp = tempfile.mkdtemp()
    data = f"{tmp}/data"
    os.makedirs(data)
    try:
        def mk(lo, hi):
            rows = [
                (0, "hot" if i % 3 == 0 else f"cold{i % 50}")
                for i in range(lo, hi)
            ]
            return spark.createDataFrame(rows, "shard long, item string")

        for n, (lo, hi) in enumerate([(0, 600), (600, 1200)]):
            stage = f"{tmp}/stage{n}"
            mk(lo, hi).coalesce(1).write.parquet(stage)
            part = glob.glob(f"{stage}/part-*.parquet")[0]
            dst = f"{data}/{n:03d}.parquet"
            shutil.copy(part, dst)
            os.utime(dst, (1000 + n, 1000 + n))
        stream = (
            spark.readStream.schema("shard long, item string")
            .option("maxFilesPerTrigger", 1)
            .parquet(data)
        )
        out = streaming_misra_gries(stream, "item", k=10, shard_col="shard")
        res = _drain(spark, out, "mg_multi").toPandas()
        # update mode: keep the final batch's rows (max n_seen)
        final = res[res["n_seen"] == res["n_seen"].max()]
        assert res["n_seen"].max() == 1200
        hot = final[final["item"] == "hot"]
        assert len(hot) == 1
        true_hot = 400
        assert int(hot["count_lower"].iloc[0]) <= true_hot
        assert true_hot - int(hot["count_lower"].iloc[0]) <= 1200 / 11 + 1
        assert len(final) <= 10
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_validation(spark):
    df = spark.createDataFrame([(0, "a")], "shard long, item string")
    with pytest.raises(ValueError):
        streaming_misra_gries(df, "item", k=0)
    with pytest.raises(ValueError):
        streaming_misra_gries(df, "item", k=4, n_shards=0)


def test_null_items_excluded_from_counters_and_n_seen(spark):
    import duckdb

    rows = [(0, "a"), (0, None), (0, "a"), (0, None), (0, "b")]
    batch = spark.createDataFrame(rows, "shard long, item string")
    tmp = tempfile.mkdtemp()
    try:
        batch.coalesce(1).write.parquet(f"{tmp}/data")
        stream = spark.readStream.schema(batch.schema).parquet(f"{tmp}/data")
        out = streaming_misra_gries(stream, "item", k=4, shard_col="shard")
        got = _drain(spark, out, "mg_nulls").toPandas()
        assert set(got["item"]) == {"a", "b"}
        assert (got["n_seen"] == 3).all()  # nulls not counted
        con = duckdb.connect()
        con.register("src_null", batch.toPandas())
        want = con.sql(
            misra_gries_oracle_sql("SELECT * FROM src_null", "item", "shard", k=4)
        ).df()
        assert sorted(want["item"]) == sorted(got["item"])
        assert want["n_seen"].tolist() == [3, 3]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
