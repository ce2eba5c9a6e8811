"""Streaming statsd gauge state: cross-batch fold equals batch flush."""

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.sources.statsd import (
    decode_statsd,
    statsd_flush,
)
from opentelemetry_collector_components_spark.streaming.stateful import (
    statsd_gauge_stateful,
)

BATCH1 = ["g.a:+5|g", "g.a:100|g", "g.b:+3|g", "c.x:1|c"]
BATCH2 = ["g.a:+7|g", "g.a:-2|g", "g.b:-10|g"]


def _write_batches(spark, tmp):
    data = f"{tmp}/data"
    os.makedirs(data)
    seq = 0
    for n, lines in enumerate([BATCH1, BATCH2]):
        rows = [(seq + i, ln) for i, ln in enumerate(lines)]
        seq += len(lines)
        stage = f"{tmp}/stage{n}"
        spark.createDataFrame(rows, "seq long, line string").coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{data}/{n:03d}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1000 + n, 1000 + n))
    return data


def test_gauge_state_across_batches_equals_batch_flush(spark):
    tmp = tempfile.mkdtemp()
    try:
        data = _write_batches(spark, tmp)
        static = spark.createDataFrame(
            [(i, ln) for i, ln in enumerate(BATCH1 + BATCH2)], "seq long, line string"
        )
        stream = (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(data)
        )
        out = statsd_gauge_stateful(decode_statsd(stream))
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("gauge_state")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.table("gauge_state").toPandas()
        # per-batch emissions: batch1 -> a=100, b=3; batch2 -> a=105, b=-7
        a_vals = got[got["name"] == "g.a"]["flushed_milli"].tolist()
        b_vals = got[got["name"] == "g.b"]["flushed_milli"].tolist()
        assert a_vals == [100000, 105000]
        assert b_vals == [3000, -7000]
        # final values equal the batch flush over ALL rows seen
        want = (
            statsd_flush(decode_statsd(static), order_col="seq")
            .where(F.col("mtype") == "g")
            .toPandas()
            .set_index("name")["flushed_milli"]
            .to_dict()
        )
        assert want == {"g.a": 105000, "g.b": -7000}
        # counters never reach the gauge operator
        assert "c.x" not in set(got["name"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_delta_only_gauge_counts_from_zero_batch_parity(spark):
    dec = decode_statsd(
        spark.createDataFrame(
            [(0, "g.z:-4|g"), (1, "g.z:+1|g")], "seq long, line string"
        )
    )
    want = (
        statsd_flush(dec, order_col="seq")
        .where(F.col("mtype") == "g")
        .first()["flushed_milli"]
    )
    assert want == -3000  # floor convention on a negative fold
