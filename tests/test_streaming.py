"""Streaming interval aggregation == batch aggregation on the same data."""

import shutil
import tempfile

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.enrich import (
    derive_event_fields,
    enrich_with_dim,
)
from opentelemetry_collector_components_spark.operators.parse import parse_pages
from opentelemetry_collector_components_spark.sources.dims import generate_domain_dim
from opentelemetry_collector_components_spark.sources.pages import generate_pages
from opentelemetry_collector_components_spark.streaming.interval import (
    run_stream_to_memory,
    streaming_interval_agg,
)


def test_stream_equals_batch(spark):
    tmp = tempfile.mkdtemp()
    data_dir, ckpt = f"{tmp}/data", f"{tmp}/ckpt"
    try:
        enriched = derive_event_fields(
            enrich_with_dim(parse_pages(generate_pages(spark, 5000)), generate_domain_dim(spark))
        )
        enriched.write.mode("overwrite").parquet(data_dir)
        static = spark.read.parquet(data_dir)

        stream = spark.readStream.schema(static.schema).parquet(data_dir)
        agg = streaming_interval_agg(stream, keys=["geo"], interval="10 minutes")
        q = run_stream_to_memory(agg, "sagg", ckpt, mode="complete")
        q.processAllAvailable()
        q.stop()

        got = {
            (r["window_start"], r["geo"]): (r["docs"], r["dur_us_sum"])
            for r in spark.sql("select * from sagg").collect()
        }
        want = {
            (r["w"], r["geo"]): (r["docs"], r["dur_us_sum"])
            for r in static.groupBy(
                F.window("warc_ts", "10 minutes")["start"].alias("w"), "geo"
            )
            .agg(F.count(F.lit(1)).alias("docs"), F.sum("dur_us").alias("dur_us_sum"))
            .collect()
        }
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_watermark_present(spark):
    enriched = derive_event_fields(
        enrich_with_dim(parse_pages(generate_pages(spark, 100)), generate_domain_dim(spark))
    )
    tmp = tempfile.mkdtemp()
    try:
        enriched.write.mode("overwrite").parquet(f"{tmp}/d")
        static = spark.read.parquet(f"{tmp}/d")
        stream = spark.readStream.schema(static.schema).parquet(f"{tmp}/d")
        agg = streaming_interval_agg(stream, keys=["geo"], watermark="5 minutes")
        assert agg.isStreaming
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_rollup_equals_batch_all_intervals(spark):
    """streaming_interval_rollup: the 1m stateful aggregate AND the
    10m/60m foreachBatch-derived rollups must each equal the direct batch
    aggregate at that interval."""
    from opentelemetry_collector_components_spark.operators.aggregate import (
        trunc_to_interval,
    )
    from opentelemetry_collector_components_spark.streaming.interval import (
        streaming_interval_rollup,
    )

    tmp = tempfile.mkdtemp()
    data_dir, ckpt, out = f"{tmp}/data", f"{tmp}/ckpt", f"{tmp}/out"
    try:
        rows = spark.range(20000).select(
            F.timestamp_seconds(1_700_000_000 + F.col("id") * 37).alias("ts"),
            F.concat(F.lit("t"), F.col("id") % 5).alias("event_type"),
            (F.col("id") % 100 / 7.0).alias("value"),
        )
        rows.write.mode("overwrite").parquet(data_dir)
        static = spark.read.parquet(data_dir)

        stream = spark.readStream.schema(static.schema).parquet(data_dir)
        q = streaming_interval_rollup(
            stream, ["event_type"], out, ckpt, query_name="rollup_t"
        )
        q.awaitTermination()
        got = spark.read.parquet(out)

        for ivl in ("1m", "10m", "60m"):
            expect = static.groupBy(
                trunc_to_interval(F.col("ts"), ivl).alias("window_start"),
                "event_type",
            ).agg(
                F.count(F.lit(1)).alias("docs"),
                F.round(F.sum("value"), 6).alias("value_sum"),
            )
            g = got.filter(F.col("metricset_interval") == ivl).select(
                "window_start",
                "event_type",
                "docs",
                F.round("value_sum", 6).alias("value_sum"),
            )
            assert g.exceptAll(expect).count() == 0, ivl
            assert expect.exceptAll(g).count() == 0, ivl
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_update_rollup_bounded_writes_and_equals_batch(spark):
    """Update-mode rollup (VERDICT r3 #3): per-batch sink writes are
    bounded by the batch's touched keys/partitions, not total state, and
    the read-time rollup equals the batch fold over all input."""
    import os

    from opentelemetry_collector_components_spark.operators.aggregate import (
        trunc_to_interval,
    )
    from opentelemetry_collector_components_spark.streaming.interval import (
        read_interval_rollup,
        streaming_interval_rollup_update,
    )

    tmp = tempfile.mkdtemp()
    indir, partials, ckpt = f"{tmp}/in", f"{tmp}/partials", f"{tmp}/ckpt"
    os.makedirs(indir)
    try:
        # three single-file batches: hour 0, hour 1, then hour 1 again
        # (updating existing keys) — mtimes pin the processing order
        specs = [("2024-01-01 00:", 0), ("2024-01-01 01:", 1), ("2024-01-01 01:", 2)]
        for i, (hour_prefix, salt) in enumerate(specs):
            df = spark.range(120).select(
                F.to_timestamp(
                    F.concat(
                        F.lit(hour_prefix),
                        F.lpad((F.col("id") % 50).cast("string"), 2, "0"),
                        F.lit(":00"),
                    )
                ).alias("ts"),
                F.concat(F.lit("k"), (F.col("id") % 3).cast("string")).alias(
                    "event_type"
                ),
                (F.col("id") + salt).cast("double").alias("value"),
            )
            path = f"{indir}/f{i}.parquet"
            df.coalesce(1).write.mode("overwrite").parquet(path)
            os.utime(path, (1000 + i, 1000 + i))
            for e in os.scandir(path):
                os.utime(e.path, (1000 + i, 1000 + i))

        schema = spark.read.parquet(f"{indir}/f0.parquet").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{indir}/f*.parquet")
        )
        stats = []
        q = streaming_interval_rollup_update(
            stream, ["event_type"], partials, ckpt,
            query_name="rollup_update_test", stats=stats,
        )
        q.awaitTermination()

        assert len(stats) == 3
        total_state = spark.read.parquet(partials).count()
        # 2 hours x 50 minutes x 3 keys of state; the last batch touched
        # only hour 1, so it wrote only that partition's rows
        last = stats[-1]
        assert last["partitions_touched"] == 1
        assert last["rows_written"] == total_state / 2
        assert last["rows_written"] < total_state
        # updated_rows == touched keys for the batch, not total state
        assert last["updated_rows"] <= 50 * 3

        got = {
            (str(r["window_start"]), r["event_type"], r["metricset_interval"]):
                (r["docs"], round(r["value_sum"], 4))
            for r in read_interval_rollup(spark, partials, ["event_type"]).collect()
        }
        allin = spark.read.parquet(f"{indir}/f*.parquet")
        want = {}
        for ivl in ("1m", "10m", "60m"):
            rolled = allin.groupBy(
                trunc_to_interval(F.col("ts"), ivl).alias("w"), "event_type"
            ).agg(F.count(F.lit(1)).alias("docs"), F.sum("value").alias("vs"))
            for r in rolled.collect():
                want[(str(r["w"]), r["event_type"], ivl)] = (
                    r["docs"], round(r["vs"], 4)
                )
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_session_window_flushes_on_watermark(spark):
    """Streaming session_window (append mode): sessions emit only once the
    watermark passes their end; a later batch far beyond the gap flushes
    the earlier sessions, and the flushed set equals the batch-mode
    session_window result over the same early data."""
    import os

    tmp = tempfile.mkdtemp()
    indir, ckpt = f"{tmp}/in", f"{tmp}/ckpt"
    os.makedirs(indir)
    try:
        # file 0: two sessions per user inside hour 0 (gap 10 min)
        early = spark.createDataFrame(
            [("u1", 0), ("u1", 60), ("u1", 3600), ("u2", 120)],
            "user_id string, t long",
        ).select("user_id", F.timestamp_seconds("t").alias("ts"))
        # file 1: a day later — watermark jumps far past every early session
        late = spark.createDataFrame(
            [("u1", 90000), ("u2", 90060)], "user_id string, t long"
        ).select("user_id", F.timestamp_seconds("t").alias("ts"))
        for i, df in enumerate((early, late)):
            path = f"{indir}/f{i}.parquet"
            df.coalesce(1).write.mode("overwrite").parquet(path)
            os.utime(path, (1000 + i, 1000 + i))
            for e in os.scandir(path):
                os.utime(e.path, (1000 + i, 1000 + i))

        schema = spark.read.parquet(f"{indir}/f0.parquet").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{indir}/f*.parquet")
        )
        agg = (
            stream.withWatermark("ts", "1 minute")
            .groupBy(F.session_window("ts", "10 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "user_id",
                F.col("session_window.start").alias("s"),
                "n",
            )
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("sess_stream")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["user_id"], str(r["s"])): r["n"]
            for r in spark.sql("select * from sess_stream").collect()
        }
        want = {
            (r["user_id"], str(r["s"])): r["n"]
            for r in early.groupBy(
                F.session_window("ts", "10 minutes"), "user_id"
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select("user_id", F.col("session_window.start").alias("s"), "n")
            .collect()
        }
        # every early session flushed by the day-later watermark; the late
        # rows' own sessions stay in state (watermark never passes them)
        assert got == want
        assert len(got) == 3
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_dedup_stream_watermark_evicts_and_reemits(spark):
    """dropDuplicatesWithinWatermark trade pinned: a replay inside the
    delay window is suppressed; after the watermark evicts the key's
    state, the same key with a fresh event time is emitted again."""
    from opentelemetry_collector_components_spark.streaming.dedup import dedup_stream

    tmp = tempfile.mkdtemp()
    try:
        ddl = "event_id string, ts timestamp, value long"
        b1 = spark.createDataFrame(
            [("A", "2026-01-01T10:00:00", 1),
             ("A", "2026-01-01T10:00:02", 2),   # in-batch replay -> suppressed
             ("B", "2026-01-01T10:00:01", 3)],
            "event_id string, ts_s string, value long",
        ).selectExpr("event_id", "cast(ts_s as timestamp) ts", "value")
        # advances watermark to 11:59:50 (max ts - 10 min) >> A's 10:00 state
        b2 = spark.createDataFrame(
            [("A", "2026-01-01T10:00:05", 4),   # replay within delay -> suppressed
             ("C", "2026-01-01T12:09:50", 5)],
            "event_id string, ts_s string, value long",
        ).selectExpr("event_id", "cast(ts_s as timestamp) ts", "value")
        # eviction lags one batch: batch N removes state using the
        # watermark computed at the END of batch N-1 -- so a spacer batch
        # sits between the watermark advance and the re-emit probe
        b3 = spark.createDataFrame(
            [("D", "2026-01-01T12:09:52", 9)],
            "event_id string, ts_s string, value long",
        ).selectExpr("event_id", "cast(ts_s as timestamp) ts", "value")
        b4 = spark.createDataFrame(
            [("A", "2026-01-01T12:09:55", 6)],  # state evicted -> re-emitted
            "event_id string, ts_s string, value long",
        ).selectExpr("event_id", "cast(ts_s as timestamp) ts", "value")
        for i, b in enumerate((b1, b2, b3, b4)):
            b.coalesce(1).write.parquet(f"{tmp}/in/b{i}")
        stream = (
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in/*")
        )
        out = dedup_stream(stream, ["event_id"], watermark_col="ts", delay="10 minutes")
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_wm")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        vals = sorted(r.value for r in spark.table("dedup_wm").collect())
        # first A, B, C, spacer D, and the post-eviction A re-emit;
        # replays 2 and 4 gone
        assert vals == [1, 3, 5, 6, 9]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_windowed_distinct_count_exact_under_replay(spark):
    """Exact streaming distinct: the same input delivered twice as two
    micro-batches yields the SAME per-window distinct counts as one batch
    pass -- duplicate ids collapse in the chained dedup state."""
    from opentelemetry_collector_components_spark.streaming.distinct import (
        windowed_distinct_count,
    )

    tmp = tempfile.mkdtemp()
    try:
        rows = [
            ("2026-01-01T10:01:00", 1, "view"),
            ("2026-01-01T10:02:00", 1, "view"),   # same user, same window
            ("2026-01-01T10:03:00", 2, "view"),
            ("2026-01-01T10:14:00", 1, "view"),   # next window
            ("2026-01-01T10:04:00", 3, "click"),
        ]
        base = spark.createDataFrame(
            rows, "ts_s string, user_id long, event_type string"
        ).selectExpr("cast(ts_s as timestamp) ts", "user_id", "event_type")
        base.coalesce(1).write.parquet(f"{tmp}/in/d0")
        base.coalesce(1).write.parquet(f"{tmp}/in/d1")   # full replay
        stream = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in/*")
        )
        agg = windowed_distinct_count(
            stream, window="10 minutes", watermark_delay="1 hour"
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("distinct_replay")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            (r["_w"].start.strftime("%H:%M"), r.event_type): r.n_distinct
            for r in spark.table("distinct_replay").collect()
        }
        assert got == {
            ("10:00", "view"): 2,
            ("10:00", "click"): 1,
            ("10:10", "view"): 1,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_watermark_drops_late_rows_with_bounded_updates(spark):
    # the late-drop gate's shared driver returns (merged partials, stats):
    # late rows (2h behind the frontier, 10m watermark) must never reach
    # the sink, and the final batch's update volume must be bounded by its
    # on-time (window, key) groups — not by accumulated state
    from opentelemetry_collector_components_spark.queries import (
        _late_drop_run,
        load,
    )

    sf = "/root/testdata/sf0.001"
    out, stats = _late_drop_run(spark, sf)
    assert [s["batch_id"] for s in stats] == [0, 1, 2]

    ev = load(spark, sf, "events")
    n_types = ev.select("event_type").distinct().count()
    # batch 2 (filler) touches only the frontier minute: <= one window/key
    assert 0 < stats[1]["updated_rows"] <= n_types
    # batch 3 carries late + on-time rows; late ones are DROPPED, so the
    # update volume is again <= the frontier's window/key groups (were the
    # late rows admitted, their 2h-old windows would double this)
    assert 0 < stats[2]["updated_rows"] <= n_types
    assert stats[2]["partitions_touched"] == 1  # only the frontier hour

    # and no 2h-old window exists in the sink beyond what batch 1 wrote:
    # every window_start older than frontier-10m came from batch-1 data
    from pyspark.sql import functions as F

    b1_minutes = {
        r[0]
        for r in ev.where(F.col("event_id") % 4 != 0)
        .select(F.date_format(F.date_trunc("minute", "ts"), "yyyy-MM-dd HH:mm:ss"))
        .distinct()
        .collect()
    }
    sink_minutes = {r["window_start"] for r in out.collect()}
    frontier = max(b1_minutes)
    assert sink_minutes - b1_minutes <= {frontier}
