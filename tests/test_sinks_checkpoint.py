"""M5: fan-out writes, lineage, resumable checkpoint (FIXTURES.md §6)."""

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.plans.checkpoint import (
    completed_units,
    run_resumable,
)
from opentelemetry_collector_components_spark.plans.pipeline import DEFAULT_SPEC, run_e2e
from opentelemetry_collector_components_spark.plans.sinks import (
    read_lineage,
    sink_path,
    write_fanout,
    write_per_sink,
)


@pytest.fixture()
def routed(spark):
    return run_e2e(spark, 5000, intervals=("60m",))["_routed"].cache()


def _routes(df):
    return sorted(r[0] for r in df.select("sink").distinct().collect())


def test_fanout_single_pass(spark, routed, tmp_path):
    out = write_fanout(routed, str(tmp_path))
    back = spark.read.parquet(out)
    assert back.count() == 5000
    per_sink = {r["sink"]: r["cnt"] for r in back.groupBy("sink").agg(F.count("*").alias("cnt")).collect()}
    expected = {r["sink"]: r["cnt"] for r in routed.groupBy("sink").agg(F.count("*").alias("cnt")).collect()}
    assert per_sink == expected


def test_per_sink_writes_and_lineage(spark, routed, tmp_path):
    routes = _routes(routed)
    written = write_per_sink(routed, str(tmp_path), routes)
    assert written == routes
    lin = read_lineage(spark, str(tmp_path))
    lrows = {r["sink"]: r["rows_out"] for r in lin.collect()}
    for route in routes:
        assert spark.read.parquet(sink_path(str(tmp_path), route)).count() == lrows[route]
    # malformed rows only ever reach the error sink
    err = spark.read.parquet(sink_path(str(tmp_path), "logs.error"))
    assert routed.filter("malformed").count() == err.filter("malformed").count()


def test_resume_after_crash_counts_identical(spark, routed, tmp_path):
    """Kill between sinks; re-run; per-sink counts equal an uninterrupted run."""
    routes = _routes(routed)
    base = str(tmp_path / "resumable")

    def unit(route):
        def _run():
            part = routed.filter(F.col("sink") == route)
            part.write.mode("overwrite").parquet(sink_path(base, route))
            return part.count()
        return _run

    units = {r: unit(r) for r in routes}
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(spark, base, units, fail_after=2)
    assert len(completed_units(spark, base)) == 2

    status = run_resumable(spark, base, units)  # resume
    assert sorted(k for k, v in status.items() if v == "skipped") == sorted(routes)[:2]

    # uninterrupted control run
    control = str(tmp_path / "control")
    run_resumable(spark, control, {r: unit(r) for r in routes})
    for route in routes:
        a = spark.read.parquet(sink_path(base, route).replace(control, base)).count()
        b = routed.filter(F.col("sink") == route).count()
        assert a == b

    # idempotent third run: everything skipped
    status3 = run_resumable(spark, base, units)
    assert set(status3.values()) == {"skipped"}


def test_pipeline_spec_unknown_stage(spark):
    from opentelemetry_collector_components_spark.plans.pipeline import PipelineSpec
    from opentelemetry_collector_components_spark.sources.pages import generate_pages

    with pytest.raises(ValueError, match="unknown stage"):
        PipelineSpec([{"type": "nope"}]).build(generate_pages(spark, 10), spark)


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key with the same bucket count join
    without any Exchange; the same join on plain parquet shuffles both
    sides.  This is the co-located-join contract write_bucketed exists for."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.plans.sinks import write_bucketed

    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") + 1).alias("vb"))
    write_bucketed(a, "bt_a", ["k"], 4, sort_cols=["k"], path=str(tmp_path / "a"))
    write_bucketed(b, "bt_b", ["k"], 4, sort_cols=["k"], path=str(tmp_path / "b"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bt_a").join(spark.table("bt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert j.count() == 1000

        pa, pb = str(tmp_path / "pa"), str(tmp_path / "pb")
        a.write.parquet(pa)
        b.write.parquet(pb)
        flat = spark.read.parquet(pa).join(spark.read.parquet(pb), "k")
        flat_plan = flat._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in flat_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_pipeline_variables_and_stage_observations(spark):
    """S8 template substitution (${name}/${name:default}) + the
    telemetryBuilder per-stage counter analog via Observation (no extra
    pass: metrics ride the single action)."""
    import pytest as _pytest

    from opentelemetry_collector_components_spark.plans.pipeline import PipelineSpec
    from opentelemetry_collector_components_spark.sources.pages import generate_pages

    spec = PipelineSpec(stages=[
        {"type": "parse", "engine": "${engine:sql}"},
        {"type": "enrich"},
        {"type": "derive"},
        {"type": "route", "namespace": "${ns}"},
    ])
    pages = generate_pages(spark, 2000)
    built = spec.build(pages, spark, variables={"ns": "prod"}, observe=True)
    built.write.mode("overwrite").format("noop").save()
    assert built.schema["namespace"].dataType.typeName() == "string"
    m = spec.stage_metrics()
    assert set(m) == {"stage0:parse", "stage1:enrich", "stage2:derive", "stage3:route"}
    assert all(v["rows_out"] == 2000 for v in m.values())  # narrow stages conserve rows
    assert built.filter("namespace = 'prod'").count() == 2000
    with _pytest.raises(KeyError):
        spec.build(pages, spark, variables={})  # ${ns} has no default


def test_prw_export_payloads_round_trip(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.functions.protowire import (
        decode_write_request,
    )
    from opentelemetry_collector_components_spark.functions.snappy_codec import (
        snappy_decompress,
    )
    from opentelemetry_collector_components_spark.plans.sinks import (
        prw_export_payloads,
    )

    rows = [
        ("up", {"job": "a"}, 1.5, 1000),
        ("up", {"job": "a"}, 2.5, 2000),
        ("up", {"job": "b"}, 3.0, 1000),
        ("rpm", {"job": "a"}, 9.0, 500),
    ]
    df = spark.createDataFrame(
        rows, "name string, labels map<string,string>, value double, ts_ms long"
    )
    payloads = prw_export_payloads(df, n_shards=4).collect()
    # one series never splits across shards; counts add up
    assert sum(p.n_samples for p in payloads) == 4
    assert sum(p.n_series for p in payloads) == 3
    decoded = {}
    for p in payloads:
        for ts in decode_write_request(snappy_decompress(bytes(p.payload))):
            key = (ts["labels"]["__name__"], ts["labels"]["job"])
            assert key not in decoded  # no series split
            decoded[key] = ts["samples"]
    assert decoded[("up", "a")] == [(1.5, 1000), (2.5, 2000)]
    assert decoded[("up", "b")] == [(3.0, 1000)]
    assert decoded[("rpm", "a")] == [(9.0, 500)]


def test_e2e_spec_plan_broadcast_and_replayable_generator(spark):
    """The flagship gate's spec chain must keep the enrich join broadcast
    (never a shuffle for a 45-row dim) with zero per-row Python; and the
    replayable generator must differ from the hashed default ONLY in the
    two xxhash64-derived columns (domain, malformed pick)."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.plans.pipeline import PipelineSpec
    from opentelemetry_collector_components_spark.sources.pages import generate_pages

    spec = PipelineSpec(stages=[
        {"type": "parse", "engine": "sql"},
        {"type": "enrich"},
        {"type": "derive"},
        {"type": "route", "namespace": "${ns:prod}"},
    ])
    routed = spec.build(generate_pages(spark, 2000, replayable=True), spark, variables={})
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert routed.filter("namespace = 'prod'").count() == 2000

    # replayable vs default: same schema, same non-hashed columns
    a = generate_pages(spark, 500).select("doc_id", "warc_ts", "lang").collect()
    b = generate_pages(spark, 500, replayable=True).select(
        "doc_id", "warc_ts", "lang"
    ).collect()
    assert a == b
    # and the replayable malformed rate is the pinned exact 1%
    mal = (
        generate_pages(spark, 500, replayable=True)
        .filter(~F.col("text").contains("level="))
        .count()
    )
    assert mal == 5
