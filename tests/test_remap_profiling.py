"""E5 metric remapping + A12 profiling metrics."""

from datetime import datetime

from opentelemetry_collector_components_spark.operators.profiling import (
    custom_aggregation,
    profiling_metrics,
)
from opentelemetry_collector_components_spark.operators.remap import remap_metric_names


def test_remap_appends_and_guards(spark):
    df = spark.createDataFrame(
        [("system.cpu.utilization", 0.5), ("custom.metric", 1.0)],
        ["metric_name", "value"],
    )
    out = remap_metric_names(df)
    names = sorted(r["metric_name"] for r in out.collect())
    assert names == ["custom.metric", "system.cpu.total.norm.pct", "system.cpu.utilization"]
    # idempotent: running again adds nothing new (remapped rows are guarded,
    # and the original re-maps to an already-present name only once)
    again = remap_metric_names(out.filter("otel_remapped"))
    assert again.count() == out.filter("otel_remapped").count()


def test_remap_drop_original(spark):
    df = spark.createDataFrame(
        [("system.memory.usage", 10.0), ("custom.metric", 1.0)],
        ["metric_name", "value"],
    )
    out = remap_metric_names(df, drop_original=True)
    names = sorted(r["metric_name"] for r in out.collect())
    assert names == ["custom.metric", "system.memory.actual.used.bytes"]


def _ts(s):
    return datetime.fromisoformat(s)


def test_profiling_metrics(spark):
    rows = [
        (_ts("2026-01-01T00:00:10"), "native", "vmlinux::do_syscall"),
        (_ts("2026-01-01T00:00:20"), "native", "libfoo::bar"),
        (_ts("2026-01-01T00:00:40"), "python", "app.py::main"),
        (_ts("2026-01-01T00:01:10"), "python", "app.py::worker"),
    ]
    df = spark.createDataFrame(rows, ["ts", "frame_type", "frame_name"])
    out = {(str(r["window_start"]), r["frame_type"]): r["samples"] for r in profiling_metrics(df).collect()}
    assert out[("2026-01-01 00:00:00", "native")] == 2
    assert out[("2026-01-01 00:00:00", "python")] == 1
    assert out[("2026-01-01 00:01:00", "python")] == 1

    labels: dict[str, int] = {}
    for r in custom_aggregation(df, r"^(\w+)\.py::").collect():
        labels[r["label"]] = labels.get(r["label"], 0) + r["samples"]
    assert labels["app"] == 2  # summed across windows
    assert labels[""] == 2  # unmatched bucket


def test_hostmetrics_full_remap(spark):
    """E5 full form: cpu/memory/load pivot into Elastic system metrics with
    pct-scaled-by-cores vs norm semantics and per-scraper datasets."""
    from opentelemetry_collector_components_spark.operators.remap import (
        remap_hostmetrics,
    )

    rows = [
        ("h1", 0, "system.cpu.utilization", "user", 0.25),
        ("h1", 0, "system.cpu.utilization", "system", 0.10),
        ("h1", 0, "system.cpu.utilization", "idle", 0.55),
        ("h1", 0, "system.cpu.utilization", "wait", 0.05),
        ("h1", 0, "system.cpu.logical.count", None, 8.0),
        ("h1", 0, "system.memory.usage", "used", 600.0),
        ("h1", 0, "system.memory.usage", "free", 200.0),
        ("h1", 0, "system.memory.usage", "cached", 150.0),
        ("h1", 0, "system.memory.usage", "buffered", 50.0),
        ("h1", 0, "system.cpu.load_average.1m", None, 4.0),
        ("h1", 0, "system.cpu.load_average.5m", None, 2.0),
        ("h1", 0, "system.cpu.load_average.15m", None, 1.0),
        # second host with ONLY load -> no cpu/memory rows may be fabricated
        ("h2", 0, "system.cpu.load_average.1m", None, 3.0),
        ("h2", 0, "system.cpu.logical.count", None, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "host STRING, ts INT, metric_name STRING, state STRING, value DOUBLE"
    )
    out = remap_hostmetrics(df)
    h1 = {r["metric_name"]: (round(r["value"], 6), r["dataset"])
          for r in out.filter("host='h1'").collect()}
    assert h1["system.cpu.user.pct"] == (2.0, "system.cpu")
    assert h1["system.cpu.user.norm.pct"] == (0.25, "system.cpu")
    assert h1["system.cpu.total.norm.pct"] == (0.4, "system.cpu")  # 1-idle-wait
    assert h1["system.cpu.total.pct"] == (3.2, "system.cpu")
    assert h1["system.cpu.cores"] == (8.0, "system.cpu")
    assert h1["system.memory.total"] == (1000.0, "system.memory")
    assert h1["system.memory.actual.free"] == (400.0, "system.memory")
    assert h1["system.memory.actual.used.bytes"] == (600.0, "system.memory")
    assert h1["system.memory.used.pct"] == (0.6, "system.memory")
    assert h1["system.load.norm.5"] == (0.25, "system.load")
    h2 = {r["metric_name"] for r in out.filter("host='h2'").collect()}
    assert not any("memory" in m or "cpu.total" in m for m in h2)
    assert {"system.load.1", "system.load.norm.1", "system.load.cores"} <= h2
    # every row carries the integration-routing decorations
    assert out.filter("event_module <> 'system' OR NOT otel_remapped").count() == 0
