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
