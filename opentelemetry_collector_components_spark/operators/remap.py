"""Metric-name remapping — elasticinframetricsprocessor analog (E5).

The reference remaps OTel host/k8s metric names to Elastic system metrics
via opentelemetry-lib remappers, with an idempotency guard scope-attr and
an optional drop-original switch
(processor/elasticinframetricsprocessor/processor.go:51-118).

Spark-first: the mapping is a literal ``create_map`` (or broadcast join for
big tables); idempotency is a boolean column instead of a scope attribute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# OTel hostmetrics -> Elastic system metrics (illustrative subset of the
# opentelemetry-lib remapper tables the processor delegates to)
DEFAULT_METRIC_MAP = {
    "system.cpu.utilization": "system.cpu.total.norm.pct",
    "system.memory.usage": "system.memory.actual.used.bytes",
    "system.network.io": "system.network.in.bytes",
    "system.filesystem.usage": "system.filesystem.used.bytes",
}


def remap_metric_names(
    metrics: DataFrame,
    mapping: dict[str, str] | None = None,
    name_col: str = "metric_name",
    drop_original: bool = False,
) -> DataFrame:
    """Adds remapped rows (or replaces, with ``drop_original``).

    - already-remapped rows are guarded by the ``otel_remapped`` flag
      (idempotency, processor.go:85-96);
    - unmapped names pass through untouched.
    """
    mapping = mapping if mapping is not None else DEFAULT_METRIC_MAP
    if "otel_remapped" not in metrics.columns:
        metrics = metrics.withColumn("otel_remapped", F.lit(False))
    mexpr = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    target = F.element_at(mexpr, F.col(name_col))

    eligible = (~F.col("otel_remapped")) & target.isNotNull()
    remapped = metrics.filter(eligible).withColumn(name_col, target).withColumn(
        "otel_remapped", F.lit(True)
    )
    if drop_original:
        untouched = metrics.filter(~eligible)
        return untouched.unionByName(remapped)
    return metrics.unionByName(remapped)


# ---------------------------------------------------------------------------
# Full hostmetrics -> Elastic system metrics remap (E5 full form).
#
# The reference delegates to the public opentelemetry-lib hostmetrics
# remappers (processor.go:51-117); that library is not vendored in the
# reference checkout, so the cpu/memory/load tables below are transcribed
# from its public repository's documented behavior (Elastic system.*
# integration semantics): state-attributed OTel gauges pivot into the
# Elastic metric names, `.pct` values scale by core count, `.norm.pct`
# values stay normalized, and every output row carries event.module=system
# plus the system.<scraper> dataset used for data-stream routing
# (WithSystemIntegrationDataset(true), processor.go:54).
# ---------------------------------------------------------------------------
CPU_STATES = ["user", "system", "idle", "nice", "irq", "softirq", "steal", "wait"]


def remap_hostmetrics(
    metrics: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts",
    name_col: str = "metric_name",
    state_col: str = "state",
    value_col: str = "value",
) -> DataFrame:
    """Pivots OTel hostmetrics rows into Elastic system metrics.

    Input: long-form datapoints (host, ts, metric_name, state, value) with
    OTel names ``system.cpu.utilization`` (state-attributed),
    ``system.cpu.logical.count``, ``system.memory.usage``
    (state-attributed), ``system.cpu.load_average.{1m,5m,15m}``.
    Output: long-form Elastic rows (host, ts, metric_name, value, dataset).
    One hash-aggregate per (host, ts) then a JVM-side explode — one shuffle,
    no Python."""
    name, state, value = F.col(name_col), F.col(state_col), F.col(value_col)

    def pick(metric: str, st: str | None = None) -> F.Column:
        cond = name == metric
        if st is not None:
            cond = cond & (state == st)
        return F.max(F.when(cond, value))

    aggs = [pick("system.cpu.utilization", s).alias(f"cpu_{s}") for s in CPU_STATES]
    aggs += [
        pick("system.cpu.logical.count").alias("cores"),
        pick("system.memory.usage", "used").alias("mem_used"),
        pick("system.memory.usage", "free").alias("mem_free"),
        pick("system.memory.usage", "cached").alias("mem_cached"),
        pick("system.memory.usage", "buffered").alias("mem_buffered"),
        pick("system.cpu.load_average.1m").alias("load1"),
        pick("system.cpu.load_average.5m").alias("load5"),
        pick("system.cpu.load_average.15m").alias("load15"),
    ]
    g = metrics.groupBy(host_col, ts_col).agg(*aggs)

    cores = F.col("cores")
    mem_cols = ["mem_used", "mem_free", "mem_cached", "mem_buffered"]
    has_mem = F.greatest(*[F.col(c).isNotNull() for c in mem_cols])
    mem_total = F.when(
        has_mem,
        sum((F.coalesce(F.col(c), F.lit(0.0)) for c in mem_cols), F.lit(0.0)),
    )
    actual_free = F.when(
        has_mem,
        F.coalesce(F.col("mem_free"), F.lit(0.0))
        + F.coalesce(F.col("mem_cached"), F.lit(0.0))
        + F.coalesce(F.col("mem_buffered"), F.lit(0.0)),
    )
    actual_used = mem_total - actual_free
    # total utilization derives from idle (+iowait); absent cpu data must not
    # fabricate a 1.0 total
    total_norm = F.when(
        F.col("cpu_idle").isNotNull(),
        F.lit(1.0)
        - F.col("cpu_idle")
        - F.coalesce(F.col("cpu_wait"), F.lit(0.0)),
    )

    def out(n: str, v: F.Column, ds: str) -> F.Column:
        return F.struct(
            F.lit(n).alias("metric_name"),
            v.cast("double").alias("value"),
            F.lit(ds).alias("dataset"),
        )

    rows = []
    for s in CPU_STATES:
        u = F.col(f"cpu_{s}")
        rows.append(out(f"system.cpu.{s}.pct", u * cores, "system.cpu"))
        rows.append(out(f"system.cpu.{s}.norm.pct", u, "system.cpu"))
    rows += [
        out("system.cpu.total.pct", total_norm * cores, "system.cpu"),
        out("system.cpu.total.norm.pct", total_norm, "system.cpu"),
        out("system.cpu.cores", cores, "system.cpu"),
        out("system.memory.total", mem_total, "system.memory"),
        out("system.memory.used.bytes", F.col("mem_used"), "system.memory"),
        out("system.memory.free", F.col("mem_free"), "system.memory"),
        out("system.memory.actual.free", actual_free, "system.memory"),
        out("system.memory.actual.used.bytes", actual_used, "system.memory"),
        out("system.memory.used.pct",
            F.col("mem_used") / F.nullif(mem_total, F.lit(0.0)), "system.memory"),
        out("system.memory.actual.used.pct",
            actual_used / F.nullif(mem_total, F.lit(0.0)), "system.memory"),
        out("system.load.1", F.col("load1"), "system.load"),
        out("system.load.5", F.col("load5"), "system.load"),
        out("system.load.15", F.col("load15"), "system.load"),
        out("system.load.norm.1", F.col("load1") / cores, "system.load"),
        out("system.load.norm.5", F.col("load5") / cores, "system.load"),
        out("system.load.norm.15", F.col("load15") / cores, "system.load"),
        out("system.load.cores", cores, "system.load"),
    ]
    exploded = g.select(
        host_col, ts_col,
        F.explode(F.filter(F.array(*rows), lambda r: r["value"].isNotNull())).alias("m"),
    )
    return exploded.select(
        host_col, ts_col,
        F.col("m.metric_name").alias(name_col),
        F.col("m.value").alias(value_col),
        F.col("m.dataset").alias("dataset"),
        F.lit("system").alias("event_module"),
        F.lit(True).alias("otel_remapped"),
    )
