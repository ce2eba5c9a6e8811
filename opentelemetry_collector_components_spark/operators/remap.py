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
