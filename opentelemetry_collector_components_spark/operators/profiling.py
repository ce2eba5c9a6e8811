"""Profiles -> metrics — profilingmetricsconnector analog (A12).

The reference classifies stack frames per type and emits CPU sample-count
metrics, with optional regex ``custom_aggregations`` extracting labels from
frame names, pre-aggregated over a flush interval
(connector/profilingmetricsconnector/connector.go:86-105, frame.go:29-495,
consumer_agg.go:33-224).

Spark-first: ``regexp_extract`` + windowed groupBy counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .aggregate import trunc_to_interval

FRAME_TYPES = ["native", "kernel", "jvm", "python", "go", "dotnet"]


def profiling_metrics(
    samples: DataFrame,
    interval: str = "1m",
    time_col: str = "ts",
    frame_type_col: str = "frame_type",
    weight_col: str | None = None,
) -> DataFrame:
    """Per (window, frame_type) CPU sample counts."""
    win = trunc_to_interval(F.col(time_col), interval)
    w = F.col(weight_col) if weight_col else F.lit(1)
    return samples.groupBy(win.alias("window_start"), frame_type_col).agg(
        F.sum(w).cast("long").alias("samples")
    )


def custom_aggregation(
    samples: DataFrame,
    pattern: str,
    interval: str = "1m",
    time_col: str = "ts",
    frame_name_col: str = "frame_name",
) -> DataFrame:
    """Regex label extraction over frame names + windowed counts
    (connector.go:94-101): rows whose frame name doesn't match are grouped
    under the empty label, like the reference's unmatched bucket."""
    win = trunc_to_interval(F.col(time_col), interval)
    label = F.regexp_extract(F.col(frame_name_col), pattern, 1)
    return samples.groupBy(win.alias("window_start"), label.alias("label")).agg(
        F.count(F.lit(1)).alias("samples")
    )
