"""Flow control — ratelimitprocessor analog (L1), Spark-native form.

The reference throttles per client-metadata key with token buckets and
either rejects or delays (processor/ratelimitprocessor/local.go:68-179).
Batch Spark has no admission control to express — scheduling IS the
backpressure (SURVEY.md L1: documented non-goal).  What Spark *does* expose
is source-side rate limiting for streaming jobs, which serves the same
operational purpose (bounding per-trigger work so downstream state and
sinks keep up):

- file sources: ``maxFilesPerTrigger`` / ``maxBytesPerTrigger``
- kafka: ``maxOffsetsPerTrigger``
- rate source: ``rowsPerSecond``

``reader_with_admission`` centralizes those knobs; ``per_key_quota`` gives
the per-key "requests" strategy (config.go:97-130) as a per-batch
deterministic quota: rank within key, keep <= quota, tag the rest —
throttle behavior 'error' (drop to a rejected frame) vs 'tag'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def reader_with_admission(
    spark,
    fmt: str,
    path: str | None = None,
    schema=None,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: str | None = None,
    rows_per_second: int | None = None,
):
    """Streaming reader with source-side rate limits applied."""
    r = spark.readStream.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    if max_bytes_per_trigger is not None:
        r = r.option("maxBytesPerTrigger", max_bytes_per_trigger)
    if rows_per_second is not None:
        r = r.option("rowsPerSecond", rows_per_second)
    return r.load(path) if path else r.load()


def per_key_quota(
    df: DataFrame,
    key_cols: list[str],
    quota: int,
    order_col: str,
    behavior: str = "tag",
) -> DataFrame:
    """Deterministic per-key admission: first ``quota`` rows per key (by
    ``order_col``) admitted; the rest tagged ``throttled`` or dropped
    ('error' behavior == reject, local.go:133-179)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col))
    out = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "throttled", F.col("_rn") > quota
    ).drop("_rn")
    if behavior == "error":
        return out.filter(~F.col("throttled")).drop("throttled")
    return out
