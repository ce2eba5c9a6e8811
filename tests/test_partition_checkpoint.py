"""Per-partition-range resumability: crash mid-scan, resume, totals exact."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.plans.checkpoint import (
    completed_units,
    partition_units,
    run_resumable,
)
from opentelemetry_collector_components_spark.sources.pages import generate_pages


def test_partition_range_resume(spark, tmp_path):
    base = str(tmp_path)
    N, UNITS = 10000, 8

    def build(lo, hi):
        return generate_pages(spark, N).filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))

    def write(df, i):
        df.write.mode("overwrite").parquet(f"{base}/out/part_{i:05d}")
        return df.count()

    units = partition_units(build, N, UNITS, write)
    assert len(units) == UNITS

    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(spark, base, units, fail_after=3)
    assert len(completed_units(spark, base)) == 3

    status = run_resumable(spark, base, units)
    assert sum(1 for v in status.values() if v == "skipped") == 3
    total = spark.read.parquet(f"{base}/out/part_*").count()
    assert total == N  # no loss, no duplication after resume
