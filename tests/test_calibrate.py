"""Per-source percentile + cross-source quantile calibration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.calibrate import (
    calibrate_to_global,
    per_source_percentile,
)

SCHEMA = "doc_id long, source string, bucket long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


class TestPerSourcePercentile:
    def test_hand_checked(self, spark):
        # source A: buckets 0,0,8,16 -> upper-CDF 50%,50%,75%,100%
        rows = [(1, "A", 0), (2, "A", 0), (3, "A", 8), (4, "A", 16),
                (5, "B", 8)]
        got = {r["doc_id"]: r["pct_ppm"]
               for r in per_source_percentile(_df(spark, rows), "bucket", "source").collect()}
        assert got == {1: 500000, 2: 500000, 3: 750000, 4: 1000000,
                       5: 1000000}

    def test_top_bucket_is_exactly_one_million(self, spark):
        rows = [(i, "A", (i % 3) * 8) for i in range(7)]
        top = max(
            per_source_percentile(_df(spark, rows), "bucket", "source").collect(),
            key=lambda r: r["bucket"],
        )
        assert top["pct_ppm"] == 1000000

    def test_null_bucket_raises(self, spark):
        rows = [(1, "A", 0), (2, "A", None)]
        with pytest.raises(Exception, match="bucket the score first"):
            per_source_percentile(_df(spark, rows), "bucket", "source").collect()


class TestCalibrateToGlobal:
    def test_shifted_source_maps_onto_global_scale(self, spark):
        # source LO scores in buckets 0/8, source HI in 16/24 — identical
        # shapes.  LO's median must calibrate to the global bucket holding
        # the same quantile, not stay at its raw low bucket.
        rows = [(i, "LO", 0) for i in range(5)] + [(i + 5, "LO", 8) for i in range(5)]
        rows += [(i + 10, "HI", 16) for i in range(5)] + [(i + 15, "HI", 24) for i in range(5)]
        out = calibrate_to_global(_df(spark, rows), "bucket", "source").collect()
        by = {(r["source"], r["bucket"]): r["calibrated_bucket"] for r in out}
        # global CDF: 0->.25, 8->.5, 16->.75, 24->1.0
        # LO: 0 -> .5 within source -> global bucket 8; 8 -> 1.0 -> 24
        # HI: 16 -> .5 -> 8; 24 -> 1.0 -> 24
        assert by == {("LO", 0): 8, ("LO", 8): 24,
                      ("HI", 16): 8, ("HI", 24): 24}

    def test_single_source_identity_on_bucket_cdf(self, spark):
        # one source: within-source CDF == global CDF, so each bucket maps
        # to itself (the smallest global bucket reaching its own CDF)
        rows = [(i, "A", (i % 4) * 8) for i in range(12)]
        out = calibrate_to_global(_df(spark, rows), "bucket", "source").collect()
        assert all(r["calibrated_bucket"] == r["bucket"] for r in out)

    def test_null_source_is_a_real_group(self, spark):
        rows = [(1, None, 0), (2, None, 8), (3, "A", 0)]
        pct = per_source_percentile(_df(spark, rows), "bucket", "source")
        got = {r["doc_id"]: r["pct_ppm"] for r in pct.collect()}
        assert got == {1: 500000, 2: 1000000, 3: 1000000}  # no row dropped
        cal = calibrate_to_global(_df(spark, rows), "bucket", "source")
        assert cal.count() == 3

    def test_row_count_and_passthrough(self, spark):
        rows = [(1, "A", 0), (2, "B", 8)]
        out = calibrate_to_global(_df(spark, rows), "bucket", "source")
        assert out.count() == 2
        assert set(out.columns) == {"doc_id", "source", "bucket", "calibrated_bucket"}
