"""E9/M6: salted repartition + two-phase skew-proof aggregation."""

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.parse import parse_pages
from opentelemetry_collector_components_spark.operators.partition import (
    salted_repartition,
    two_phase_agg,
)
from opentelemetry_collector_components_spark.sources.pages import generate_pages


def test_two_phase_equals_direct(spark):
    parsed = parse_pages(generate_pages(spark, 20000))
    direct = {
        (r["domain"],): (r["docs"], r["dur"])
        for r in parsed.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("dur_us").alias("dur"))
        .collect()
    }
    two = {
        (r["domain"],): (r["docs"], r["dur"])
        for r in two_phase_agg(
            parsed,
            keys=["domain"],
            partial_aggs={"docs": F.count(F.lit(1)), "dur": F.sum("dur_us")},
            final_aggs={"docs": F.sum("docs"), "dur": F.sum("dur")},
            salt_key="url",
            n_salts=8,
        ).collect()
    }
    assert two == direct


def test_salted_repartition_preserves_rows_and_spreads(spark):
    pages = generate_pages(spark, 20000)
    out = salted_repartition(pages, "url", n_salts=16, n_partitions=16)
    assert out.count() == 20000
    assert "_salt" not in out.columns
    # hot domain rows spread over many partitions (not 1)
    hot = out.filter(F.col("url").like("https://hot0%")).select(
        F.spark_partition_id().alias("p")
    )
    nparts = hot.distinct().count()
    assert nparts >= 8
