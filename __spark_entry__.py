"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship parse -> enrich -> route -> aggregate
pipeline over the sf0.001 events table.  ``queries()`` / ``oracle_sql()``
expose the full operator registry (opentelemetry_collector_components_spark.queries)
for the DuckDB correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events log stream -> parse(JSON) -> enrich(broadcast dims)
    -> data-stream route -> 60m interval aggregate per sink."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.queries import load

    ev = load(spark, SF0001, "events")
    cust = load(spark, SF0001, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, SF0001, "nation").select("n_nationkey", "n_name")

    parsed = ev.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )
    enriched = (
        parsed.join(F.broadcast(cust), parsed.user_id == cust.c_custkey, "left")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey, "left")
        .withColumn("nation", F.coalesce("n_name", F.lit("unknown")))
    )
    routed = enriched.withColumn(
        "sink",
        F.when(F.col("event_type") == "error", F.lit("logs.error")).otherwise(
            F.concat(F.lit("logs."), F.col("event_type"))
        ),
    )
    return routed.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "sink", "nation"
    ).agg(
        F.count(F.lit(1)).alias("docs"),
        F.round(F.sum("value"), 4).alias("value_sum"),
        F.count_distinct("user_id").alias("users"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from opentelemetry_collector_components_spark.queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from opentelemetry_collector_components_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
