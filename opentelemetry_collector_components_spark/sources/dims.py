"""Enrichment dimension tables (broadcast-join side).

The reference enriches from config + client metadata (SURVEY.md E7;
extension/apikeyauthextension/authenticator.go:97-160).  Our build's analog
is a small ``domain_dim`` lookup table — the canonical "broadcast hash join
a dimension onto the fact scan" pattern.

5 cold domains (d42..d46) are intentionally absent so the default /
``coalesce`` semantics are exercised (analog of the reference's
``agent.name`` default "unknown", connector/elasticapmconnector/
config.go:254-259, and ``event.outcome`` default,
receiver/elasticapmintakereceiver/internal/mappers/intakeV2ToDerivedFields.go:108-121).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pages import N_COLD, N_HOT

MISSING_COLD_DOMAINS = 5  # d42..d46 absent from the dim

GEOS = ["us", "eu", "apac"]
CATEGORIES = ["news", "shop", "blog", "docs"]


def generate_domain_dim(spark: SparkSession) -> DataFrame:
    """50-row dimension: domain -> (geo, category, expected_lang).

    Deterministic pure function of the domain index; tiny by construction so
    Catalyst broadcasts it (and we hint ``F.broadcast`` at the join site
    anyway — at 100 TB the fact side must never shuffle for this join).
    """
    hot = spark.range(N_HOT).select(
        F.concat(F.lit("hot"), F.col("id"), F.lit(".example.com")).alias("domain"),
        F.col("id").alias("_idx"),
    )
    cold = spark.range(N_COLD - MISSING_COLD_DOMAINS).select(
        F.concat(F.lit("d"), F.col("id"), F.lit(".example.org")).alias("domain"),
        (F.col("id") + N_HOT).alias("_idx"),
    )
    dim = hot.unionByName(cold)
    geo = F.element_at(F.array(*[F.lit(g) for g in GEOS]), (F.pmod(F.col("_idx"), F.lit(len(GEOS))) + 1).cast("int"))
    cat = F.element_at(
        F.array(*[F.lit(c) for c in CATEGORIES]), (F.pmod(F.col("_idx"), F.lit(len(CATEGORIES))) + 1).cast("int")
    )
    expected_lang = F.when(F.pmod(F.col("_idx"), F.lit(5)) == 0, F.lit("de")).otherwise(F.lit("en"))
    return dim.select(
        "domain",
        geo.alias("geo"),
        cat.alias("category"),
        expected_lang.alias("expected_lang"),
    )
