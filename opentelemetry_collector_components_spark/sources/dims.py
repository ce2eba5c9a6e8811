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


def dim_sync_changes(
    prev: DataFrame,
    curr: DataFrame,
    key_col: str,
    compare_cols: list[str],
    full: bool = False,
) -> DataFrame:
    """Entity-analytics sync (receiver/entityanalyticsreceiver/receiver.go:
    111-150): a FULL sync publishes every current entity; an INCREMENTAL
    sync publishes only the delta vs the previous snapshot — added /
    modified / deleted — with unchanged entities omitted (the EntraID
    provider's ActionModified semantics, integration_entraid_test.go:103).

    Relational form: full outer join on the entity key; one shuffle, and
    at scale both sides bucket by the key for a shuffle-free join.
    Output: key + current compare columns (previous values for deletes) +
    ``action`` in {full, added, modified, deleted}.
    """
    if full:
        return curr.select(key_col, *compare_cols, F.lit("full").alias("action"))
    p = prev.select(key_col, *compare_cols).withColumn("_p", F.lit(True)).alias("p")
    c = curr.select(key_col, *compare_cols).withColumn("_c", F.lit(True)).alias("c")
    j = p.join(c, on=key_col, how="full_outer")
    p_present = F.col("_p").isNotNull()
    c_present = F.col("_c").isNotNull()
    changed = None
    for col in compare_cols:
        ne = ~F.col(f"p.{col}").eqNullSafe(F.col(f"c.{col}"))
        changed = ne if changed is None else (changed | ne)
    action = (
        F.when(~p_present & c_present, F.lit("added"))
        .when(p_present & ~c_present, F.lit("deleted"))
        .when(changed, F.lit("modified"))
        .otherwise(F.lit(None).cast("string"))
    )
    # current-side values verbatim when current exists (a modified entity
    # whose attribute went NULL must publish the null-out, not resurrect
    # the previous value); previous values only for deletes
    out_cols = [
        F.when(c_present, F.col(f"c.{col}"))
        .otherwise(F.col(f"p.{col}"))
        .alias(col)
        for col in compare_cols
    ]
    return (
        j.select(key_col, *out_cols, action.alias("action"))
        .filter(F.col("action").isNotNull())
    )


def generate_change_log(spark: SparkSession, n_rows: int) -> DataFrame:
    """Entity change-log fixture (operators/asof.py::scd2_from_changes
    gate): 50 entities x hourly full-state snapshots whose attributes
    change on a closed-form schedule (plan every 7 snapshots, region
    every 13), so most consecutive rows are unchanged and the SCD2
    compaction is actually exercised."""
    df = spark.range(n_rows)
    id_ = F.col("id")
    seq = F.expr("id DIV 50")
    return df.select(
        F.concat(F.lit("u"), F.pmod(id_, F.lit(50))).alias("entity_id"),
        F.timestamp_seconds(F.lit(1767225600) + seq * F.lit(3600)).alias("ts"),
        F.concat(F.lit("p"), F.expr("(id DIV 50) DIV 7")).alias("plan"),
        F.concat(F.lit("r"), F.pmod(F.expr("(id DIV 50) DIV 13"), F.lit(4))).alias("region"),
    )
