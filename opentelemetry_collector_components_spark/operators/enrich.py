"""Enrich stage: broadcast hash-join lookup attributes + defaults.

Analog of the reference's metadata/enrichment processors:
- attribute derivation cascades, processor/elasticapmprocessor/internal/
  enrichments/span.go:321-546 -> ``F.when`` cascades;
- default values ("unknown" outcome / agent name),
  connector/elasticapmconnector/config.go:254-259 -> ``coalesce``;
- metadata attach, processor/elasticmetadataprocessor/processor.go:54-90
  -> literal/broadcast columns.

The lookup table is always broadcast explicitly: at 100 TB the fact side is
~10^12 rows and must never shuffle for a 50-row dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(
    parsed: DataFrame,
    domain_dim: DataFrame,
    key: str = "domain",
) -> DataFrame:
    """Left broadcast join + coalesce defaults.

    Unknown domains get geo='unknown', category='unknown' — the
    ``event.outcome`` default-"unknown" semantic
    (intakeV2ToDerivedFields.go:108-121).
    Adds ``lang_mismatch``: page lang differs from the dimension's expected
    majority lang (an enrichment-derived quality flag).
    """
    joined = parsed.join(F.broadcast(domain_dim), on=key, how="left")
    return (
        joined.withColumn("geo", F.coalesce(F.col("geo"), F.lit("unknown")))
        .withColumn("category", F.coalesce(F.col("category"), F.lit("unknown")))
        .withColumn(
            "lang_mismatch",
            F.when(F.col("expected_lang").isNull(), F.lit(False)).otherwise(
                F.col("lang") != F.col("expected_lang")
            ),
        )
        .drop("expected_lang")
    )


def derive_event_fields(parsed: DataFrame) -> DataFrame:
    """Per-record derived fields — the elasticapmprocessor ``F.when`` cascade
    analog (span.go:382-446 event.outcome from status/http code).

    - event_outcome: success (2xx/3xx), failure (4xx/5xx/ERROR), unknown
    - success_count / failure_count: the event.success_count representation
      (config.go:471-545: success -> bucket{1}, failure -> bucket{0})
    - duration_ms from dur_us (timestamp.us analog, span.go:321-380)
    """
    outcome = (
        F.when(F.col("code").isNull(), F.lit("unknown"))
        .when(F.col("code") < 400, F.lit("success"))
        .otherwise(F.lit("failure"))
    )
    return (
        parsed.withColumn("event_outcome", outcome)
        .withColumn("success_count", F.when(F.col("event_outcome") == "success", 1).otherwise(0).cast("long"))
        .withColumn("failure_count", F.when(F.col("event_outcome") == "failure", 1).otherwise(0).cast("long"))
        .withColumn("duration_ms", (F.col("dur_us") / F.lit(1000.0)))
    )
