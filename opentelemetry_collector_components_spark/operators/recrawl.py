"""Crawl snapshot diffing: what changed between two crawls, and how fast
does each host churn?

The corpus-maintenance loop over a Common-Crawl-style table
(BASELINE.json input_hint) re-fetches pages on a schedule; the scheduler's
input is the delta between the last two snapshots — which urls appeared,
vanished, or changed content — rolled up to a per-host change rate that
decides the host's next crawl interval.  This is the batch analog of the
reference's entityanalytics full-vs-incremental sync diff
(``sources/dims.py::entity_incremental_sync`` here): same
compare-two-states shape, applied to page fingerprints instead of entity
records.

Scale shape: ``crawl_delta`` is ONE full-outer equi-join on the url —
inherent (the question is set difference) and hash-balanced (urls are
high-cardinality, no skew regardless of host skew).  ``host_change_rates``
is one partial-aggregated groupBy on the host extracted from the url.
Both stay in whole-stage codegen; fingerprints travel as opaque columns
(callers typically pass ``operators/dedup.py``'s content fingerprint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELTA_STATUSES = ["added", "removed", "changed", "unchanged"]


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    fingerprint_col: str = "fp",
) -> DataFrame:
    """(url, status, old_fp, new_fp) for every url in either snapshot.

    ``status``: 'added' (new only), 'removed' (old only), 'changed' (both,
    fingerprints differ — NULL fingerprints compare null-safely, so
    NULL -> NULL is unchanged), 'unchanged'.
    """
    # presence is judged by side-marker literals, not fingerprint NULLness:
    # a present row may legitimately carry a NULL fingerprint, and the
    # full_outer join's coalesced key leaves no other side marker
    o = old.select(
        F.col(key_col).alias(key_col),
        F.col(fingerprint_col).alias("old_fp"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key_col).alias(key_col),
        F.col(fingerprint_col).alias("new_fp"),
        F.lit(True).alias("_in_new"),
    )
    both = o.join(n, [key_col], "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return both.select(
        key_col, status.alias("status"), "old_fp", "new_fp"
    )


def host_change_rates(
    delta: DataFrame,
    key_col: str = "url",
) -> DataFrame:
    """Per-host churn: (host, n_added, n_removed, n_changed, n_unchanged,
    n_urls, change_ppm) — change_ppm = FLOOR(1e6 * (added+removed+changed)
    / total), the integer rate a recrawl scheduler thresholds on."""
    from .webgraph import host_of

    def n_of(s: str):
        return (
            F.sum((F.col("status") == s).cast("long")).alias(f"n_{s}")
        )

    agg = delta.groupBy(host_of(F.col(key_col)).alias("host")).agg(
        *[n_of(s) for s in DELTA_STATUSES],
        F.count(F.lit(1)).cast("long").alias("n_urls"),
    )
    # exact BIGINT division (counts are non-negative, so DIV == floor);
    # double '/'+floor could land one off the oracle at exact multiples
    return agg.withColumn(
        "change_ppm",
        F.expr("(n_added + n_removed + n_changed) * 1000000 DIV n_urls"),
    )
