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

from pyspark.sql import Column, DataFrame
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


def schedule_fetches(
    frontier: DataFrame,
    crawl_delays: DataFrame | None = None,
    start_ts: str = "2026-06-01 00:00:00",
    default_delay_s: int = 1,
    url_col: str = "url",
    priority_col: str = "priority",
    id_col: str = "url_id",
) -> DataFrame:
    """Politeness scheduling: assign every frontier url a per-host fetch
    slot and wall-clock time.

    A polite crawler issues at most one request per host per
    ``crawl_delay_s`` (the robots.txt Crawl-delay, RFC 9309 extension
    field), so within a host urls are totally ordered — highest
    ``priority`` first, ``id_col`` as the deterministic tie-break — and
    url k fetches at ``start_ts + k * delay``.  ``crawl_delays`` is an
    optional (host, crawl_delay_s) dim joined broadcast (one row per host
    — small by construction); absent hosts use ``default_delay_s``.

    Scale shape: the per-host rank is a Window PARTITIONED BY host — the
    per-host sort is inherent (politeness serializes each host by
    definition) and self-limiting: a host with M frontier urls takes
    M x delay seconds of schedule, so M is operationally bounded long
    before it is a task-memory problem (1M urls at 1s/url is 11 days of
    crawling).  The cross-host layout is hash-balanced on host.
    """
    from pyspark.sql.window import Window

    from .webgraph import host_of

    f = frontier.withColumn("host", host_of(F.col(url_col)))
    # millisecond schedule math: Crawl-delay may be fractional ('0.5' is
    # common) — a seconds-granular cast('long') would truncate it to 0
    # and collapse the politeness spacing entirely
    if crawl_delays is not None:
        f = f.join(F.broadcast(crawl_delays), ["host"], "left")
        delay_ms = (
            F.coalesce(
                F.col("crawl_delay_s").cast("double"),
                F.lit(float(default_delay_s)),
            )
            * 1000
        ).cast("long")
    else:
        delay_ms = F.lit(int(default_delay_s * 1000)).cast("long")
    w = Window.partitionBy("host").orderBy(
        F.col(priority_col).desc(), F.col(id_col).asc()
    )
    slot = (F.row_number().over(w) - 1).cast("int")
    return f.select(
        id_col,
        url_col,
        "host",
        slot.alias("slot"),
        F.timestamp_add(
            "MILLISECOND",
            slot.cast("long") * delay_ms,
            F.lit(start_ts).cast("timestamp"),
        ).alias("scheduled_at"),
    )


def allocate_crawl_budget(
    hosts: DataFrame,
    total_budget: int,
    weight_col: str = "weight",
    host_col: str = "host",
) -> DataFrame:
    """Exact largest-remainder (Hamilton) apportionment of an integer
    fetch budget across hosts: adds ``allocation`` with
    SUM(allocation) == total_budget exactly.

    Each host's ideal share is ``total_budget * w / W`` (W = sum of
    weights, callers pass non-negative weights summing > 0 — e.g.
    ``host_change_rates``' change_ppm x url count).  Every host gets the
    floor; the leftover L = budget - sum(floors) goes one each to the L
    largest remainders, host ascending on ties.

    Scale shape: no global window (the plan-hygiene killer).  The L-th
    remainder boundary is found with the same distributed
    TakeOrderedAndProject-threshold-broadcast pattern as
    ``operators/limits.py``: top-L by (remainder desc, host asc) →
    aggregate the boundary pair → broadcast-join the two scalars back.
    Products route through decimal(38,0) so budget x weight never
    overflows LONG.
    """
    if total_budget < 0:
        raise ValueError("total_budget must be >= 0")
    dec = "decimal(38,0)"
    w = F.coalesce(F.col(weight_col).cast(dec), F.lit(0).cast(dec))

    # two O(1)-result scalar collects (total weight, then leftover); the
    # input is scanned per action — persist upstream if it isn't a cheap
    # aggregate already (the intended input is a per-host rollup)
    w_total = hosts.agg(F.sum(w)).collect()[0][0]
    if w_total is None or w_total <= 0:
        raise ValueError("weights must be non-negative and sum > 0")
    w_lit = F.lit(str(w_total)).cast(dec)

    prod = F.lit(total_budget).cast(dec) * w
    h = hosts.select(
        "*",
        ((prod - prod % w_lit) / w_lit).cast("long").alias("_base"),
        (prod % w_lit).alias("_rem"),
    )

    leftover = (
        h.agg((F.lit(total_budget) - F.sum("_base")).cast("int"))
        .collect()[0][0]
    )

    if leftover > 0:
        boundary = (
            h.orderBy(F.col("_rem").desc(), F.col(host_col).asc())
            .limit(leftover)
            .agg(
                F.min("_rem").alias("_rem_cut"),
                F.max_by(F.col(host_col), F.struct(
                    (-F.col("_rem")).alias("r"), F.col(host_col).alias("h")
                )).alias("_host_cut"),
            )
        )
        h = h.join(F.broadcast(boundary))
        bonus = (
            (F.col("_rem") > F.col("_rem_cut"))
            | (
                (F.col("_rem") == F.col("_rem_cut"))
                & (F.col(host_col) <= F.col("_host_cut"))
            )
        ).cast("long")
        h = h.withColumn("allocation", F.col("_base") + bonus).drop(
            "_rem_cut", "_host_cut"
        )
    else:
        h = h.withColumn("allocation", F.col("_base"))
    return h.drop("_base", "_rem")


def _cc_directive(cache_control: Column, name: str) -> Column:
    # directive names are case-insensitive tokens in a comma-separated
    # list; a substring test would confuse no-cache with no-cache=...
    # variants we don't need to distinguish, so token-boundary regex
    return cache_control.rlike(f"(?i)(^|[,\\s]){name}($|[,\\s=])")


def refetch_decision(
    fetches: DataFrame,
    now_ts: str,
    fetched_col: str = "fetched_at",
    cache_control_col: str = "cache_control",
    etag_col: str = "etag",
    last_modified_col: str = "last_modified",
) -> DataFrame:
    """HTTP freshness decision per fetched page (RFC 9111 subset): adds
    (age_s, max_age, decision) where decision is

    - ``'fresh'``      — a max-age is present, the stored copy's age is
      within it, and neither no-store nor no-cache applies: skip the fetch;
    - ``'revalidate'`` — stale (or no-cache) but a validator (ETag /
      Last-Modified) exists: issue a conditional request, a 304 costs
      headers only;
    - ``'refetch'``    — no-store, or stale with no validator: full fetch.

    Pure column expressions (one regexp for max-age, token-boundary tests
    for the directives) — the decision column is a scan-fused filter for
    the recrawl planner, never a shuffle."""
    cc = F.col(cache_control_col)
    max_age = F.nullif(
        F.regexp_extract(cc, r"(?i)(?:^|[,\s])max-age\s*=\s*(\d+)", 1),
        F.lit(""),
    ).cast("long")
    no_store = F.coalesce(_cc_directive(cc, "no-store"), F.lit(False))
    no_cache = F.coalesce(_cc_directive(cc, "no-cache"), F.lit(False))
    age_s = (
        F.unix_timestamp(F.lit(now_ts).cast("timestamp"))
        - F.unix_timestamp(F.col(fetched_col))
    ).cast("long")
    has_validator = (
        F.col(etag_col).isNotNull() | F.col(last_modified_col).isNotNull()
    )
    fresh = ~no_store & ~no_cache & max_age.isNotNull() & (age_s <= max_age)
    decision = (
        F.when(no_store, F.lit("refetch"))
        .when(fresh, F.lit("fresh"))
        .when(has_validator, F.lit("revalidate"))
        .otherwise(F.lit("refetch"))
    )
    return fetches.select(
        "*",
        age_s.alias("age_s"),
        max_age.alias("max_age"),
        decision.alias("decision"),
    )
