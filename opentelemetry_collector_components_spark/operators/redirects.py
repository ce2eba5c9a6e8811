"""HTTP redirect chain resolution over a fetch log.

A crawl's fetch log carries (url, status, location); canonical corpus
maintenance needs every url mapped to its FINAL destination — dedup
keys, link-graph edges, and recrawl scheduling all want the
post-redirect url, and Common Crawl itself materializes exactly this
mapping.  Following the chain is iterative by nature: url -> location ->
location ... until a non-redirect lands ('ok'), the chain leaves the log
('dangling'), or a hop bound trips ('too_many' — which is also how
cycles surface, since a cycle can never terminate otherwise).

Algorithm: the same level-synchronous iteration as
``operators/tracetree.py`` — the unresolved state set joins the
(url -> next) lookup once per hop, resolved rows retire into an
accumulator, max_hops bounds the rounds.  Relative ``Location:`` values
resolve against the redirecting url with the webgraph href resolver (RFC
3986 — one resolver, one home).  Each round is one hash-balanced
equi-join on the current url; rounds are bounded by max_hops (default 8,
over the practical browser limit), not corpus size, and each round's
state shrinks by the rows that terminated.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    fetch_log: DataFrame,
    url_col: str = "url",
    status_col: str = "status",
    location_col: str = "location",
    max_hops: int = 8,
) -> DataFrame:
    """(url, final_url, hops INT, outcome) for every fetch-log url.

    ``outcome``: 'ok' (chain ended on a non-redirect row — including a
    redirect whose Location is absent or unresolvable, which cannot be
    followed, and rows with NULL status, i.e. failed fetches),
    'dangling' (chain left the log), 'too_many' (still
    redirecting after ``max_hops`` hops; cycles land here).  ``hops``
    counts redirects actually followed; ``final_url`` is where the walk
    stopped.  Urls are assumed unique in the log (one fetch per url —
    dedupe upstream if re-fetches exist).
    """
    from ..caching import local_checkpoint_tracked, maybe_persist, track_handle
    from .graph import _FinalRelease
    from .webgraph import resolve_href

    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    status = F.col(status_col)
    nxt = resolve_href(F.col(url_col), F.col(location_col))
    lookup = maybe_persist(
        fetch_log.select(
            F.col(url_col).alias("_lu"),
            # coalesce: a NULL status (failed fetch) with a parseable
            # Location must terminate 'ok', not walk to the Location
            F.coalesce(
                status.between(300, 399) & nxt.isNotNull(), F.lit(False)
            ).alias("_is_redir"),
            nxt.alias("_next"),
        ),
        True,
    )
    state = fetch_log.select(
        F.col(url_col).alias("url"),
        F.col(url_col).alias("final_url"),
        F.lit(0).alias("hops"),
    )
    done_parts: list[DataFrame] = []
    for hop in range(max_hops + 1):
        j = state.join(lookup, state.final_url == lookup._lu, "left")
        terminal = (
            F.when(F.col("_lu").isNull(), F.lit("dangling"))
            .when(~F.col("_is_redir"), F.lit("ok"))
            .when(F.lit(hop == max_hops), F.lit("too_many"))
        )
        done_parts.append(
            j.where(terminal.isNotNull()).select(
                "url", "final_url", "hops", terminal.alias("outcome")
            )
        )
        if hop == max_hops:
            break
        state, release = local_checkpoint_tracked(
            j.where(terminal.isNull()).select(
                "url",
                F.col("_next").alias("final_url"),
                (F.col("hops") + 1).alias("hops"),
            )
        )
        track_handle(_FinalRelease(release))
        if state.isEmpty():
            break
    out = reduce(DataFrame.unionByName, done_parts)
    return out.select(
        "url", "final_url", F.col("hops").cast("int").alias("hops"), "outcome"
    )
