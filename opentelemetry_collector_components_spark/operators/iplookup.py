"""GeoIP-style CIDR longest-prefix-match enrichment.

The classic log-pipeline lookup the reference delegates to Elasticsearch
ingest-geoip (and beats' `add_host_metadata` / geoip processors): attach
country/ASN attributes to an IPv4 column from a table of CIDR blocks,
where overlapping blocks resolve MOST-SPECIFIC-WINS (longest prefix).

Spark-first shape, in two dim-side passes and zero fact-side shuffles:

1. ``cidr_bounds`` turns each (network, prefix_len) into the half-open
   integer interval ``[lo, hi)`` it covers (alignment forced, so a
   sloppy ``10.1.2.3/16`` means ``10.1.0.0/16``).
2. ``flatten_prefixes`` resolves the overlap policy AHEAD of the fact
   scan: boundary points -> atomic segments (positions via
   ``partition.global_positions`` — no unpartitioned window), each
   segment claimed by its covering block with the LONGEST prefix.  The
   output is a DISJOINT interval table carrying winner attributes.
3. ``ip_enrich`` is then a plain ``ranges.range_lookup_bucketed``
   equi-join (or broadcast) — at most ONE match per fact by
   construction, so there is no per-event argmax, no window, and no
   aggregation on the 100 TB side.  This is the whole point of
   flattening on the dim side: longest-prefix is O(|dims| log |dims|)
   once, not O(|facts| x avg_overlap) forever.

``ipv4_to_long`` validates with the grok library's strict IPV4 pattern
(octet bounds enforced); malformed strings parse to NULL and enrich to
NULL attributes — never a wrong match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.grok import GROK_PATTERNS
from .partition import global_positions
from .ranges import range_lookup_bucketed

_IPV4_ANCHORED = "^" + GROK_PATTERNS["IPV4"] + "$"


def ipv4_to_long(col: Column) -> Column:
    """Dotted-quad string -> uint32 as BIGINT; malformed -> NULL.

    Validation is the grok IPV4 pattern (anchored), so ``256.1.1.1``,
    ``1.2.3``, and ``1.2.3.4.5`` all yield NULL rather than garbage
    arithmetic.  Pure JVM expression (rlike + split), scan-fused.
    """
    ok = F.when(col.rlike(_IPV4_ANCHORED), col)
    p = F.split(ok, r"\.")
    return (
        p[0].cast("long") * 16777216
        + p[1].cast("long") * 65536
        + p[2].cast("long") * 256
        + p[3].cast("long")
    )


def cidr_bounds(net: Column, prefix_len: Column) -> tuple[Column, Column]:
    """(network long, prefix_len) -> aligned half-open ``[lo, hi)``.

    ``hi - lo = 2^(32-prefix_len)``; the network address is floored to
    the block boundary so unaligned inputs mean the block they sit in.
    """
    # 2^k via pow (shiftleft needs a literal bit count); exact in double
    # for k <= 32, cast back to long
    size = F.pow(F.lit(2.0), F.lit(32) - prefix_len).cast("long")
    lo = F.floor(net.cast("long") / size).cast("long") * size
    return lo, lo + size


def flatten_prefixes(
    dims: DataFrame,
    attrs: list[str],
    net_col: str = "net",
    prefix_col: str = "prefix_len",
) -> DataFrame:
    """Overlapping CIDR blocks -> DISJOINT ``[lo, hi)`` intervals, each
    carrying the attributes of its most-specific (longest-prefix) cover.

    Dim-side only: boundary points of all blocks split the address space
    into atomic segments (a segment never straddles a block edge, so
    "block covers segment" reduces to "segment lo inside block" — an
    interval-lookup reusable via ``range_lookup_bucketed``); the winner
    per segment is ``max(struct(prefix_len, ...))``.  Equal-length
    duplicate blocks are impossible by CIDR arithmetic (same prefix +
    overlap => same block), so the winner is unique; duplicate dim ROWS
    for the same block are collapsed deterministically by the attr
    tiebreak in the struct ordering.  Uncovered gaps are dropped —
    lookups there yield NULLs.  Adjacent same-winner segments are not
    re-coalesced (harmless: lookup semantics identical).
    """
    lo, hi = cidr_bounds(F.col(net_col), F.col(prefix_col))
    blocks = dims.select(
        lo.alias("_blo"), hi.alias("_bhi"), F.col(prefix_col).alias("_plen"), *attrs
    )
    pts = (
        blocks.select(F.col("_blo").alias("pt"))
        .union(blocks.select(F.col("_bhi").alias("pt")))
        .distinct()
    )
    pos = global_positions(pts, ["pt"], pos_col="_pos")
    nxt = pos.select(
        (F.col("_pos") - 1).alias("_pos"), F.col("pt").alias("_seg_hi")
    )
    segs = pos.join(nxt, "_pos").select(
        F.col("pt").alias("lo"), F.col("_seg_hi").alias("hi")
    )
    covered = range_lookup_bucketed(
        segs,
        blocks,
        value_col="lo",
        bucket_size=1 << 24,
        lo_col="_blo",
        hi_col="_bhi",
        attrs=["_plen", *attrs],
    ).where(F.col("_plen").isNotNull())
    best = covered.groupBy("lo", "hi").agg(
        F.max(F.struct("_plen", *attrs)).alias("_w")
    )
    return best.select(
        "lo",
        "hi",
        F.col("_w._plen").alias(prefix_col),
        *[F.col(f"_w.{a}").alias(a) for a in attrs],
    )


def ip_enrich(
    df: DataFrame,
    ip_col: str,
    flat: DataFrame,
    attrs: list[str],
    bucket_size: int = 1 << 16,
    broadcast: bool = True,
) -> DataFrame:
    """Attach ``attrs`` (+ the winning ``prefix_len``) from a FLATTENED
    interval table to every fact row; left semantics (no match / invalid
    ip -> NULLs).  One bucketed equi-join, at most one match per row by
    the disjointness invariant.

    ``broadcast=True`` (default) marks the flattened dim for broadcast —
    a GeoIP table is a few MB even fully segmented, and without the hint
    the equi-join sort-merges, shuffling the 100 TB FACT side on the
    bucket key.  Set False only for interval tables too big for executor
    memory (then the bucketed shuffle join is the right plan).
    """
    parsed = df.withColumn("_ip_long", ipv4_to_long(F.col(ip_col)))
    return range_lookup_bucketed(
        parsed,
        F.broadcast(flat) if broadcast else flat,
        value_col="_ip_long",
        bucket_size=bucket_size,
        lo_col="lo",
        hi_col="hi",
        attrs=["prefix_len", *attrs],
    ).drop("_ip_long")
