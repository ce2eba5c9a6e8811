"""Streaming Misra-Gries heavy-hitter summaries with cross-batch state.

The deterministic frequent-items sketch (Misra & Gries 1982, the
"mergeable summaries" form of Agarwal et al. 2012) maintained per key-space
shard across micro-batches: each shard's state is at most ``k`` (item,
count) counters, each micro-batch folds in as ONE exact per-batch count
merge followed by the subtract-(k+1)-th-largest compaction.  The classic
guarantee holds per shard: after N items, every item with true frequency
> N/(k+1) is present, and each kept count lower-bounds the true count by
at most N/(k+1).

Batch twin: ``operators/partition.py::frequent_items_verified`` answers
the same question over data at rest with a verify pass; this module is
the bounded-state monitor shape (top talkers per collector, hot-domain
watch) where the stream never lands and an ε-approximate-with-certificate
answer is the contract.

Scale shape: shards partition the ITEM space (one item maps to exactly
one shard), so per-shard summaries are disjoint and globally correct —
reading the union of all shards yields every global heavy hitter.  State
per shard is O(k); a hot single item concentrates on one shard task, the
same property as every keyed-state stream engine, mitigated by raising
``n_shards`` (items re-spread, counters stay exact per item).

Determinism: the per-batch fold is order-free (exact value_counts before
the merge; compaction subtracts an order statistic, no tie-break needed
since only strictly-positive counters survive), so stream output depends
only on the batch partition of the input — and a single-batch
``availableNow`` drain equals the closed-form SQL restatement the gate
checks (exact counts minus the (k+1)-th largest, positives kept).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n_seen", LongType()),
    ]
)


def mg_merge(
    counters: dict[str, int], add: dict[str, int], k: int
) -> dict[str, int]:
    """Merge exact counts ``add`` into an MG summary of capacity ``k``:
    pointwise add, then if more than k counters survive subtract the
    (k+1)-th largest count from all and keep the strictly positive —
    the mergeable-summaries compaction preserving the N/(k+1) bound."""
    merged = dict(counters)
    for item, c in add.items():
        merged[item] = merged.get(item, 0) + int(c)
    if len(merged) <= k:
        return merged
    cut = sorted(merged.values(), reverse=True)[k]
    return {i: c - cut for i, c in merged.items() if c > cut}


def streaming_misra_gries(
    stream: DataFrame,
    item_col: str,
    k: int = 16,
    n_shards: int = 8,
    shard_col: str | None = None,
) -> DataFrame:
    """Maintain per-shard MG summaries over a stream of items.

    Output (update mode), one row per surviving counter per batch:
    ``(shard LONG, item STRING, count_lower BIGINT, n_seen BIGINT)`` —
    ``count_lower`` is the MG lower bound, ``n_seen`` the shard's total
    item count (so callers can bound the undercount by n_seen/(k+1)).

    ``shard_col`` overrides the default ``pmod(xxhash64(item), n_shards)``
    sharding with a caller-provided column — any mapping works as long as
    each item value lands on exactly one shard (gates use a modular form
    both engines can restate)."""
    if k < 1 or n_shards < 1:
        raise ValueError("k and n_shards must be >= 1")
    out_schema = StructType(
        [
            StructField("shard", LongType()),
            StructField("item", StringType()),
            StructField("count_lower", LongType()),
            StructField("n_seen", LongType()),
        ]
    )

    def fold(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n_seen = state.get
            counters = dict(zip(list(items), [int(c) for c in counts]))
        else:
            counters, n_seen = {}, 0
        add: dict[str, int] = {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            vc = pdf["item"].value_counts()
            for item, c in vc.items():
                add[item] = add.get(item, 0) + int(c)
            n_seen += int(len(pdf))
        counters = mg_merge(counters, add, k)
        state.update((list(counters), [counters[i] for i in counters], n_seen))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(counters),
                "item": list(counters),
                "count_lower": list(counters.values()),
                "n_seen": [n_seen] * len(counters),
            }
        )

    shard = (
        F.col(shard_col).cast("long")
        if shard_col is not None
        else F.pmod(F.xxhash64(F.col(item_col).cast("string")), F.lit(n_shards))
    )
    return (
        stream.select(
            shard.alias("shard"),
            F.col(item_col).cast("string").alias("item"),
        )
        # NULL items carry no identity to count: excluded from counters AND
        # from n_seen (pandas value_counts would drop them from counters but
        # not the total, silently loosening the documented n_seen/(k+1)
        # bound and diverging from any SQL restatement)
        .where(F.col("item").isNotNull())
        .groupBy("shard")
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def misra_gries_oracle_sql(
    items_sql: str,
    item_expr: str,
    shard_expr: str,
    k: int,
) -> str:
    """Closed-form SQL for the SINGLE-merge case (one batch = exact
    counts compacted once): per shard, exact counts minus the (k+1)-th
    largest count, strictly-positive survivors.  This is what one
    ``availableNow`` drain of ``streaming_misra_gries`` must equal."""
    return f"""
    WITH src AS (
        SELECT {shard_expr} AS shard, {item_expr} AS item
        FROM ({items_sql}) t
        WHERE {item_expr} IS NOT NULL
    ), counts AS (
        SELECT shard, item, COUNT(*) AS c,
               SUM(COUNT(*)) OVER (PARTITION BY shard) AS n_seen
        FROM src GROUP BY shard, item
    ), ranked AS (
        SELECT shard, c,
               ROW_NUMBER() OVER (PARTITION BY shard ORDER BY c DESC) AS rn
        FROM counts
    ), cuts AS (
        SELECT shard, MAX(CASE WHEN rn = {k} + 1 THEN c ELSE 0 END) AS cut
        FROM ranked GROUP BY shard
    )
    SELECT co.shard, co.item,
           CAST(co.c - cu.cut AS BIGINT) AS count_lower,
           CAST(co.n_seen AS BIGINT) AS n_seen
    FROM counts co JOIN cuts cu ON co.shard = cu.shard
    WHERE co.c - cu.cut > 0
    """
