"""Streaming maintenance of mergeable sketch tables.

The batch side (operators/sketches.py) materializes per-partition HLL
rows so distinct-count questions never rescan raw data; this module
keeps that table CURRENT from a stream without retaining the raw events
at all — the cardinality analog of the update-mode interval rollup
(streaming/interval.py::streaming_interval_rollup_update, same MERGE
discipline): each micro-batch sketches only its own rows, reads back
only the key partitions it touched, hll-unions, and rewrites just those
partitions.

Why not a streaming ``hll_sketch_agg`` in update mode?  It works, but
every emitted row re-serializes the FULL accumulated sketch for each
touched key per batch, and the sink still has to upsert; sketching
inside ``foreachBatch`` makes the micro-batch cost explicit — bounded by
the batch's rows plus the touched partitions' sketch rows — and leaves a
plain parquet/Iceberg table any engine can merge further (the
DataSketches wire format is public and cross-engine).

Per-batch sink cost: |touched keys| sketch rows (a few KB each), never
|all keys| and never raw history.  Exactness: HLL union is
order-insensitive over value sets, so the maintained table's ESTIMATES
equal a batch rebuild's exactly (sketch BYTES may differ across merge
orders — sparse/dense promotions — which is why equality is asserted on
estimates, the public contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sketch_distinct(
    stream: DataFrame,
    key_cols: list[str],
    value_col: str,
    partials_path: str,
    checkpoint_dir: str,
    lgk: int = 12,
    query_name: str = "stream_sketch_distinct",
    stats: list | None = None,
):
    """Maintain a ``(key..., hll_sketch)`` parquet table from a stream.

    The first key column is the partition column (choose the natural
    time-ish key — day, hour — so a batch touches few partitions).
    ``stats`` collects per-batch dicts (touched partitions, rows written)
    so tests can assert boundedness.  Trigger/output are the caller's
    writeStream concerns; this returns the started query (availableNow).
    """
    from ..operators.sketches import sketch_distinct
    from .mergesink import streaming_merge_partials

    return streaming_merge_partials(
        stream,
        part_col=key_cols[0],
        partial_fn=lambda b: sketch_distinct(b, key_cols, value_col, lgk),
        merge_fn=lambda pool: pool.groupBy(*key_cols).agg(
            F.hll_union_agg("hll_sketch").alias("hll_sketch")
        ),
        partials_path=partials_path,
        checkpoint_dir=checkpoint_dir,
        query_name=query_name,
        stats=stats,
    )


def read_sketch_estimates(
    spark, partials_path: str, key_cols: list[str]
) -> DataFrame:
    """Estimates from the maintained sketch table: per-key counts plus —
    because the rows MERGE — any coarser grouping via ``merge_sketches``
    on the same frame.  Returns ``(key..., distinct_est BIGINT)``."""
    from ..operators.sketches import estimate

    return spark.read.parquet(partials_path).select(
        *key_cols, estimate("hll_sketch").alias("distinct_est")
    )
