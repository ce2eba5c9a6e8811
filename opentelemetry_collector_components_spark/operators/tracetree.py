"""Trace tree analysis: span depth, root-to-span paths, and the
per-trace critical path.

A distributed trace is a tree of spans (child points at parent via
``parent_span_id``); the questions every APM backend answers over it —
how deep is each span, which root-to-leaf chain carries the most time,
which spans are orphaned by a broken parent chain — need the ancestry
MATERIALIZED, not just the edge list.  The reference's span pipeline
(processor/elasticapmprocessor, re-expressed in ``operators/
apm_metrics.py`` and ``operators/servicemap.py`` here) works one hop at a
time; this module adds the whole-tree view.

Algorithm: level-synchronous BFS from the roots.  Each round joins the
span table against the previous frontier on (trace_id, parent == span),
extending depth / cumulative duration / path; rounds stop when a level
comes back empty or ``max_depth`` is hit.  Tree depth — not corpus size —
bounds the round count (real traces: < 20 levels), and every round is one
hash-balanced equi-join on (trace_id, parent), so at 10^12 spans the work
per round is a single shuffle of the remaining levels.  Each frontier is
localCheckpoint-tracked (the ``pagerank_quantized`` pattern) so lineage
does not stack across rounds.  Spans whose parent chain never reaches a
root — broken ingestion, dropped parents, or parent cycles — are flagged
``is_orphan`` with NULL depth rather than dropped or looped on (a cycle
is simply never reached, so the loop terminates regardless).

Span ids are assumed unique within a trace (the OTel contract); a
duplicated id would fan the BFS out along both copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def span_tree_paths(
    spans: DataFrame,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_span_id",
    duration_col: str = "dur_us",
    max_depth: int = 32,
) -> DataFrame:
    """(trace_id, span_id, depth INT, cum_us BIGINT, path STRING,
    is_orphan BOOLEAN) for every span.

    ``depth`` 0 at roots (NULL or '' parent); ``cum_us`` is the sum of
    durations along the root path INCLUDING the span itself; ``path`` is
    the '>'-joined span-id chain from the root.  Orphans (unreachable
    within ``max_depth``) carry NULL depth/cum/path.
    """
    from ..caching import local_checkpoint_tracked, track_handle
    from .graph import _FinalRelease

    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")
    base = spans.select(
        F.col(trace_col).alias("trace_id"),
        F.col(span_col).alias("span_id"),
        F.col(parent_col).alias("_parent"),
        F.col(duration_col).cast("long").alias("_dur"),
    )
    is_root = F.col("_parent").isNull() | (F.col("_parent") == "")
    frontier = base.where(is_root).select(
        "trace_id",
        "span_id",
        F.lit(0).alias("depth"),
        F.col("_dur").alias("cum_us"),
        F.col("span_id").alias("path"),
    )
    # every level is part of the final union, so — unlike pagerank, where
    # only the last round survives — NO level's checkpoint blocks may be
    # released inside the loop; each handle is tracked instead, and a
    # scoped_intermediates block around the caller reclaims them all
    levels = [frontier]
    for _ in range(max_depth):
        parents = frontier.select(
            "trace_id",
            F.col("span_id").alias("_pid"),
            F.col("depth").alias("_pdepth"),
            F.col("cum_us").alias("_pcum"),
            F.col("path").alias("_ppath"),
        )
        frontier, release = local_checkpoint_tracked(
            base.where(~is_root)
            .join(parents, ["trace_id"])
            .where(F.col("_parent") == F.col("_pid"))
            .select(
                "trace_id",
                "span_id",
                (F.col("_pdepth") + 1).alias("depth"),
                (F.col("_pcum") + F.col("_dur")).alias("cum_us"),
                F.concat("_ppath", F.lit(">"), "span_id").alias("path"),
            )
        )
        track_handle(_FinalRelease(release))
        if frontier.isEmpty():
            break
        levels.append(frontier)

    from functools import reduce

    reached = reduce(DataFrame.unionByName, levels)
    out = base.join(reached, ["trace_id", "span_id"], "left")
    return out.select(
        "trace_id",
        "span_id",
        F.col("depth").cast("int").alias("depth"),
        F.col("cum_us").cast("long").alias("cum_us"),
        "path",
        F.col("depth").isNull().alias("is_orphan"),
    )


def trace_critical_path(
    paths: DataFrame,
) -> DataFrame:
    """Per-trace critical path from ``span_tree_paths`` output:
    (trace_id, critical_path, path_us BIGINT, path_depth INT).

    Durations are non-negative, so the maximum cumulative duration sits
    on some root-to-leaf chain; the argmax over ALL reached spans finds
    it without a separate leaf test.  Ties break on the lexicographically
    smallest path for determinism (same QUALIFY rule as the oracle).  The
    window partitions by trace_id — per-trace groups are bounded by
    spans-per-trace, never corpus-wide.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("trace_id").orderBy(
        F.col("cum_us").desc(), F.col("path").asc()
    )
    return (
        paths.where(~F.col("is_orphan"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "trace_id",
            F.col("path").alias("critical_path"),
            F.col("cum_us").cast("long").alias("path_us"),
            F.col("depth").cast("int").alias("path_depth"),
        )
    )
