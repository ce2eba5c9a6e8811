"""Service dependency map: caller→callee edges reconstructed from spans.

The Elastic APM UI's service map derives edges by resolving each exit
span to the transaction it caused downstream — the receiving
transaction's ``parent_span_id`` equals the exit span's ``span_id``
(`elasticapmprocessor` keeps those ids on every event for exactly this
join; see the reference's span model in
processor/elasticapmprocessor/internal/elasticapm/span.go).  Edges whose
callee never reported (an external database, a third-party API) fall back
to the exit span's destination resource.

Re-expressed as one self-join over the span table:

- **internal** edge: child span/transaction whose resolved parent lives in
  a different service → (parent.service → child.service);
- **external** edge: an exit span (non-null ``destination``) with NO
  downstream event claiming it as parent → (service → destination).

Scale shape: a single equi-join of the table with itself on
``parent_span_id = span_id`` — shuffle on the id (uniformly distributed
by construction: ids are unique), then one partial-aggregated groupBy on
the (source, target) pair.  No windows, no driver collection; at 10^12
spans this is the same two-shuffle plan.  The join is deliberately NOT
broadcast — both sides are the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def service_dependency_edges(
    df: DataFrame,
    span_col: str = "span_id",
    parent_col: str = "parent_span_id",
    service_col: str = "service",
    duration_col: str | None = None,
    destination_col: str | None = "destination",
) -> DataFrame:
    """Aggregate (source, target, edge_type, n_calls[, sum_duration_us]).

    ``edge_type`` is 'internal' when the callee reported its own events,
    'external' when the edge exists only as an unresolved exit span.
    Same-service parent/child pairs (in-process spans) are not edges.
    """
    callee = df.select(
        F.col(parent_col).alias("_pid"),
        F.col(service_col).alias("target"),
        *( [F.col(duration_col).alias("_dur")] if duration_col else [] ),
    ).where(F.col("_pid").isNotNull() & (F.col("_pid") != ""))

    caller = df.select(
        F.col(span_col).alias("_sid"),
        F.col(service_col).alias("source"),
        *(
            [F.col(destination_col).alias("_dest")]
            if destination_col
            else [F.lit(None).cast("string").alias("_dest")]
        ),
        *( [F.col(duration_col).alias("_cdur")] if duration_col else [] ),
    )

    resolved = caller.join(callee, caller["_sid"] == callee["_pid"], "left")
    internal = resolved.where(
        F.col("_pid").isNotNull() & (F.col("source") != F.col("target"))
    ).select(
        "source",
        "target",
        F.lit("internal").alias("edge_type"),
        *( [F.col("_dur").alias("_edge_dur")] if duration_col else [] ),
    )
    external = resolved.where(
        F.col("_pid").isNull() & F.col("_dest").isNotNull()
    ).select(
        "source",
        F.col("_dest").alias("target"),
        F.lit("external").alias("edge_type"),
        *( [F.col("_cdur").alias("_edge_dur")] if duration_col else [] ),
    )

    edges = internal.unionByName(external)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_calls")]
    if duration_col:
        aggs.append(F.sum("_edge_dur").cast("long").alias("sum_duration_us"))
    return edges.groupBy("source", "target", "edge_type").agg(*aggs)
