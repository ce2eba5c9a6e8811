"""Deterministic APM spans fixture table (FIXTURES.md §5).

Pure function of row id; exercises every path in operators/apm_metrics:
root vs child spans, sampled (sample_rate<1) spans, composite spans,
missing agent_name, success/failure/unknown outcomes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH = 1767225600  # 2026-01-01T00:00:00Z


def generate_spans(spark: SparkSession, n_rows: int) -> DataFrame:
    df = spark.range(n_rows)
    id_ = F.col("id")
    is_root = F.pmod(id_, F.lit(3)) == 0  # 1/3 transactions, 2/3 child spans
    start = F.timestamp_seconds(F.lit(EPOCH) + F.pmod(id_, F.lit(7200)))
    dur_us = (F.lit(1000) + F.pmod(id_ * F.lit(7919), F.lit(5_000_000))).cast("long")
    end = F.timestamp_micros(F.unix_micros(start) + dur_us)
    outcome = (
        F.when(F.pmod(id_, F.lit(10)) < 7, F.lit("success"))
        .when(F.pmod(id_, F.lit(10)) < 9, F.lit("failure"))
        .otherwise(F.lit("unknown"))
    )
    sample_rate = F.when(F.pmod(id_, F.lit(4)) == 0, F.lit(0.5)).otherwise(F.lit(1.0))
    is_composite = (~is_root) & (F.pmod(id_, F.lit(5)) == 1)
    return df.select(
        F.concat(F.lit("tr"), F.pmod(id_, F.lit(1000))).alias("trace_id"),
        F.concat(F.lit("sp"), id_).alias("span_id"),
        F.when(is_root, F.lit("")).otherwise(F.concat(F.lit("sp"), id_ - 1)).alias("parent_span_id"),
        F.concat(F.lit("op-"), F.pmod(id_, F.lit(8))).alias("name"),
        F.when(is_root, F.lit("server")).otherwise(F.lit("client")).alias("kind"),
        start.alias("start_ts"),
        end.alias("end_ts"),
        outcome.alias("outcome"),
        sample_rate.alias("sample_rate"),
        F.when(is_composite, (F.pmod(id_, F.lit(9)) + 2).cast("long")).alias("composite_count"),
        F.when(is_composite, (dur_us * 3).cast("double")).alias("composite_sum_us"),
        F.concat(F.lit("svc-"), F.pmod(id_, F.lit(5))).alias("service"),
        F.lit("prod").alias("environment"),
        F.lit("python").alias("sdk_language"),
        F.when(F.pmod(id_, F.lit(7)) == 0, F.lit(None).cast("string")).otherwise(F.lit("otel-python")).alias("agent_name"),
        F.when(is_root, F.lit(None).cast("string")).otherwise(F.concat(F.lit("dest-"), F.pmod(id_, F.lit(4)))).alias("destination"),
        # semconv variants driving txn type/result inference (span.go:476-514):
        # explicit type, messaging system, rpc+grpc status, http status
        # (codes reach past 599 so the non-standard "HTTP <code>" branch is
        # exercised), and span status
        F.when(F.pmod(id_, F.lit(11)) == 0, F.lit("custom")).alias("type_value"),
        F.when(F.pmod(id_, F.lit(7)) == 1, F.lit("kafka")).alias("messaging_system"),
        F.when(F.pmod(id_, F.lit(7)) == 2, F.lit("grpc")).alias("rpc_system"),
        F.when(F.pmod(id_, F.lit(7)) == 2, F.when(F.pmod(id_, F.lit(2)) == 0, F.lit("OK")).otherwise(F.lit(""))).alias("grpc_status"),
        F.when(F.pmod(id_, F.lit(7)).isin(3, 4), (F.lit(100) + F.pmod(id_ * F.lit(13), F.lit(520))).cast("int")).alias("http_status_code"),
        F.when(F.pmod(id_, F.lit(5)) == 0, F.lit("Error"))
        .when(F.pmod(id_, F.lit(5)) == 1, F.lit("Ok"))
        .otherwise(F.lit("Unset")).alias("span_status"),
        # dropped_spans_stats on some transactions (traces.go:538-581):
        # two entries per carrying root, pure functions of id
        F.when(
            is_root & (F.pmod(id_, F.lit(6)) == 0),
            F.array(
                F.struct(
                    F.concat(F.lit("dss-"), F.pmod(id_, F.lit(3))).alias("destination"),
                    F.lit("success").alias("outcome"),
                    (F.pmod(id_, F.lit(50)) * 1000).cast("double").alias("sum_us"),
                    (F.pmod(id_, F.lit(4)) + 1).cast("long").alias("count"),
                ),
                F.struct(
                    F.concat(F.lit("dss-"), F.pmod(id_, F.lit(5))).alias("destination"),
                    F.lit("failure").alias("outcome"),
                    (F.pmod(id_, F.lit(30)) * 500).cast("double").alias("sum_us"),
                    (F.pmod(id_, F.lit(3)) + 1).cast("long").alias("count"),
                ),
            ),
        ).alias("dropped_spans_stats"),
    )


def generate_trace_trees(
    spark: SparkSession, n_traces: int, spans_per_trace: int
) -> DataFrame:
    """Span TREE fixture (operators/tracetree.py gates): every trace is a
    binary heap — parent of position k is (k-1) div 2 — so depths and
    root paths have a closed form the DuckDB oracle can also reach with a
    recursive CTE.  Every 7th trace's last span points at a missing
    parent (the broken-chain orphan case).  ``generate_spans`` is NOT a
    tree (its parent pointers cross traces by construction), hence this
    dedicated fixture."""
    df = spark.range(n_traces * spans_per_trace)
    t = F.expr(f"id DIV {spans_per_trace}")
    k = F.pmod(F.col("id"), F.lit(spans_per_trace))
    span_id = F.concat(F.lit("s"), t, F.lit("-"), k)
    parent = (
        F.when(k == 0, F.lit(None).cast("string"))
        .when(
            (F.pmod(t, F.lit(7)) == 0) & (k == spans_per_trace - 1),
            F.lit("missing"),
        )
        .otherwise(
            F.concat(F.lit("s"), t, F.lit("-"), F.expr("(id % {0} - 1) DIV 2".format(spans_per_trace)))
        )
    )
    dur = (F.lit(1000) + F.pmod(F.col("id") * F.lit(7919), F.lit(100000))).cast("long")
    return df.select(
        F.concat(F.lit("tr"), t).alias("trace_id"),
        span_id.alias("span_id"),
        parent.alias("parent_span_id"),
        dur.alias("dur_us"),
    )
