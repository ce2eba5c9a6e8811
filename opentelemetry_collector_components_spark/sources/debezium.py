"""Debezium CDC envelope intake — decode + snapshot apply.

The de-facto database change-stream format on Kafka (public Debezium
envelope: ``{before, after, source{db, table, lsn}, op, ts_ms}`` with op
``c``reate / ``u``pdate / ``d``elete / ``r``ead-snapshot).  The decode is
one ``from_json`` projection — whole-stage codegen, no Python — and the
apply is the last-writer-wins fold every CDC consumer runs: newest
envelope per key wins (ordered by ``(ts_ms, lsn)`` — ts alone ties under
bursts), deletes tombstone the row, everything else materializes its
``after`` image.  The output of ``apply_debezium`` is the current table;
the change-log form (``decode_debezium``) feeds ``scd2_from_changes``
when history is wanted instead.

Scale shape: decode is a scan; apply is ONE ``max_by`` groupBy on the
key — the same skew-proof shape as ``merge.cumulative_latest`` (A3), no
window, no per-key sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def envelope_schema(row_ddl: str) -> str:
    """Spark DDL for a Debezium envelope whose row image has ``row_ddl``
    fields (shared by decode and the fixture generator)."""
    return (
        f"struct<before: struct<{row_ddl}>, after: struct<{row_ddl}>, "
        "source: struct<db: string, table: string, lsn: bigint>, "
        "op: string, ts_ms: bigint>"
    )


def decode_debezium(
    df: DataFrame, row_ddl: str, body_col: str = "body"
) -> DataFrame:
    """JSON envelope strings -> flat change rows: ``(op, ts_ms, lsn,
    db, table, before.*-prefixed, after.*-prefixed)``; a malformed body
    or unknown op yields ``valid = false`` (envelope fields NULL)."""
    env = F.from_json(F.col(body_col), envelope_schema(row_ddl))
    out = df.select(env.alias("e"))
    # a NULL op must read valid=FALSE, not NULL (isin on NULL is NULL —
    # a `NOT valid` reject audit would silently miss those rows)
    ok = F.col("e").isNotNull() & F.col("e.op").isin(
        "c", "u", "d", "r"
    ).eqNullSafe(F.lit(True))
    return out.select(
        F.col("e.op").alias("op"),
        F.col("e.ts_ms").alias("ts_ms"),
        F.col("e.source.lsn").alias("lsn"),
        F.col("e.source.db").alias("db"),
        F.col("e.source.table").alias("table"),
        F.col("e.before").alias("before"),
        F.col("e.after").alias("after"),
        ok.alias("valid"),
    )


def apply_debezium(changes: DataFrame, key_fields: list[str]) -> DataFrame:
    """Materialize the current table from decoded envelopes: newest
    envelope per key wins — total order ``(ts_ms, lsn)`` — deletes drop
    the row, c/u/r emit their ``after`` image.  Keys come from ``after``
    (or ``before`` for deletes).  One max_by groupBy, no window."""
    if not key_fields:
        raise ValueError("key_fields must be non-empty")
    keyed = changes.where("valid").select(
        "op",
        "ts_ms",
        "lsn",
        "after",
        *[
            F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}")).alias(f"_k_{k}")
            for k in key_fields
        ],
    )
    latest = keyed.groupBy(*[f"_k_{k}" for k in key_fields]).agg(
        F.max_by(
            F.struct("op", "after"), F.struct("ts_ms", "lsn")
        ).alias("_w")
    )
    return (
        latest.where(F.col("_w.op") != "d")
        .select(F.col("_w.after.*"))
    )
