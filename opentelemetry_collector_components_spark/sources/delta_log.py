"""Delta Lake transaction-log replay — snapshot resolution from JSON actions.

The public Delta protocol (delta.io PROTOCOL.md): a table IS its
``_delta_log/`` — numbered versions of newline-delimited JSON actions

    {"protocol": {"minReaderVersion": ..}}
    {"metaData": {"id": .., "schemaString": .., "partitionColumns": [..]}}
    {"add":    {"path", "size", "dataChange", "stats": "{\\"numRecords\\": n}"}}
    {"remove": {"path", "deletionTimestamp", "dataChange"}}
    {"commitInfo": {...}}

and a reader resolves the CURRENT snapshot by replaying versions in
order: the LAST action per file path wins (add -> live, remove ->
dead), the last metaData/protocol win table-wide.  This is the sink
counterpart of the Iceberg-gated writer in ``plans/sinks.py`` — the
environment has no Delta jars, but snapshot resolution is pure data
semantics and lets the engine answer "which parquet files are this
table, right now" from the log alone (time travel = replay a prefix).

Scale shape: one ``from_json`` projection + ONE ``max_by`` groupBy on
the file path — last-writer-wins is an associative fold, no window, no
sort; unknown action types pass through ignored (forward-compatible,
as the protocol requires).  Checkpoint parquet files (every 10th
version in production logs) are an optimization of the same replay —
out of scope here, documented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, LongType, StringType, StructField, StructType,
)

ACTION_SCHEMA = StructType(
    [
        StructField(
            "add",
            StructType(
                [
                    StructField("path", StringType()),
                    StructField("size", LongType()),
                    StructField("dataChange", BooleanType()),
                    StructField("stats", StringType()),
                ]
            ),
        ),
        StructField(
            "remove",
            StructType(
                [
                    StructField("path", StringType()),
                    StructField("deletionTimestamp", LongType()),
                    StructField("dataChange", BooleanType()),
                ]
            ),
        ),
        StructField(
            "metaData",
            StructType(
                [
                    StructField("id", StringType()),
                    StructField("schemaString", StringType()),
                    StructField("partitionColumns", ArrayType(StringType())),
                ]
            ),
        ),
        StructField(
            "protocol",
            StructType(
                [
                    StructField("minReaderVersion", LongType()),
                    StructField("minWriterVersion", LongType()),
                ]
            ),
        ),
    ]
)


def replay_delta_log(
    df: DataFrame, version_col: str = "version", line_col: str = "line",
    as_of_version: int | None = None,
) -> DataFrame:
    """Replay the action log -> live-file snapshot: one row per LIVE
    file ``(path, size, num_records, version_added)``.  Pass
    ``as_of_version`` for time travel (replay the prefix <= v)."""
    src = df
    if as_of_version is not None:
        src = src.where(F.col(version_col) <= as_of_version)
    a = F.from_json(F.col(line_col), ACTION_SCHEMA)
    acts = src.select(
        F.col(version_col).alias("_v"),
        a["add"]["path"].alias("_ap"),
        a["remove"]["path"].alias("_rp"),
        a["add"]["size"].alias("_size"),
        F.get_json_object(a["add"]["stats"], "$.numRecords")
        .cast("long")
        .alias("_rows"),
    ).where(F.col("_ap").isNotNull() | F.col("_rp").isNotNull())
    per_path = acts.select(
        F.coalesce("_ap", "_rp").alias("path"),
        F.col("_ap").isNotNull().alias("_is_add"),
        "_v", "_size", "_rows",
    ).groupBy("path").agg(
        F.max_by(F.struct("_is_add", "_size", "_rows", "_v"), F.col("_v")).alias(
            "s"
        )
    )
    return per_path.where(F.col("s")["_is_add"]).select(
        "path",
        F.col("s")["_size"].alias("size"),
        F.col("s")["_rows"].alias("num_records"),
        F.col("s")["_v"].alias("version_added"),
    )


def generate_delta_log(events: DataFrame, n_files: int = 200) -> DataFrame:
    """A deterministic table life rendered as (version, line) actions,
    closed-form from events so oracles replay it without JSON:

    - v0: protocol + metaData lines
    - v(i % 5): one add per file bucket i = event_id % n_files
      (``part-<i>.parquet``, size = Σ round(value*100), numRecords =
      bucket count — both inside a real nested-JSON stats string)
    - v6: remove every i % 4 == 0 file (a compaction's inputs)
    - v7: add ``compact-<i>.parquet`` replacements carrying the same
      size/rows

    Live snapshot therefore = originals with i % 4 != 0 at their add
    version + compacted replacements at v7.
    """
    spark = events.sparkSession
    files = events.groupBy(
        (F.col("event_id") % n_files).alias("i")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("size"),
        F.count(F.lit(1)).alias("rows"),
    )
    stats = F.format_string('{\\"numRecords\\": %d}', F.col("rows"))
    add_line = F.format_string(
        '{"add": {"path": "part-%d.parquet", "size": %d, '
        '"dataChange": true, "stats": "%s"}}',
        F.col("i"), F.col("size"), stats,
    )
    adds = files.select((F.col("i") % 5).alias("version"), add_line.alias("line"))
    removes = files.where(F.col("i") % 4 == 0).select(
        F.lit(6).cast("long").alias("version"),
        F.format_string(
            '{"remove": {"path": "part-%d.parquet", '
            '"deletionTimestamp": 1700000000000, "dataChange": true}}',
            F.col("i"),
        ).alias("line"),
    )
    compacts = files.where(F.col("i") % 4 == 0).select(
        F.lit(7).cast("long").alias("version"),
        F.format_string(
            '{"add": {"path": "compact-%d.parquet", "size": %d, '
            '"dataChange": false, "stats": "%s"}}',
            F.col("i"), F.col("size"), stats,
        ).alias("line"),
    )
    header = spark.createDataFrame(
        [
            (0, '{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}'),
            (0, '{"metaData": {"id": "fixture", "schemaString": "{}", '
                '"partitionColumns": []}}'),
            (0, '{"commitInfo": {"operation": "WRITE"}}'),
        ],
        "version long, line string",
    )
    return header.unionByName(adds).unionByName(removes).unionByName(compacts)


def concurrent_commit_conflicts(txns: DataFrame) -> DataFrame:
    """File-level optimistic-concurrency check between commit attempts —
    the Delta/Iceberg commit-retry rule (public semantics of Delta's
    ConflictChecker / Iceberg's validation): two concurrent transactions
    conflict iff they REMOVE overlapping files (both compacted/deleted
    the same data); concurrent appends always commute, and a remove of a
    file the other txn ADDED cannot happen under snapshot isolation (the
    add was invisible).  Read-predicate conflicts are the finer level a
    real log tracks — documented out of scope here, file-level is what
    the retry loop checks first.

    Input ``(txn_id, action 'add'|'remove', path)``; output one row per
    conflicting unordered pair: ``(txn_a, txn_b, n_overlap)`` with
    txn_a < txn_b.  One self-equi-join on path over the DISTINCT remove
    subset (re-emitted actions must not inflate the overlap count) —
    |removes| rows, never |txns|² — then a pair count."""
    removes = (
        txns.where(F.col("action") == "remove")
        .select("txn_id", "path")
        .distinct()
    )
    a = removes.withColumnRenamed("txn_id", "txn_a")
    b = removes.withColumnRenamed("txn_id", "txn_b")
    return (
        a.join(b, "path")
        .where(F.col("txn_a") < F.col("txn_b"))
        .groupBy("txn_a", "txn_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
