"""Resumable runs: per-unit checkpoint cursor.

Analog of the Akamai SIEM receiver's persisted cursor
(receiver/akamaisiemreceiver/internal/cursor/cursor.go:34-94: save after
each page; 3-branch resume in internal/poller/poller.go:19,196,444).  In a
batch Spark pipeline the natural commit unit is a sink (or an input
partition range); the cursor is a tiny parquet table:

    (unit_id string, status string, rows_out long, run_id string,
     updated_at double)

``run_resumable`` executes only units whose id is not yet ``done`` — an
idempotent re-run after a crash completes the remaining units and leaves
per-sink counts identical to an uninterrupted run (the north-rule
resumability requirement).

Each unit writes with ``mode=overwrite`` into its own directory, so a unit
that crashed mid-write is safely re-executed (write-then-mark ordering:
the checkpoint row is appended only after the unit's write succeeds).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

CKPT_SCHEMA = "unit_id string, status string, rows_out long, run_id string, updated_at double"


def _ckpt_dir(base_dir: str) -> str:
    return os.path.join(base_dir, "_checkpoint")


def read_checkpoint(spark: SparkSession, base_dir: str) -> DataFrame:
    path = _ckpt_dir(base_dir)
    try:
        return spark.read.schema(CKPT_SCHEMA).parquet(path)
    except AnalysisException as e:
        # only a MISSING checkpoint means "nothing done yet"; a corrupt or
        # unreadable one must propagate — treating it as empty would
        # silently re-run every completed unit of a resumable run
        if "PATH_NOT_FOUND" not in str(e):
            raise
        return spark.createDataFrame([], CKPT_SCHEMA)


def completed_units(spark: SparkSession, base_dir: str) -> set[str]:
    return {
        r["unit_id"]
        for r in read_checkpoint(spark, base_dir).filter("status = 'done'").select("unit_id").collect()
    }


def mark_done(spark: SparkSession, base_dir: str, unit_id: str, rows_out: int, run_id: str) -> None:
    spark.createDataFrame(
        [(unit_id, "done", rows_out, run_id, time.time())], CKPT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(_ckpt_dir(base_dir))


def partition_units(
    df_builder: Callable[[int, int], DataFrame],
    n_rows: int,
    n_units: int,
    write: Callable[[DataFrame, int], int],
) -> dict[str, Callable[[], int]]:
    """Input-partition-range commit units (the Akamai chain-window analog:
    each unit covers a disjoint id range, resume skips completed ranges).

    ``df_builder(lo, hi)`` must return the rows with lo <= id < hi —
    for a table scan that is a pushed-down range predicate (partition
    pruning); for the synthetic generator it is generate_pages sliced.
    ``write(df, unit_idx)`` performs the idempotent write, returns rows.
    """
    step = (n_rows + n_units - 1) // n_units
    units = {}
    for i in range(n_units):
        lo, hi = i * step, min((i + 1) * step, n_rows)

        def _run(lo=lo, hi=hi, i=i) -> int:
            return write(df_builder(lo, hi), i)

        units[f"part_{i:05d}"] = _run
    return units


def run_resumable(
    spark: SparkSession,
    base_dir: str,
    units: dict[str, Callable[[], int]],
    run_id: str = "run0",
    fail_after: int | None = None,
) -> dict[str, str]:
    """Execute each pending unit; skip units already checkpointed done.

    ``units`` maps unit_id -> thunk performing the write and returning the
    row count.  ``fail_after`` injects a crash after N successful units
    (resume-test hook).  Returns unit_id -> 'done'|'skipped'.
    """
    done = completed_units(spark, base_dir)
    status: dict[str, str] = {}
    executed = 0
    for unit_id in sorted(units):
        if unit_id in done:
            status[unit_id] = "skipped"
            continue
        if fail_after is not None and executed >= fail_after:
            raise RuntimeError(f"injected failure before unit {unit_id}")
        rows = units[unit_id]()
        mark_done(spark, base_dir, unit_id, rows, run_id)
        status[unit_id] = "done"
        executed += 1
    return status
