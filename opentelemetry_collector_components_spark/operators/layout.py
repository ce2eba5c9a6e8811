"""Data-layout operators: Z-order clustering keys and compaction planning.

At 100 TB the dominant cost is the SCAN, and the scan is shaped by file
layout, not by the query plan: a sink partitioned only by day reads every
file for a host-filtered query, and a sink full of 10 MB files drowns the
driver in task scheduling.  Two layout tools the reference leaves to
Elasticsearch/Lucene internals but an Iceberg-backed pipeline must do
itself (`plans/sinks.py` writes the files these operators organize):

- ``zorder_key`` — interleave the bits of several bounded dimension
  buckets into ONE sort key (Morton order).  Sorting/range-partitioning
  by it clusters rows that are close in EVERY dimension, so min/max file
  stats prune scans on any participating column — the multi-dimension
  analog of sortWithinPartitions on a single column, and the same
  technique Delta/Iceberg expose as OPTIMIZE ZORDER BY.  Pure bit
  arithmetic, scan-fused, SQL-replayable.
- ``plan_compaction`` — group small files into merge bins near a target
  size: deterministic OFFSET BUCKETING in file order via a window
  cumulative sum partitioned per directory — a file belongs to the bin
  its start offset falls in (floor(start/target)).  Each bin holds
  consecutive files, and the guarantee is a PREFIX property: cumulative
  bytes through every non-final bin reach (bin_index+1)·target, so bins
  fill to the target on average; an individual bin underfills exactly
  by its predecessor's overhang (a file straddling the boundary counts
  toward the earlier bin).  That is the price of a rule that is a pure
  per-row function of the cumsum — parallel, deterministic, and
  SQL-replayable; the strict per-bin greedy ("close when current bin
  reaches target") is a sequential state machine with no window form.
  The planner is a pure function of the manifest — rewriting executors
  then process one bin per task.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of ``len(cols)`` dimension buckets,
    ``bits`` bits each — a BIGINT sort key with multi-dimensional
    locality.

    Inputs must be non-negative bucket ids; each is masked to ``bits``
    bits (callers normalize raw values first — hash-mod for ids,
    epoch-div for time, ntile for skewed continuous columns).  Total
    ``bits * len(cols)`` must fit a signed 64-bit key.  The expansion is
    ``bits x dims`` shift-and-mask terms folded into one sum — wide but
    flat, stays inside whole-stage codegen.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if bits < 1 or bits * n > 63:
        raise ValueError("bits * len(cols) must be in [2, 63]")
    terms = []
    for j, c in enumerate(cols):
        cl = c.cast("long")
        for i in range(bits):
            # bit i of dim j lands at interleaved position i*n + j
            terms.append(
                F.shiftleft(
                    F.shiftright(cl, i).bitwiseAND(F.lit(1).cast("long")),
                    i * n + j,
                )
            )
    return reduce(lambda a, b: a + b, terms)


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The identical interleave as an ANSI-SQL expression string (for
    oracle replay and for engines reading the same table)."""
    n = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {i}) & 1) << {i * n + j})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return " + ".join(terms)


def bucket_by_splits(value: Column, splits: list[float]) -> Column:
    """Partition id from explicit split points: ``#splits <= value``
    (0-based, ``len(splits)+1`` buckets; NULL values -> NULL).  One flat
    comparison sum, scan-fused — the assignment half of sketch-driven
    balanced range partitioning."""
    if not splits:
        raise ValueError("splits must be non-empty")
    if sorted(splits) != list(splits):
        raise ValueError("splits must be ascending")
    terms = [
        F.when(value >= F.lit(float(s)), 1).otherwise(0) for s in splits
    ]
    return F.when(
        value.isNotNull(), reduce(lambda a, b: a + b, terms).cast("int")
    )


def balanced_splits(
    sketch: DataFrame, n_parts: int, alpha: float = 0.01
) -> list[float]:
    """``n_parts - 1`` split points from a DDSketch built over the value
    column — equi-depth range boundaries WITHOUT a global sort or a
    sampling pass over raw data (``repartitionByRange`` samples; this
    reuses the sketch the pipeline already maintains, so boundaries are
    deterministic run to run and α-accurate even for heavy tails).

    The collect is ``n_parts - 1`` rows of an already-tiny sketch
    aggregate — driver-side by design, same as repartitionByRange's own
    boundary collection."""
    from .sketches import ddsketch_quantiles

    if n_parts < 2:
        raise ValueError("n_parts must be >= 2")
    qs = [i / n_parts for i in range(1, n_parts)]
    rows = ddsketch_quantiles(sketch, [], qs, alpha).collect()
    return [r.est for r in sorted(rows, key=lambda r: r.q)]


def plan_compaction(
    manifest: DataFrame,
    dir_cols: list[str],
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Assign every file to a merge bin: consecutive files (ordered by
    ``file_col`` within each directory) bucketed by the target-multiple
    their START OFFSET falls in (see the module docstring for the exact
    prefix guarantee and the underfill trade vs the sequential greedy).

    Returns the manifest plus ``bin INT``.  Exactly the window shape that
    scales: partitioned per directory (a directory's manifest is small),
    cumulative-sum based so the assignment replays in any SQL engine.
    Bin ids are dense per directory starting at 0.  Files larger than the
    target get a bin of their own (the cumsum crosses the boundary at
    that file).
    """
    if target_bytes < 1:
        raise ValueError("target_bytes must be >= 1")
    if not dir_cols:
        raise ValueError("dir_cols must be non-empty (per-directory plans)")
    w = Window.partitionBy(*dir_cols).orderBy(file_col)
    cum = F.sum(F.col(size_col)).over(w)
    # bin = how many FULL targets lie strictly below this file's start
    # offset; a file that crosses a boundary belongs to the bin it
    # started in (streaming first-fit, bins >= target except the last)
    start = cum - F.col(size_col)
    binned = manifest.withColumn(
        "_fullbins", F.floor(start / F.lit(target_bytes)).cast("int")
    )
    # dense-rank the distinct fullbin ids so bins are 0,1,2,... even when
    # one huge file spans several targets
    wd = Window.partitionBy(*dir_cols).orderBy("_fullbins")
    return binned.withColumn(
        "bin", (F.dense_rank().over(wd) - 1).cast("int")
    ).drop("_fullbins")
