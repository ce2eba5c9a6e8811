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


def hilbert_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    order: int = 16,
    out_col: str = "hilbert_key",
) -> DataFrame:
    """Hilbert-curve distance of 2-D bucket coordinates — the
    locality-better sibling of ``zorder_key`` (Delta OPTIMIZE grew a
    Hilbert mode for the same reason): Morton order has unbounded
    jumps at quadrant seams, while consecutive Hilbert positions are
    always grid neighbors, so range-partitioned files get tighter
    per-file min/max envelopes on BOTH dimensions.

    Inputs must be bucket ids in [0, 2^order); values outside raise
    (silently masked bits would scramble the curve).  The classic
    bitwise walk (Wikipedia "Hilbert curve", xy2d with whole-square
    reflection) is a per-bit STATE MACHINE — x and y mutate each level
    — so it is expressed as one projection per level (a Column tree
    would re-substitute the mutated x/y exponentially); Catalyst keeps
    conditional projections separate, the chain stays in whole-stage
    codegen, and the 2·order temporary columns are dropped at the end.

    2-D covers the canonical (time-bucket, entity-bucket) layout; for
    more dimensions compose: hilbert over the two highest-selectivity
    columns, zorder_key the rest.
    """
    if not 1 <= order <= 31:
        raise ValueError("order must be in [1, 31]")
    n = 1 << order
    guard = F.when(
        F.col(x_col).cast("long").between(0, n - 1)
        & F.col(y_col).cast("long").between(0, n - 1),
        F.lit(True),
    ).otherwise(
        F.raise_error(
            f"hilbert_key: {x_col}/{y_col} must be in [0, 2^{order})"
        ).cast("boolean")
    )
    out = df.withColumns(
        {
            "_hx": F.when(guard, F.col(x_col).cast("long")),
            "_hy": F.col(y_col).cast("long"),
            "_hd": F.lit(0).cast("long"),
        }
    )
    for i in range(order - 1, -1, -1):
        s = 1 << i
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        out = out.withColumns(
            {"_rx": rx.cast("long"), "_ry": ry.cast("long")}
        )
        d_step = (
            F.lit(s).cast("long")
            * F.lit(s)
            * (F.col("_rx") * 3).bitwiseXOR(F.col("_ry"))
        )
        flip = F.col("_ry") == 0
        neg = F.col("_rx") == 1
        xf = F.when(neg, F.lit(n - 1) - F.col("_hx")).otherwise(F.col("_hx"))
        yf = F.when(neg, F.lit(n - 1) - F.col("_hy")).otherwise(F.col("_hy"))
        out = out.withColumns(
            {
                "_hd": F.col("_hd") + d_step,
                "_hx": F.when(flip, yf).otherwise(F.col("_hx")),
                "_hy": F.when(flip, xf).otherwise(F.col("_hy")),
            }
        )
    return (
        out.withColumn(out_col, F.col("_hd"))
        .drop("_hx", "_hy", "_hd", "_rx", "_ry")
    )


def hilbert_oracle_sql(
    rows_sql: str,
    x_col: str,
    y_col: str,
    order: int,
    keep_cols: list[str],
    out_col: str = "hilbert_key",
) -> str:
    """DuckDB replay: the identical per-level state machine unrolled as
    one CTE stage per bit."""
    n = 1 << order
    keeps = ", ".join(keep_cols)
    stages = [
        f"h{order} AS (SELECT {keeps}, CAST({x_col} AS BIGINT) AS hx, "
        f"CAST({y_col} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd "
        f"FROM ({rows_sql}) src)"
    ]
    for i in range(order - 1, -1, -1):
        s = 1 << i
        stages.append(f"""h{i} AS (
        SELECT {keeps},
               CASE WHEN ((hy >> {i}) & 1) = 0 THEN
                 CASE WHEN ((hx >> {i}) & 1) = 1 THEN {n - 1} - hy ELSE hy END
               ELSE hx END AS hx,
               CASE WHEN ((hy >> {i}) & 1) = 0 THEN
                 CASE WHEN ((hx >> {i}) & 1) = 1 THEN {n - 1} - hx ELSE hx END
               ELSE hy END AS hy,
               hd + {s}::BIGINT * {s} *
                 xor(((hx >> {i}) & 1) * 3, (hy >> {i}) & 1) AS hd
        FROM h{i + 1}
    )""")
    ctes = ",\n    ".join(stages)
    return f"""
    WITH {ctes}
    SELECT {keeps}, hd AS {out_col} FROM h0
    """
