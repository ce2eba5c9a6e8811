"""Multiline log stitching: reassemble physical log lines into events.

The classic log-shipper feature (filebeat's ``multiline`` /filestream
parser, which feeds the same Elastic pipeline this reference sits in):
a Java stack trace, a wrapped SQL statement, or a pretty-printed JSON
body arrives as many physical lines, and only the first matches the
timestamp prefix every real log line carries.  Stitching groups each
start line with the continuation lines that follow it — filebeat's
``pattern + negate: true + match: after`` configuration, the
overwhelmingly common production form.

Semantics (per file, in line order):

- a line matching ``start_pattern`` OPENS a new event;
- a non-matching line is a CONTINUATION of the most recent open event;
- continuation lines arriving before any start line (a shipper picked up
  mid-file) group into one leading orphan event with
  ``clean_start = false`` — delivered, never dropped (data loss is worse
  than an ugly event; same choice as filebeat);
- ``max_lines`` (filebeat default 500) truncates oversized events and
  flags them ``truncated`` — a runaway repeated-continuation bug must
  not produce a gigabyte-sized event row.

Scale shape: one shuffle partitioned by the file identity for the
running-sum window (events-within-a-file is an inherently sequential
numbering — the same per-file ordering every shipper enforces with a
single reader per file), then a groupBy on (file, record) that reuses
the same key prefix.  Files are the parallelism unit; a single
pathological multi-TB file serializes its own window partition and
nothing else — split it by coarse line ranges and stitch the boundary
records if that ever matters.  Line assembly is sort_array over the
collected (line_no, line) structs — bounded at ``max_lines`` per group,
all JVM expressions, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stitch_multiline(
    df: DataFrame,
    start_pattern: str,
    file_cols: list[str],
    line_col: str = "line",
    order_col: str = "line_no",
    max_lines: int | None = 500,
) -> DataFrame:
    """One row per stitched event:
    (*file_cols, record_id BIGINT 0-based per file, message STRING joined
    with newlines, n_lines BIGINT physical lines BEFORE truncation,
    first_line_no BIGINT, clean_start BOOLEAN, truncated BOOLEAN).

    ``record_id`` 0 with ``clean_start = false`` is the leading orphan
    group (continuations seen before the first start line); every other
    record begins with a ``start_pattern`` match.
    """
    if max_lines is not None and max_lines < 1:
        raise ValueError("max_lines must be >= 1 (or None for unbounded)")
    is_start = F.col(line_col).rlike(start_pattern)
    run = (
        Window.partitionBy(*file_cols)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = df.withColumn(
        "_rec", F.sum(is_start.cast("long")).over(run)
    )
    if max_lines is None:
        n_lines = F.count(F.lit(1)).cast("long").alias("n_lines")
    else:
        # the truncation must bound the AGGREGATION, not just the output:
        # drop lines past max_lines BEFORE collect_list so a runaway
        # repeated-continuation record never materializes a giant array in
        # the aggregation buffer.  The true (pre-truncation) line count is
        # captured as a window count first; both windows cluster on the
        # file key, so no extra shuffle is paid.
        wrec_ordered = Window.partitionBy(*file_cols, "_rec").orderBy(
            F.col(order_col).asc()
        )
        wrec = Window.partitionBy(*file_cols, "_rec")
        numbered = (
            numbered.withColumn("_idx", F.row_number().over(wrec_ordered))
            .withColumn("_total", F.count(F.lit(1)).over(wrec))
            .where(F.col("_idx") <= F.lit(max_lines))
        )
        n_lines = F.max("_total").cast("long").alias("n_lines")
    grouped = numbered.groupBy(*file_cols, "_rec").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(order_col).alias("n"), F.col(line_col).alias("l")))
        ).alias("_lines"),
        n_lines,
        F.min(order_col).cast("long").alias("first_line_no"),
    )
    return grouped.select(
        *file_cols,
        F.col("_rec").cast("long").alias("record_id"),
        F.array_join(
            F.transform("_lines", lambda s: s["l"]), "\n"
        ).alias("message"),
        "n_lines",
        "first_line_no",
        # record 0 exists only when the file leads with continuations
        (F.col("_rec") > 0).alias("clean_start"),
        (
            F.lit(False)
            if max_lines is None
            else (F.col("n_lines") > F.lit(max_lines))
        ).alias("truncated"),
    )
