"""Cross-source score calibration (bucket-granular quantile normalization).

The mixing problem every multi-source corpus hits: quality scores from
different sources live on different scales (a 0.8 from one classifier
run, crawl snapshot, or heuristic is not a 0.8 from another), so one
global threshold keeps the wrong documents.  The standard fix is quantile
normalization: replace each score with its within-source percentile, or
map it onto the global score distribution at the same quantile.

Both operators work at BUCKET granularity (callers bucket the score
first — ``drift.width_bucket`` — which is also what makes them
scale-safe): every distribution statistic is computed on the
(source x bucket) HISTOGRAM, so

- the corpus pays exactly ONE partial-aggregated groupBy + one broadcast
  join back (the histogram is sources x buckets rows — tiny by
  construction);
- the cumulative windows run per source over B bucket rows, never corpus
  rows (no per-source corpus sort — the skew trap of row-level
  percent_rank, where one dominant source serializes onto one task);
- all ranks are exact integers: pct_ppm = (1e6 * ccum) div n_s, and the
  global-quantile mapping compares cross products ccum_s * n_g vs
  ccum_g * n_s — no float CDFs, engine-exact.

Bucket-granular percentiles are a step function (every doc in a bucket
gets the bucket's upper-CDF value) — the documented trade for never
sorting the corpus; narrow the bucket width to sharpen it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _source_cdf(df: DataFrame, bucket_col: str, source_col: str) -> DataFrame:
    """(source, bucket, ccum, n_s) — per-source cumulative histogram.
    NULL buckets are rejected (a percentile needs a rank; NULL has none)."""
    hist = (
        df.select(
            F.when(
                F.col(bucket_col).isNull(),
                F.raise_error(
                    f"score calibration: NULL in {bucket_col} — bucket "
                    "the score first (NULL has no rank)"
                ).cast("long"),
            )
            .otherwise(F.col(bucket_col))
            .alias("bucket"),
            F.col(source_col).alias("source"),
        )
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wfull = Window.partitionBy("source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return hist.select(
        "source",
        "bucket",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("ccum"),
        F.sum("cnt").over(wfull).cast("long").alias("n_s"),
    )


def per_source_percentile(
    df: DataFrame,
    bucket_col: str,
    source_col: str,
) -> DataFrame:
    """Attach ``pct_ppm`` = the row's within-source percentile in parts
    per million, ``(1_000_000 * ccum) div n_s`` where ccum counts source
    rows with bucket <= this row's bucket (upper CDF: the highest bucket
    of a source always maps to exactly 1_000_000).  All input columns
    pass through."""
    cdf = _source_cdf(df, bucket_col, source_col).select(
        F.col("source").alias("_src"),
        F.col("bucket").alias("_bkt"),
        F.expr("(1000000 * ccum) div n_s").alias("pct_ppm"),
    )
    # eqNullSafe on source: a NULL source is a real group (the histogram
    # built one for it) — a plain == would evaluate NULL == NULL to NULL
    # and silently drop those rows from the inner join
    return df.join(
        F.broadcast(cdf),
        F.col(source_col).eqNullSafe(F.col("_src"))
        & (F.col(bucket_col) == F.col("_bkt")),
    ).drop("_src", "_bkt")


def calibrate_to_global(
    df: DataFrame,
    bucket_col: str,
    source_col: str,
) -> DataFrame:
    """Attach ``calibrated_bucket``: the smallest GLOBAL score bucket whose
    global CDF reaches this row's within-source CDF — i.e. the score this
    row would have if its source followed the global distribution
    (classic quantile normalization, bucket-granular).

    The quantile match is exact-integer: global bucket g qualifies when
    ``ccum_g * n_s >= ccum_s * n_g`` (cross products, no float CDFs).
    The source->global mapping table is built once from the two tiny
    cumulative histograms (a broadcast range join over sources x buckets
    rows) and broadcast back onto the corpus."""
    src = _source_cdf(df, bucket_col, source_col)
    # global cumulative histogram derived from the SAME histogram rows
    # (sum of per-source bucket counts) — the corpus is not scanned again
    per_bucket = src.groupBy("bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    wg = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    wgfull = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    gcdf = per_bucket.select(
        F.col("bucket").alias("g_bucket"),
        F.sum("cnt").over(wg).cast("long").alias("ccum_g"),
        F.sum("cnt").over(wgfull).cast("long").alias("n_g"),
    )
    # smallest qualifying global bucket per (source, bucket): range join
    # between the two tiny tables, then min
    mapping = (
        src.join(
            F.broadcast(gcdf),
            F.col("ccum_g") * F.col("n_s") >= F.col("ccum") * F.col("n_g"),
        )
        .groupBy("source", "bucket")
        .agg(F.min("g_bucket").alias("calibrated_bucket"))
        .select(
            F.col("source").alias("_src"),
            F.col("bucket").alias("_bkt"),
            "calibrated_bucket",
        )
    )
    return df.join(
        F.broadcast(mapping),
        F.col(source_col).eqNullSafe(F.col("_src"))
        & (F.col(bucket_col) == F.col("_bkt")),
    ).drop("_src", "_bkt")
