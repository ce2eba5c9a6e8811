"""The full lsminterval processor analog: per-type interval merge dispatch.

Routes each metric datapoint to its merge semantics by (type, temporality)
exactly as the reference's merger switch does
(processor/lsmintervalprocessor/processor.go:297-321, internal/merger/
value.go:575-601, datapoints.go):

- gauge                     -> pass through unaggregated (processor.go:297-302)
- sum delta                 -> SUM (add.go:58-68)
- sum cumulative            -> replace-by-newest (datapoints.go:65-79)
- histogram delta           -> vector-add, newest-bounds reset (add.go:70-107)
- histogram cumulative      -> replace-by-newest
- exponential_histogram delta -> downscale-merge UDAF (add.go:109-166)
- summary                   -> replace-by-newest (value.go:770-779) or
                               passthrough (config/config.go:79-85)

Input contract (FIXTURES.md §4): one row per datapoint with
``metric_name, metric_type, temporality, ts, seq`` plus the per-type value
columns.  Output: one merged row per (window_start, metric_name, attr_id)
per type family, unioned with a ``metric_type`` discriminator.

Cardinality limits (A7): ``datapoint_limit`` caps distinct ``attr_id`` per
(window, metric); overflow rows are folded into the ``_overflow`` bucket
and counted distinctly — `_overflow_datapoints` analog
(internal/merger/value.go:311-366).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .aggregate import trunc_to_interval
from .exphist import merge_exp_histograms
from .merge import (
    merge_cumulative,
    merge_cumulative_struct,
    merge_delta_histogram,
    merge_delta_sum,
    merge_summary,
    overflow_remap,
)

OVERFLOW_KEY = "_overflow"


def lsminterval_merge(
    df: DataFrame,
    interval: str = "1m",
    time_col: str = "ts",
    datapoint_limit: int | None = None,
    summary_passthrough: bool = False,
) -> dict[str, DataFrame]:
    """Merge a mixed metric_events frame per interval; returns one frame per
    type family plus 'gauge' passthrough and (optionally) the overflow
    datapoint counts."""
    win = trunc_to_interval(F.col(time_col), interval)
    df = df.withColumn("window_start", win)

    if datapoint_limit is not None:
        if "orig_attr_id" not in df.columns:
            # capture the pre-remap attr id so the overflow distinct count
            # below resolves standalone (callers that already ran
            # lsminterval_overflow_input keep their column)
            df = lsminterval_overflow_input(df)
        df = overflow_remap(
            df,
            ["window_start", "metric_name"],
            "attr_id",
            datapoint_limit,
            overflow_key=OVERFLOW_KEY,
        ).withColumn("attr_id", F.col("attr_id_merged")).drop("attr_id_merged")

    keys = ["window_start", "metric_name", "attr_id"]
    out: dict[str, DataFrame] = {}

    out["gauge"] = df.filter(F.col("metric_type") == "gauge").select(
        *keys, "ts", "seq", F.col("value_double").alias("value")
    )
    out["sum_delta"] = merge_delta_sum(
        df.filter((F.col("metric_type") == "sum") & (F.col("temporality") == "delta")), keys
    )
    out["sum_cumulative"] = merge_cumulative(
        df.filter((F.col("metric_type") == "sum") & (F.col("temporality") == "cumulative")), keys
    )
    out["histogram"] = merge_delta_histogram(
        df.filter((F.col("metric_type") == "histogram") & (F.col("temporality") == "delta")), keys
    )
    # cumulative histograms / exp-histograms: the whole datapoint is
    # replaced by the newest one (datapoints.go:65-79 — same rule as
    # cumulative sums; goldens testdata/{histogram,exphistogram}_cumulative)
    out["histogram_cumulative"] = merge_cumulative_struct(
        df.filter((F.col("metric_type") == "histogram") & (F.col("temporality") == "cumulative")),
        keys,
        ["bounds", "bucket_counts", "count", "sum", "min", "max"],
    )
    out["exp_histogram_cumulative"] = merge_cumulative_struct(
        df.filter((F.col("metric_type") == "exp_histogram") & (F.col("temporality") == "cumulative")),
        keys,
        ["scale", "zero_count", "zero_threshold", "pos_offset", "pos_counts",
         "neg_offset", "neg_counts", "count", "sum", "min", "max"],
    )
    eh = df.filter((F.col("metric_type") == "exp_histogram") & (F.col("temporality") == "delta"))
    out["exp_histogram"] = merge_exp_histograms(
        eh.select(
            F.col("window_start").cast("string").alias("window_start"),
            "metric_name", "attr_id", "scale", "zero_count", "zero_threshold",
            "pos_offset", "pos_counts", "neg_offset", "neg_counts",
            "count", "sum", "min", "max",
        ),
        keys,
    )
    summaries = df.filter(F.col("metric_type") == "summary")
    if summary_passthrough:
        # config.go:79-85 + testdata/summary_passthrough: summaries forwarded
        # unaggregated, exactly like gauges
        out["summary"] = summaries.select(*keys, "ts", "seq", "count", "sum")
    else:
        out["summary"] = merge_summary(summaries, keys)

    if datapoint_limit is not None:
        out["overflow_datapoints"] = (
            df.filter(F.col("overflow"))
            .groupBy("window_start", "metric_name")
            .agg(F.count_distinct("orig_attr_id").alias("_overflow_datapoints"))
        )
    return out


def lsminterval_overflow_input(df: DataFrame) -> DataFrame:
    """Keep the pre-remap attr id around for the overflow distinct count."""
    return df.withColumn("orig_attr_id", F.col("attr_id"))
