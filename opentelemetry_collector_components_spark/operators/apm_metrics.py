"""Signal -> metrics synthesis — the elasticapmconnector analog (A11).

The reference composes signaltometrics (span/log -> metric deltas with OTTL
value expressions) with the lsminterval aggregator
(connector/elasticapmconnector/connector.go:45-99); the metric definitions
live at config.go:235-545.  Re-expressed as one windowed groupBy per metric
family over a spans table:

- ``service_summary``: sum=1 per event / AdjustedCount per span
  (config.go:341-344: AdjustedCount = 1/sample_rate)
- ``transaction_duration``: summary (count/sum/min/max) + base-2
  exponential histogram of duration microseconds, count-weighted
  (config.go:341-344); the exp-histogram bucket index is computed with JVM
  log2 arithmetic — no UDF on the hot path — then assembled per group.
- ``event_success``: success -> bucket{1} weighted by AdjustedCount,
  failure -> bucket{0} (config.go:471-545); 'unknown' outcome excluded.
- ``span_destination``: response_time.{sum.us,count}, composite-aware
  (config.go:416-470: composite spans contribute composite_count /
  composite_sum_us instead of 1 / duration).

Spans with empty parent_span_id get ``transaction.root=true``
(connector.go:111-124).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .aggregate import trunc_to_interval

DEFAULT_SCALE = 4  # exp-histogram scale used for duration histograms


def adjusted_count(sample_rate: Column) -> Column:
    """Representative count from the sampling rate (traces.go:876,
    config.go:342): 1/sample_rate, 1 when missing/zero."""
    return F.when(
        sample_rate.isNotNull() & (sample_rate > 0), 1.0 / sample_rate
    ).otherwise(F.lit(1.0))


def enrich_spans(spans: DataFrame) -> DataFrame:
    """Pre-aggregation span enrichment (connector.go:101-128 + E1 cascades)."""
    dur_us = (F.unix_micros(F.col("end_ts")) - F.unix_micros(F.col("start_ts"))).cast("double")
    return (
        spans.withColumn("transaction_root", F.coalesce(F.col("parent_span_id") == "", F.lit(True)))
        .withColumn("duration_us", dur_us)
        .withColumn("adjusted_count", adjusted_count(F.col("sample_rate")))
        .withColumn("agent_name", F.coalesce(F.col("agent_name"), F.lit("unknown")))
        .withColumn("outcome", F.coalesce(F.col("outcome"), F.lit("unknown")))
    )


def service_summary(spans: DataFrame, interval: str = "1m") -> DataFrame:
    win = trunc_to_interval(F.col("start_ts"), interval)
    return spans.groupBy(
        win.alias("window_start"), "service", "environment", "agent_name"
    ).agg(F.round(F.sum("adjusted_count"), 6).alias("docs"))


def transaction_duration_summary(spans: DataFrame, interval: str = "1m") -> DataFrame:
    """The 1-bucket-histogram 'summary' form (config.go:345-415)."""
    tx = spans.filter(F.col("transaction_root"))
    win = trunc_to_interval(F.col("start_ts"), interval)
    return tx.groupBy(win.alias("window_start"), "service", "name").agg(
        F.round(F.sum("adjusted_count"), 6).alias("count"),
        F.round(F.sum(F.col("duration_us") * F.col("adjusted_count")), 4).alias("sum_us"),
        F.min("duration_us").alias("min_us"),
        F.max("duration_us").alias("max_us"),
    )


def exp_bucket_index(value: Column, scale: int = DEFAULT_SCALE) -> Column:
    """Base-2 exponential bucket: ceil(log2(v) * 2^scale) - 1 — pure JVM."""
    return (F.ceil(F.log2(value) * F.lit(float(2**scale))) - 1).cast("int")


def transaction_duration_exphist(spans: DataFrame, interval: str = "1m", scale: int = DEFAULT_SCALE) -> DataFrame:
    """Count-weighted exponential histogram of transaction duration:
    one row per (window, service, bucket) -> assembled into the dense
    (offset, counts) form per group.  Two cheap aggregations, no UDF."""
    tx = spans.filter(F.col("transaction_root") & (F.col("duration_us") > 0))
    win = trunc_to_interval(F.col("start_ts"), interval)
    per_bucket = tx.groupBy(
        win.alias("window_start"),
        F.col("service"),
        exp_bucket_index(F.col("duration_us"), scale).alias("bucket_idx"),
    ).agg(F.round(F.sum("adjusted_count"), 6).alias("bucket_count"))

    assembled = per_bucket.groupBy("window_start", "service").agg(
        F.lit(scale).alias("scale"),
        F.min("bucket_idx").alias("pos_offset"),
        F.max("bucket_idx").alias("_max_idx"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("bucket_idx", "bucket_count")))
        ).alias("_m"),
        F.round(F.sum("bucket_count"), 6).alias("count"),
    )
    dense = F.transform(
        F.sequence(F.col("pos_offset"), F.col("_max_idx")),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0.0)),
    )
    return assembled.select(
        "window_start", "service", "scale", "pos_offset",
        dense.alias("pos_counts"), "count",
    )


def event_success(spans: DataFrame, interval: str = "1m") -> DataFrame:
    """event.success_count: success=1-bucket, failure=0-bucket, weighted
    (config.go:471-545); unknown outcomes excluded from the metric."""
    win = trunc_to_interval(F.col("start_ts"), interval)
    known = spans.filter(F.col("outcome").isin("success", "failure") & F.col("transaction_root"))
    return known.groupBy(win.alias("window_start"), "service").agg(
        F.round(F.sum(F.when(F.col("outcome") == "success", F.col("adjusted_count")).otherwise(0.0)), 6).alias("success_count"),
        F.round(F.sum(F.when(F.col("outcome") == "failure", F.col("adjusted_count")).otherwise(0.0)), 6).alias("failure_count"),
        F.round(F.sum("adjusted_count"), 6).alias("total_count"),
    )


def span_destination(spans: DataFrame, interval: str = "1m") -> DataFrame:
    """span.destination.service.response_time.{sum.us,count} — composite
    spans contribute their composite count/sum (config.go:416-470)."""
    sp = spans.filter(~F.col("transaction_root") & F.col("destination").isNotNull())
    win = trunc_to_interval(F.col("start_ts"), interval)
    cnt = F.when(
        F.col("composite_count").isNotNull(), F.col("composite_count") * F.col("adjusted_count")
    ).otherwise(F.col("adjusted_count"))
    sum_us = F.when(
        F.col("composite_sum_us").isNotNull(), F.col("composite_sum_us") * F.col("adjusted_count")
    ).otherwise(F.col("duration_us") * F.col("adjusted_count"))
    return sp.groupBy(win.alias("window_start"), "service", "destination").agg(
        F.round(F.sum(cnt), 6).alias("count"),
        F.round(F.sum(sum_us), 4).alias("sum_us"),
    )


def infer_transaction_type(
    type_value: Column, is_messaging: Column, is_rpc: Column, is_http: Column
) -> Column:
    """transaction.type inference (span.go:476-487): explicit value wins,
    then messaging, then rpc/http -> "request", else "unknown"."""
    return (
        F.when(type_value.isNotNull() & (type_value != ""), type_value)
        .when(is_messaging, F.lit("messaging"))
        .when(is_rpc | is_http, F.lit("request"))
        .otherwise(F.lit("unknown"))
    )


def transaction_result(
    is_http: Column,
    http_status: Column,
    is_rpc: Column,
    grpc_status: Column,
    span_status: Column,
) -> Column:
    """transaction.result cascade (span.go:489-514): rpc grpc-status wins
    over the http bucket ("HTTP 2xx".."HTTP 5xx", verbatim code outside
    100-599); empty result falls back to span status Error/Success."""
    default = F.when(span_status == "Error", F.lit("Error")).otherwise(F.lit("Success"))
    bucket = (http_status / 100).cast("int")
    http_result = F.when(
        (bucket >= 1) & (bucket <= 5), F.concat(F.lit("HTTP "), bucket, F.lit("xx"))
    ).otherwise(F.concat(F.lit("HTTP "), http_status))
    return (
        F.when(is_rpc, F.coalesce(F.nullif(grpc_status, F.lit("")), default))
        .when(is_http & (http_status > 0), http_result)
        .otherwise(default)
    )


def span_event_outcome(
    span_status: Column, http_status: Column, existing_outcome: Column | None = None
) -> Column:
    """event.outcome from span status + http status (span.go:522-546):
    default success; explicit Error -> failure; http >= 500 -> failure.
    The reference's setEventOutcome early-returns when event.outcome was
    already explicitly set to 'unknown' by intake — pass the intake outcome
    column as ``existing_outcome`` to honor that guard."""
    cascade = (
        F.when(span_status == "Error", F.lit("failure"))
        .when(span_status == "Ok", F.lit("success"))
        .when(http_status >= 500, F.lit("failure"))
        .otherwise(F.lit("success"))
    )
    if existing_outcome is None:
        return cascade
    return F.when(existing_outcome == "unknown", F.lit("unknown")).otherwise(cascade)


def enrich_transaction_semantics(spans: DataFrame) -> DataFrame:
    """Applies the three inference cascades over the semconv columns."""
    is_msg = F.col("messaging_system").isNotNull()
    is_rpc = F.col("rpc_system").isNotNull()
    is_http = F.col("http_status_code").isNotNull()
    return (
        spans.withColumn(
            "transaction_type",
            infer_transaction_type(F.col("type_value"), is_msg, is_rpc, is_http),
        )
        .withColumn(
            "transaction_result",
            transaction_result(
                is_http, F.col("http_status_code"), is_rpc,
                F.col("grpc_status"), F.col("span_status"),
            ),
        )
        .withColumn(
            "span_outcome",
            span_event_outcome(
                F.col("span_status"),
                F.col("http_status_code"),
                F.col("outcome") if "outcome" in spans.columns else None,
            ),
        )
    )


def expand_dropped_span_stats(spans: DataFrame, dss_col: str = "dropped_spans_stats") -> DataFrame:
    """Expands transaction.dropped_spans_stats into synthetic child spans
    (ndjsondecoder/traces.go:538-581): each entry becomes one zero-duration
    span (start == end == parent start) carrying the entry's destination,
    outcome, and composite sum/count, inheriting the parent's sample rate
    so the span_destination metrics weight them by AdjustedCount.

    Returns ONLY the synthetic rows, shaped like the input spans (with a
    NULL dss column) — union with the originals for the full stream.
    Span ids are deterministic functions of (parent span id, entry index),
    mirroring the reference's xxhash(parentSpanID || index).
    """
    tx = spans.filter(F.col(dss_col).isNotNull() & (F.size(F.col(dss_col)) > 0))
    ex = tx.select(
        "trace_id", F.col("span_id").alias("_parent"), "start_ts",
        "sample_rate", "service", "environment", "sdk_language", "agent_name",
        F.posexplode(F.col(dss_col)).alias("_pos", "_stat"),
    )
    synth = ex.select(
        "trace_id",
        F.concat(F.col("_parent"), F.lit("-dss-"), F.col("_pos")).alias("span_id"),
        F.col("_parent").alias("parent_span_id"),
        F.lit("").alias("name"),
        F.lit("client").alias("kind"),
        F.col("start_ts"),
        F.col("start_ts").alias("end_ts"),
        F.col("_stat.outcome").alias("outcome"),
        "sample_rate",
        F.col("_stat.count").alias("composite_count"),
        F.col("_stat.sum_us").alias("composite_sum_us"),
        "service", "environment", "sdk_language", "agent_name",
        F.col("_stat.destination").alias("destination"),
    )
    extra = [c for c in spans.columns if c not in synth.columns]
    for c in extra:
        synth = synth.withColumn(c, F.lit(None).cast(spans.schema[c].dataType))
    return synth.select(*spans.columns)


def probability_to_tvalue(p: Column) -> Column:
    """Sampling probability (0,1] -> W3C tracestate T-value
    (ndjsondecoder/traces.go:908-931): 14-hex-digit threshold
    round((1-p) * 2^56) with trailing zeros trimmed; p == 1 -> "0";
    out-of-range -> ""."""
    max_threshold = (1 << 56) - 1
    raw = F.round((F.lit(1.0) - p) * F.lit(float(1 << 56))).cast("long")
    raw = F.greatest(F.lit(0).cast("long"), F.least(raw, F.lit(max_threshold).cast("long")))
    hexs = F.lpad(F.lower(F.conv(raw.cast("string"), 10, 16)), 14, "0")
    trimmed = F.regexp_replace(hexs, "0+$", "")
    return (
        F.when((p <= 0) | (p > 1), F.lit(""))
        .when(p == 1.0, F.lit("0"))
        .otherwise(F.when(trimmed == "", F.lit("0")).otherwise(trimmed))
    )


def tvalue_to_probability(t: Column) -> Column:
    """Inverse of ``probability_to_tvalue``: p = 1 - threshold / 2^56 with
    the T-value right-padded to 14 hex digits; ''/NULL -> NULL."""
    full = F.rpad(t, 14, "0")
    raw = F.conv(full, 16, 10).cast("double")
    return F.when(
        t.isNull() | (t == ""), F.lit(None).cast("double")
    ).otherwise(F.lit(1.0) - raw / F.lit(float(1 << 56)))
