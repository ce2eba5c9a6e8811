"""Tail-based trace sampling: whole-trace keep/drop decided AFTER the
trace is complete.

The upstream OTel collector's ``tailsamplingprocessor`` shape (policies
evaluated per complete trace; this Elastic components repo sits in the
same collector ecosystem and its rate limiter plays the analogous
admission role): head sampling throws spans away before the interesting
one arrives — tail sampling buffers the trace and keeps ALL of it when
any policy fires.  Three composed policies, the production trio:

- **error**: any span in the trace carries an error;
- **latency**: the trace's slowest span meets a duration threshold;
- **probabilistic**: a deterministic ``rate`` fraction of the remaining
  traces, hashed on trace id (``sampling.deterministic_uniform`` — the
  one md5-uniform recipe shared with corpus sampling), so the decision
  is stable across reruns/engines and needs no RNG state.

``sample_reason`` records the FIRST policy that fired (error > latency >
probabilistic) — the tailsampling convention, so downstream quota
accounting knows why each trace survived.

Scale shape: the decision needs every span of a trace — inherently one
shuffle on trace_id.  It is paid as a single window partitioned by the
trace (bounded at spans-per-trace rows per group, never corpus-wide);
the filter then runs in the same stage, so kept spans come out
partitioned by trace_id for free — exactly what a downstream
per-trace consumer (assembly, APM metrics) wants to reuse.  A batch
operator: the streaming analog buffers per-trace state with a
completeness timeout; here the batch boundary IS the completeness
signal (the lakehouse replay case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tail_sample_traces(
    df: DataFrame,
    trace_col: str = "trace_id",
    error_col: str | None = "is_error",
    duration_col: str | None = "duration_us",
    slow_threshold_us: int | None = 1_000_000,
    rate: float = 0.1,
    seed: int = 0,
) -> DataFrame:
    """Filter to spans of kept traces, adding ``sample_reason``
    ('error' | 'latency' | 'probabilistic', constant within a trace).

    Pass ``error_col=None`` to disable the error policy and EITHER of
    ``duration_col=None`` / ``slow_threshold_us=None`` to disable the
    latency policy (it needs both a column and a threshold to act);
    ``rate=0`` disables the probabilistic floor (then only flagged traces
    survive), ``rate=1`` keeps everything.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    latency_on = duration_col is not None and slow_threshold_us is not None
    if error_col is None and not latency_on and rate == 0.0:
        raise ValueError("all three policies are disabled — nothing can match")
    from .sampling import deterministic_uniform

    w = Window.partitionBy(trace_col)
    has_error = (
        (F.max(F.col(error_col).cast("int")).over(w) == 1)
        if error_col is not None
        else F.lit(False)
    )
    is_slow = (
        (F.max(F.col(duration_col)).over(w) >= F.lit(slow_threshold_us))
        if latency_on
        else F.lit(False)
    )
    lucky = deterministic_uniform(F.col(trace_col), seed) < F.lit(float(rate))
    reason = (
        F.when(has_error, F.lit("error"))
        .when(is_slow, F.lit("latency"))
        .when(lucky, F.lit("probabilistic"))
    )
    return (
        df.withColumn("sample_reason", reason)
        .where(F.col("sample_reason").isNotNull())
    )


def tail_sample_stats(
    df: DataFrame,
    trace_col: str = "trace_id",
    **kwargs,
) -> DataFrame:
    """Per-reason audit: (sample_reason, n_traces, n_spans) — the
    monitoring companion (is the probabilistic floor drowning in error
    traces? is the latency policy ever firing?)."""
    kept = tail_sample_traces(df, trace_col=trace_col, **kwargs)
    return kept.groupBy("sample_reason").agg(
        F.count_distinct(F.col(trace_col)).cast("long").alias("n_traces"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
    )


def head_sample_traces(
    spans: DataFrame,
    rate_ppm: int,
    trace_col: str = "trace_id",
    salt: str = "head",
) -> DataFrame:
    """Consistent-probability HEAD sampling — the probabilistic-sampler
    decision made at ingest, BEFORE outcomes are known (tail_sample_traces
    is the after-the-fact policy sibling): keep a trace iff
    md5_60(trace_id:salt) mod 1e6 < rate_ppm.

    The property that matters is CONSISTENCY: the verdict is a pure
    function of the trace id, so every span of a trace — arriving on any
    service, any partition, any day — gets the same verdict with no
    coordination and no state, and two pipelines sampling at p1 < p2
    keep NESTED trace sets (the smaller rate's traces are a subset of
    the larger's), the composition guarantee consistent-probability
    sampling exists to provide.  Adjusted count = 1e6/rate_ppm rides
    along for unbiased downstream rates (the representative-count
    convention of S2).

    Scan-side filter, no shuffle, no state; replays exactly in SQL via
    the repo-wide md5 contract."""
    from ..functions.textstats import md5_hash60

    if not 0 < rate_ppm <= 1_000_000:
        raise ValueError("rate_ppm must be in (0, 1e6]")
    bucket = F.pmod(
        md5_hash60(F.concat(F.col(trace_col), F.lit(f":{salt}"))),
        F.lit(1_000_000),
    )
    return spans.where(bucket < rate_ppm).withColumn(
        "representative_count", F.lit(1_000_000.0 / rate_ppm)
    )
