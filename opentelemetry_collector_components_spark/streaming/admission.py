"""Flow control — ratelimitprocessor analog (L1), Spark-native form.

The reference throttles per client-metadata key with token buckets and
either rejects or delays (processor/ratelimitprocessor/local.go:68-179).
Batch Spark has no admission control to express — scheduling IS the
backpressure (SURVEY.md L1: documented non-goal).  What Spark *does* expose
is source-side rate limiting for streaming jobs, which serves the same
operational purpose (bounding per-trigger work so downstream state and
sinks keep up):

- file sources: ``maxFilesPerTrigger`` / ``maxBytesPerTrigger``
- kafka: ``maxOffsetsPerTrigger``
- rate source: ``rowsPerSecond``

``reader_with_admission`` centralizes those knobs; ``per_key_quota`` gives
the per-key "requests" strategy (config.go:97-130) as a per-batch
deterministic quota: rank within key, keep <= quota, tag the rest —
throttle behavior 'error' (drop to a rejected frame) vs 'tag'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def reader_with_admission(
    spark,
    fmt: str,
    path: str | None = None,
    schema=None,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: str | None = None,
    rows_per_second: int | None = None,
):
    """Streaming reader with source-side rate limits applied."""
    r = spark.readStream.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    if max_bytes_per_trigger is not None:
        r = r.option("maxBytesPerTrigger", max_bytes_per_trigger)
    if rows_per_second is not None:
        r = r.option("rowsPerSecond", rows_per_second)
    return r.load(path) if path else r.load()


def per_key_quota(
    df: DataFrame,
    key_cols: list[str],
    quota: int,
    order_col: str,
    behavior: str = "tag",
) -> DataFrame:
    """Deterministic per-key admission: first ``quota`` rows per key (by
    ``order_col``) admitted; the rest tagged ``throttled`` or dropped
    ('error' behavior == reject, local.go:133-179)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col))
    out = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "throttled", F.col("_rn") > quota
    ).drop("_rn")
    if behavior == "error":
        return out.filter(~F.col("throttled")).drop("throttled")
    return out


def _us_expr(ts_col: str):
    # NTZ-safe: session TZ is pinned UTC, so the cast is stable
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def _prepare_bucket_input(df: DataFrame, key_cols: list[str], ts_col: str, order_col: str | None):
    """Shared token-bucket preparation (one home for the ordering/refill
    clock contract of BOTH throttle strategies): string keys, microsecond
    event clock `_ts_us`, and the explicit scan order `_seq`.  With no
    explicit order_col the scan orders by the MICROSECOND value (the same
    clock the refill uses) — a bare cast of the timestamp to long truncates
    to whole seconds and makes sub-second events tie, i.e. nondeterministic
    admission.  Returns (prepared_df, resolved_order_col)."""
    order_col = order_col or ts_col
    if order_col in key_cols:
        # the prepared frame rebinds order_col to the cast sequence value;
        # letting it shadow a groupBy key would silently corrupt the key
        raise ValueError(
            f"order_col {order_col!r} is also a key column — use a distinct "
            "ordering column"
        )
    us_expr = _us_expr(ts_col)
    seq_expr = us_expr if order_col == ts_col else F.col(order_col).cast("long")
    prepared = df.select(
        *[F.col(c).cast("string").alias(c) for c in key_cols],
        us_expr.alias("_ts_us"),
        seq_expr.alias("_seq"),
    ).withColumn(order_col, F.col("_seq"))
    return prepared, order_col


def token_bucket_delay(
    df: DataFrame,
    key_cols: list[str],
    rate: float,
    burst: float,
    ts_col: str = "ts",
    order_col: str | None = None,
) -> DataFrame:
    """Event-time analog of the reference's ``delay`` throttle strategy
    (local.go:133-179: ``ReserveN`` + sleep until the reservation matures,
    golang ``rate.Limiter`` reservation semantics).

    Instead of rejecting when the bucket is empty, every request RESERVES
    one token — the balance may go negative — and is virtually delayed by
    the time the bucket needs to refill back to zero:

        tokens  = min(burst, tokens + Δt_event * rate) - 1
        delay   = max(0, -tokens) / rate
        admit_t = event_t + delay

    Wall-clock sleeping is meaningless in a batch/replay engine, so the
    delay is emitted as DATA (``delay_us`` + ``admitted_us``): a streaming
    deployment keys emission off ``admitted_us`` (e.g. a watermark hold),
    a batch replay gets the exact schedule the reference's sleeps would
    have produced on the same event times.  The reference chunks big
    ReserveN calls (local.go:150-166) to bound a single reservation; with
    per-event n=1 every reservation is one chunk, so the schedules agree.

    Same distribution shape as ``token_bucket_admit``: sequential per key
    (reservations feed back into the balance), keys parallelize via
    ``applyInPandas``; a pathological hot key serializes on one task —
    mitigate with ``token_bucket_admit(key_shards=k)``-style splitting
    (rate/k per sub-key) if the delay schedule tolerates approximation."""
    import pandas as pd

    prepared, order_col = _prepare_bucket_input(df, key_cols, ts_col, order_col)
    out_schema = ", ".join(
        [f"`{c}` string" for c in key_cols]
        + ["event_seq long", "tokens_after double",
           "delay_us double", "admitted_us long"]
    )

    def _scan(key_vals, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([order_col]).reset_index(drop=True)
        us = pdf["_ts_us"].to_numpy()
        seq = pdf["_seq"].to_numpy()
        n = len(pdf)
        after = [0.0] * n
        delay = [0.0] * n
        tokens = float(burst)
        prev_us = None
        for i in range(n):
            if prev_us is not None:
                dt = max(us[i] - prev_us, 0)  # monotonic clock, as in admit
                tokens = min(float(burst), tokens + dt * rate / 1000000.0)
            prev_us = us[i]
            tokens -= 1.0  # ReserveN(1): may go negative
            after[i] = tokens
            delay[i] = max(0.0, -tokens) * 1000000.0 / rate
        import numpy as np

        res = pd.DataFrame(
            {
                "event_seq": seq,
                "tokens_after": after,
                "delay_us": delay,
                # floor-to-microsecond of the DOUBLE sum (not integer math):
                # at ~2^50 us the double ulp is 0.25, and any SQL oracle
                # restating this adds us+delay as a double too — computing
                # the identical rounding is what makes the schedule
                # engine-portable (ROUND here is NOT: round(x*100)/100
                # overflows the mantissa at epoch-microsecond magnitude)
                "admitted_us": [
                    int(np.floor(float(u) + d)) for u, d in zip(us, delay)
                ],
            }
        )
        for c, v in zip(key_cols, key_vals):
            res[c] = v
        return res[key_cols + ["event_seq", "tokens_after", "delay_us", "admitted_us"]]

    return prepared.groupBy(*key_cols).applyInPandas(_scan, schema=out_schema)


def token_bucket_admit(
    df: DataFrame,
    key_cols: list[str],
    rate: float,
    burst: float,
    ts_col: str = "ts",
    order_col: str | None = None,
    behavior: str = "tag",
    key_shards: int = 1,
) -> DataFrame:
    """Event-time token bucket per key — the deterministic analog of the
    reference's wall-clock ``rate.Limiter`` strategy (local.go:33-76,
    config.go:54-58: Rate = tokens/sec refill, Burst = bucket capacity).

    Wall-clock admission is nondeterministic by construction (it depends on
    arrival instants); replaying the SAME decisions distributed requires an
    event-time clock instead, so refill here derives from the EVENT
    timestamps: tokens(e) = min(burst, tokens_prev + Δt_event * rate); a hit
    consumes 1 token when available, else is throttled WITHOUT consuming
    (golang rate.Limiter AllowN semantics).  Emits tokens_before /
    tokens_after like the reference's RateLimitResult (local.go:80-115).

    The scan is inherently sequential per key (admission feeds back into
    state), so it runs as a per-key ``applyInPandas`` — keys parallelize
    across the cluster; the per-key loop is bounded by the hottest key, the
    same hot spot the reference's per-key mutex serializes.

    ``key_shards > 1`` is the hot-key mitigation: the key splits into k
    deterministic sub-streams (by event sequence), each enforcing
    rate/k + burst/k, so a single pathological key spreads across k tasks
    instead of serializing on one.  The composite limiter is approximate —
    aggregate admitted throughput stays <= rate, but an individual event's
    verdict depends on its shard's sub-stream rather than the exact global
    order (the same trade distributed rate limiters make; the reference
    serializes instead and wears the hot spot, local.go:68-76)."""
    import pandas as pd

    if key_shards < 1:
        raise ValueError("key_shards must be >= 1")
    if key_shards > 1 and burst / key_shards < 1.0:
        # a shard whose bucket can never hold one whole token admits
        # nothing, ever — fail loudly instead of silently starving
        raise ValueError(
            f"burst ({burst}) must be >= key_shards ({key_shards}) so every "
            "shard's bucket can hold at least one token"
        )
    prepared, order_col = _prepare_bucket_input(df, key_cols, ts_col, order_col)
    group_cols = list(key_cols)
    rate_eff, burst_eff = rate, burst
    if key_shards > 1:
        # hash the sequence, don't mod it directly: _seq defaults to the
        # epoch-microsecond timestamp, and regularly spaced events (every
        # 1ms/1s/...) would all alias into ONE shard under pmod, collapsing
        # throughput to rate/k with no spreading at all
        prepared = prepared.withColumn(
            "_shard", F.pmod(F.xxhash64(F.col("_seq")), F.lit(key_shards))
        )
        group_cols.append("_shard")
        rate_eff, burst_eff = rate / key_shards, burst / key_shards
    out_schema = ", ".join(
        [f"`{c}` string" for c in key_cols]
        + ["event_seq long", "admitted boolean",
           "tokens_before double", "tokens_after double"]
    )

    def _scan(key_vals, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([order_col]).reset_index(drop=True)
        us = pdf["_ts_us"].to_numpy()
        seq = pdf["_seq"].to_numpy()
        n = len(pdf)
        admitted = [False] * n
        before = [0.0] * n
        after = [0.0] * n
        tokens = float(burst_eff)
        prev_us = None
        for i in range(n):
            if prev_us is not None:
                # clamp: with an explicit arrival order_col, event time can
                # run backward (late data); the golang rate.Limiter clock
                # is monotonic, so a negative delta refills nothing rather
                # than charging phantom debt
                dt = max(us[i] - prev_us, 0)
                tokens = min(float(burst_eff), tokens + dt * rate_eff / 1000000.0)
            prev_us = us[i]
            before[i] = tokens
            if tokens >= 1.0:
                tokens -= 1.0
                admitted[i] = True
            after[i] = tokens
        res = pd.DataFrame(
            {"event_seq": seq, "admitted": admitted,
             "tokens_before": before, "tokens_after": after}
        )
        for c, v in zip(key_cols, key_vals):
            res[c] = v
        return res[key_cols + ["event_seq", "admitted", "tokens_before", "tokens_after"]]

    out = prepared.groupBy(*group_cols).applyInPandas(_scan, schema=out_schema)
    if behavior == "error":
        return out.filter(F.col("admitted"))
    return out


def token_bucket_stateful(
    stream: DataFrame,
    key_cols: list[str],
    rate: float,
    burst: float,
    ts_col: str = "ts",
    order_col: str | None = None,
) -> DataFrame:
    """STREAMING form of ``token_bucket_admit``: the per-key bucket
    (tokens, last event micros) lives in the state store across
    micro-batches (RocksDB provider in production) — the actual
    ratelimitprocessor deployment shape (local.go:33-115 holds the same
    per-key bucket in a mutex-guarded map for the process lifetime).

    Semantics are identical to the batch operator fold: refill
    min(burst, tokens + Δt*rate) on the monotonic event clock
    (negative deltas refill nothing), consume 1 when available, no
    consumption on throttle.  With micro-batches arriving in event order
    the admitted set equals the batch scan exactly (test-pinned).  A row
    arriving LATE — in a later batch than its event time — is processed
    at its arrival position with a clamped (zero) refill, whereas the
    batch scan would sort it into true event order; that divergence is
    inherent to any online limiter and matches the reference, which also
    admits on arrival.  Emits one row per event (update mode): keys,
    event_seq, admitted, tokens_after.  A single hot key serializes on one
    state partition (same property as the reference's per-key mutex); the
    mitigation is k-way key sharding with rate/k per shard — see
    ``token_bucket_admit(key_shards=...)`` for the batch form."""
    from collections.abc import Iterable, Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    prepared, order_col = _prepare_bucket_input(stream, key_cols, ts_col, order_col)
    out_schema = StructType(
        [StructField(c, StringType()) for c in key_cols]
        + [
            StructField("event_seq", LongType()),
            StructField("admitted", BooleanType()),
            StructField("tokens_after", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("tokens", DoubleType()), StructField("last_us", LongType())]
    )

    def _fold(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            tokens, last_us = state.get
            last_us = None if last_us < 0 else int(last_us)
        else:
            tokens, last_us = float(burst), None
        seqs, admits, afters = [], [], []
        # a key's micro-batch rows may span several Arrow chunks in
        # arbitrary order — the fold needs the WHOLE group sorted once,
        # not each chunk sorted independently
        whole = pd.concat(list(pdfs), ignore_index=True)
        if len(whole):
            whole = whole.sort_values(order_col)
            for us, seq in zip(whole["_ts_us"], whole["_seq"]):
                us = int(us)
                if last_us is not None:
                    dt = max(us - last_us, 0)
                    tokens = min(float(burst), tokens + dt * rate / 1000000.0)
                last_us = us
                ok = tokens >= 1.0
                if ok:
                    tokens -= 1.0
                seqs.append(int(seq))
                admits.append(ok)
                afters.append(tokens)
        state.update((float(tokens), int(last_us) if last_us is not None else -1))
        res = pd.DataFrame(
            {"event_seq": seqs, "admitted": admits, "tokens_after": afters}
        )
        for c, v in zip(key_cols, key):
            res[c] = v
        yield res[key_cols + ["event_seq", "admitted", "tokens_after"]]

    return prepared.groupBy(*key_cols).applyInPandasWithState(
        _fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
