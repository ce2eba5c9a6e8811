"""Alert-rule evaluation over windowed aggregates: threshold + for-duration
state machine, and multi-window SLO burn rate.

The reference pipeline ends at aggregated interval metrics (lsminterval
output, `processor/lsmintervalprocessor`); the first thing a production
deployment does with those metrics is evaluate alert rules against them.
This module re-expresses the two canonical rule shapes as pure DataFrame
plans over a (key, window_index, value) table:

- ``alert_for_duration``: Prometheus-style ``expr > threshold FOR n``
  semantics — a rule is *pending* while the condition holds for fewer than
  ``for_windows`` consecutive evaluation windows and *firing* once the
  streak reaches ``for_windows``; one missing or non-breaching window
  resets the streak.  States and fire/resolve transitions come out as
  columns, exactly the Alertmanager event feed.
- ``slo_burn_rate``: Google-SRE multiwindow multi-burn-rate alerting —
  the error-budget burn rate over a short and a long trailing window must
  BOTH exceed a factor before paging (fast burn caught by the short
  window, the long window suppresses flapping).

Scale shape: both are window functions partitioned by the rule key and
ordered by the window index — one shuffle on the key, frames bounded by
``for_windows`` / ``long_windows`` rows, no self-joins, no driver
collection.  At 10^12 rows the input here is already the *aggregated*
metric table (keys × windows), orders of magnitude smaller than the raw
stream; the plan stays a single WindowExec per rule family.

All arithmetic is integer or single-chain fixed-point (micro-units,
``FLOOR(1e6 * x)``) so batch, streaming-foreachBatch, and the DuckDB
oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_OPS = {">=", ">", "<=", "<"}


def _breach(value: Column, threshold: float, op: str) -> Column:
    if op == ">=":
        return value >= F.lit(threshold)
    if op == ">":
        return value > F.lit(threshold)
    if op == "<=":
        return value <= F.lit(threshold)
    return value < F.lit(threshold)


def alert_for_duration(
    df: DataFrame,
    key_cols: list[str],
    window_col: str,
    value_col: str,
    threshold: float,
    for_windows: int,
    step: int = 1,
    op: str = ">=",
) -> DataFrame:
    """Evaluate ``value <op> threshold FOR for_windows`` per key.

    ``window_col`` is an integer evaluation-window index with nominal
    spacing ``step``; a gap (missing window) breaks a breach streak, the
    Prometheus behavior when a series disappears.  Adds:

    - ``breach``     — did this window meet the condition;
    - ``streak``     — consecutive breaching windows ending here (0 when ok);
    - ``state``      — 'ok' | 'pending' | 'firing';
    - ``transition`` — 'fires' on the ok/pending→firing edge, 'resolves'
      on the firing→ok edge, NULL elsewhere.
    """
    if op not in _OPS:
        raise ValueError(f"op must be one of {sorted(_OPS)}")
    if for_windows < 1:
        raise ValueError("for_windows must be >= 1")
    if step < 1:
        raise ValueError("step must be >= 1")

    w = Window.partitionBy(*key_cols).orderBy(window_col)
    breach = _breach(F.col(value_col), threshold, op)
    contiguous = (F.col(window_col) - F.lag(window_col).over(w)) == F.lit(step)
    # island detection: a new streak starts on any non-breach, any gap, or
    # the first row of the key; cumulative island ids then give the streak
    # position via a second rank inside the island.
    starts = F.when(
        breach & F.coalesce(F.lag(breach.cast("int")).over(w) == 1, F.lit(False)) & contiguous,
        F.lit(0),
    ).otherwise(F.lit(1))
    island = F.sum(starts).over(w.rowsBetween(Window.unboundedPreceding, 0))
    wi = Window.partitionBy(*key_cols, "_island").orderBy(window_col)
    out = (
        df.withColumn("breach", breach)
        .withColumn("_island", island)
        .withColumn(
            "streak",
            F.when(F.col("breach"), F.row_number().over(wi)).otherwise(F.lit(0)).cast("long"),
        )
        .drop("_island")
    )
    state = (
        F.when(F.col("streak") >= for_windows, F.lit("firing"))
        .when(F.col("streak") > 0, F.lit("pending"))
        .otherwise(F.lit("ok"))
    )
    out = out.withColumn("state", state)
    prev = F.lag("state").over(w)
    transition = (
        F.when((F.col("state") == "firing") & (F.coalesce(prev, F.lit("ok")) != "firing"), F.lit("fires"))
        .when((F.col("state") != "firing") & (prev == "firing"), F.lit("resolves"))
    )
    return out.withColumn("transition", transition)


def slo_burn_rate(
    df: DataFrame,
    key_cols: list[str],
    window_col: str,
    bad_col: str,
    total_col: str,
    slo_target: float = 0.999,
    short_windows: int = 1,
    long_windows: int = 12,
    burn_factor: float = 14.4,
) -> DataFrame:
    """Multi-window error-budget burn rate per (key, window).

    ``bad_col`` / ``total_col`` are integer counts per base evaluation
    window.  Burn rate over a trailing frame of ``n`` windows is
    ``(Σbad / Σtotal) / (1 - slo_target)`` — 1.0 means the error budget
    is consumed exactly at the rate that exhausts it at period end.
    Emitted in integer micro-units (``*_burn_micro = FLOOR(1e6 * rate)``)
    plus the human-readable 6-dp double; ``page`` is true when BOTH the
    short and the long trailing burn exceed ``burn_factor``.

    Trailing frames use ``rowsBetween`` — the metric table is the output
    of interval aggregation, which emits every window a key was live in;
    a key with genuinely missing windows under-counts its denominator
    conservatively (burn reads higher, the safe failure direction).
    """
    if not 0.0 < slo_target < 1.0:
        raise ValueError("slo_target must be in (0, 1)")
    if short_windows < 1 or long_windows < short_windows:
        raise ValueError("need 1 <= short_windows <= long_windows")
    budget = 1.0 - slo_target

    w = Window.partitionBy(*key_cols).orderBy(window_col)

    def burn_micro(n: int) -> Column:
        frame = w.rowsBetween(-(n - 1), 0)
        bad = F.sum(bad_col).over(frame).cast("long")
        tot = F.sum(total_col).over(frame).cast("long")
        # single-chain double arithmetic: (bad / tot) / budget, floored to
        # micro-units — identical op order in the DuckDB oracle.
        rate = bad.cast("double") / tot.cast("double") / F.lit(budget)
        return F.when(tot > 0, F.floor(rate * F.lit(1_000_000.0)).cast("long"))

    out = (
        df.withColumn("short_burn_micro", burn_micro(short_windows))
        .withColumn("long_burn_micro", burn_micro(long_windows))
    )
    factor_micro = int(round(burn_factor * 1_000_000))
    return (
        out.withColumn(
            "short_burn", F.round(F.col("short_burn_micro") / 1_000_000.0, 6)
        )
        .withColumn("long_burn", F.round(F.col("long_burn_micro") / 1_000_000.0, 6))
        .withColumn(
            # zero-total frames leave the burn NULL; a window with no
            # traffic must not page (and must not poison downstream
            # boolean filters with NULL) — same COALESCE as the oracle
            "page",
            F.coalesce(F.col("short_burn_micro") >= factor_micro, F.lit(False))
            & F.coalesce(F.col("long_burn_micro") >= factor_micro, F.lit(False)),
        )
    )
