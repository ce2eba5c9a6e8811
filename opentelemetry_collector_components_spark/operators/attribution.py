"""Multi-touch conversion attribution: first / last / linear credit.

The marketing-analytics closer of the funnel family: for every
conversion event, find the touch events on the same unit inside a
lookback window and split credit across their channels under the three
standard models — first-touch (the opener), last-touch (the closer),
linear (equal split).  Conversions with no touch in the window credit a
synthetic ``(direct)`` channel rather than vanishing, so every model's
column sums to the conversion total — the reconciliation property
dashboards check first.

Linear credit is EXACT-INTEGER micro-units: each touch gets
``1e6 div n`` and the LAST touch absorbs the remainder
(``1e6 mod n``), so per-conversion credits sum to exactly 1e6 and the
channel rollup is engine-exact — no float split drift.

Scale shape: one equi-join on the unit key with the window predicate
(cost bounded by touches-per-unit-in-window; a pathological unit is the
usual per-key hot-spot — pre-filter bot units with
``botdetect.score_bots``); first/last per conversion are
``min/max(struct(ts, id, channel))`` INSIDE the aggregate (no window,
no per-unit sort); the channel rollup is a partial-aggregated groupBy
of per-conversion rows.  Direct conversions come from one anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000
DIRECT = "(direct)"


def attribute_conversions(
    df: DataFrame,
    unit_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    conversion_type: str,
    touch_types: list[str],
    lookback_s: int,
) -> DataFrame:
    """Per-channel attribution rollup: (channel, first_touch,
    last_touch, linear_micro).

    A touch attributes to a conversion when it is on the same unit,
    STRICTLY before the conversion (ties on the timestamp are not
    touches — an event doesn't convert itself), and at most
    ``lookback_s`` seconds earlier (window start inclusive).
    ``first_touch``/``last_touch`` count conversions opened/closed by
    the channel; ``linear_micro`` sums exact per-conversion micro-unit
    splits.  Every column sums to ``conversions * (1 or 1e6)`` across
    channels including ``(direct)``.
    """
    if lookback_s < 1:
        raise ValueError("lookback_s must be >= 1")
    if conversion_type in touch_types:
        raise ValueError("conversion_type cannot also be a touch type")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    # at-least-once delivered logs duplicate rows; exact row duplicates
    # would double-count n and add the linear remainder twice (breaking
    # the sums-to-1e6 reconciliation), so both sides dedupe up front.
    # Within a (unit, ts, id, channel)-distinct frame the last-touch
    # struct is unique, so the remainder matches exactly one row below.
    conv = df.where(F.col(type_col) == conversion_type).select(
        F.col(unit_col).alias("unit"),
        F.col(ts_col).alias("conv_ts"),
        F.col(id_col).alias("conv_id"),
    ).distinct()
    touch = df.where(F.col(type_col).isin(touch_types)).select(
        F.col(unit_col).alias("unit"),
        F.col(ts_col).alias("touch_ts"),
        F.col(id_col).alias("touch_id"),
        F.col(type_col).alias("channel"),
    ).distinct()
    joined = conv.join(touch, "unit").where(
        (F.col("touch_ts") < F.col("conv_ts"))
        & (
            F.col("touch_ts")
            >= F.expr(f"conv_ts - INTERVAL {int(lookback_s)} SECONDS")
        )
    )
    conv_keys = ["unit", "conv_ts", "conv_id"]
    per = joined.groupBy(*conv_keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct("touch_ts", "touch_id", "channel")).alias("first"),
        F.max(F.struct("touch_ts", "touch_id", "channel")).alias("last"),
    )
    first_counts = per.groupBy(
        F.col("first.channel").alias("channel")
    ).agg(F.count(F.lit(1)).alias("first_touch"))
    last_counts = per.groupBy(F.col("last.channel").alias("channel")).agg(
        F.count(F.lit(1)).alias("last_touch")
    )
    linear = (
        joined.join(
            per.select(*conv_keys, "n", F.col("last").alias("last_t")),
            conv_keys,
        )
        .select(
            "channel",
            (
                F.expr("1000000 div n")
                + F.when(
                    (F.col("touch_ts") == F.col("last_t.touch_ts"))
                    & (F.col("touch_id") == F.col("last_t.touch_id"))
                    & (F.col("channel") == F.col("last_t.channel")),
                    F.expr("1000000 % n"),
                ).otherwise(F.lit(0))
            ).alias("credit"),
        )
        .groupBy("channel")
        .agg(F.sum("credit").alias("linear_micro"))
    )
    direct = (
        conv.join(per.select(*conv_keys), conv_keys, "left_anti")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.lit(DIRECT).alias("channel"),
            F.col("c").alias("first_touch"),
            F.col("c").alias("last_touch"),
            (F.col("c") * F.lit(MICRO)).alias("linear_micro"),
        )
        .where(F.col("first_touch") > 0)
    )
    zero = F.lit(0).cast("long")
    out = (
        first_counts.join(last_counts, "channel", "full_outer")
        .join(linear, "channel", "full_outer")
        .select(
            "channel",
            F.coalesce("first_touch", zero).alias("first_touch"),
            F.coalesce("last_touch", zero).alias("last_touch"),
            F.coalesce("linear_micro", zero).alias("linear_micro"),
        )
    )
    return out.unionByName(direct)
