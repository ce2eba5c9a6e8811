"""Time-decayed activity scores: what is trending NOW.

The "hot paths / rising queries / surging domains" panel every log
pipeline grows: a plain count-over-window forgets nothing inside the
window and everything outside it; an exponentially-decayed count weights
each event by ``0.5^(age/half_life)`` so the ranking shifts smoothly and
one parameter sets the memory horizon.  Standard form of the frecency /
exponentially-decayed-counter family (half-life parameterization as in
Redis LFU and stream-frequency literature).

Scale shape: the score is a plain ``groupBy(key).sum(weight)`` — the
weight is computed per row scan-side, partially aggregated map-side, one
shuffle of |keys| rows.  Decayed counters also MERGE across time
partitions: a per-day pre-aggregated ``(key, day_score, day_anchor)``
table re-anchors to any later "now" by multiplying
``0.5^((now-anchor)/half_life)`` — ``merge_decayed`` below — so daily
rollups answer trending queries without rescanning raw events (same
materialize-then-merge shape as operators/sketches.py).

Scores are rounded to 4 dp on emission (repo oracle convention for
double aggregates); ranking uses the unrounded sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .partition import two_phase_top_n


def decay_weight(ts: Column, now_epoch_s: int, half_life_s: int) -> Column:
    """Per-event weight ``0.5^(age/half_life)``; future events (clock
    skew) clamp to weight 1."""
    age = F.greatest(
        F.lit(0).cast("long"),
        F.lit(int(now_epoch_s)) - F.floor(F.unix_timestamp(ts)).cast("long"),
    )
    return F.pow(F.lit(0.5), age.cast("double") / F.lit(float(half_life_s)))


def decayed_scores(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    now_epoch_s: int,
    half_life_s: int,
) -> DataFrame:
    """One decayed-count row per key: ``(key..., score DOUBLE, n BIGINT)``
    with ``score`` rounded to 4 dp.  One partial-aggregated shuffle."""
    if half_life_s < 1:
        raise ValueError("half_life_s must be >= 1")
    w = decay_weight(F.col(ts_col), now_epoch_s, half_life_s)
    return df.groupBy(*key_cols).agg(
        F.round(F.sum(w), 4).alias("score"),
        F.count(F.lit(1)).alias("n"),
    )


def merge_decayed(
    parts: DataFrame,
    key_cols: list[str],
    now_epoch_s: int,
    half_life_s: int,
    score_col: str = "score",
    anchor_col: str = "anchor_s",
) -> DataFrame:
    """Merge pre-aggregated decayed partials (each scored at its own
    ``anchor_col`` epoch) into one score re-anchored at ``now_epoch_s``:
    exponential decay is the unique memoryless weighting, so
    ``score@now = score@anchor * 0.5^((now-anchor)/half_life)`` — one
    groupBy over partial rows, raw events never rescanned."""
    factor = F.pow(
        F.lit(0.5),
        (F.lit(int(now_epoch_s)) - F.col(anchor_col)).cast("double")
        / F.lit(float(half_life_s)),
    )
    return parts.groupBy(*key_cols).agg(
        F.round(F.sum(F.col(score_col) * factor), 4).alias("score")
    )


def trending_topk(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    now_epoch_s: int,
    half_life_s: int,
    k: int = 10,
) -> DataFrame:
    """Top-k keys by decayed score, skew-proof (two-phase top-N over the
    already-aggregated |keys| rows; ties broken by key)."""
    scores = decayed_scores(df, key_cols, ts_col, now_epoch_s, half_life_s)
    return two_phase_top_n(
        scores,
        [],
        [F.desc("score"), *key_cols],
        k,
        rank_col="rank",
    )
