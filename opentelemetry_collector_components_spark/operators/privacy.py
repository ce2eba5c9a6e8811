"""Privacy / governance operators: k-anonymity, l-diversity, DP counts.

The release side of a web-scale pipeline: aggregate tables and training
corpora leave the trust boundary (dashboards, published stats, shared
datasets), and "we scrubbed PII regexes" (`operators/dedup.py::pii_scrub`
upstream) is not a release policy — small groups re-identify people even
with identifiers removed.  Three standard, composable gates:

- ``k_anonymize`` (Sweeney 2002): drop rows whose quasi-identifier
  combination matches fewer than k records — one aggregate over the QI
  key plus a semi-join back; ``generalize_num`` coarsens numeric QIs
  first so fewer groups fall below k (suppress less by generalizing
  more).
- ``l_diverse_groups`` (Machanavajjhala 2007): k-anonymity is not enough
  when a group's SENSITIVE value is constant; require >= l distinct
  sensitive values per released group.
- ``dp_counts`` (Dwork 2006): Laplace(sensitivity/epsilon) noise on
  released counts.  The noise is the inverse-CDF transform of a uniform
  derived from the repo's cross-engine md5 hash of the group key — so a
  release is DETERMINISTIC for a given (data, epsilon, seed) and replays
  bit-identically in SQL, while still being a correctly-distributed
  Laplace draw across groups.  (Determinism trades the fresh-randomness
  guarantee for auditability — regenerating the same release must not
  consume extra privacy budget; vary ``seed`` per release and account
  budget per seed.)

Scale shape: every operator is one partial-aggregated groupBy over the
QI/group key (+ a broadcast-or-shuffle semi-join back for row-level
suppression).  No windows, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO60F = float(1 << 60)


def generalize_num(col: Column, width: int) -> Column:
    """Numeric QI -> '[lo,hi)' bucket label (coarsening lever)."""
    if width < 1:
        raise ValueError("width must be >= 1")
    lo = F.floor(col / width).cast("long") * width
    return F.concat(
        F.lit("["), lo.cast("string"), F.lit(","),
        (lo + width).cast("string"), F.lit(")"),
    )


def k_anonymous_groups(df: DataFrame, qi_cols: list[str], k: int) -> DataFrame:
    """QI combinations appearing >= k times: ``(qi..., n BIGINT)``."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= k)
    )


def k_anonymize(df: DataFrame, qi_cols: list[str], k: int) -> DataFrame:
    """Suppress rows in QI groups smaller than k (left-semi join against
    the surviving groups; all original columns kept)."""
    keep = k_anonymous_groups(df, qi_cols, k).select(*qi_cols)
    return df.join(keep, qi_cols, "left_semi")


def l_diverse_groups(
    df: DataFrame, qi_cols: list[str], sensitive_col: str, l: int
) -> DataFrame:
    """QI combinations whose sensitive attribute takes >= l distinct
    values: ``(qi..., n BIGINT, sensitive_distinct BIGINT)``.  Compose
    with ``k_anonymize`` — k bounds group size, l bounds attribute
    disclosure within the group."""
    if l < 2:
        raise ValueError("l must be >= 2")
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(sensitive_col).alias("sensitive_distinct"),
        )
        .where(F.col("sensitive_distinct") >= l)
    )


def laplace_noise(key: Column, scale_b: float, seed: int = 7) -> Column:
    """Deterministic Laplace(0, b) draw per key: u = (md5_60(key)+0.5)/2^60
    in (0,1), noise = -b * sign(u-1/2) * ln(1 - 2|u-1/2|)."""
    from ..functions.textstats import md5_hash60

    h = md5_hash60(F.concat(key.cast("string"), F.lit(f":dp{seed}")))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_TWO60F)
    t = u - F.lit(0.5)
    return (
        F.lit(-float(scale_b))
        * F.signum(t)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(t))
    )


def dp_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float,
    seed: int = 7,
    sensitivity: int = 1,
) -> DataFrame:
    """ε-DP noisy counts per group: ``(group..., dp_n DOUBLE)`` with
    Laplace(sensitivity/ε) noise, rounded to 4 dp and clamped at 0
    (post-processing preserves DP).  The exact count is intentionally
    NOT in the output — releasing it beside the noisy one would defeat
    the mechanism."""
    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    b = sensitivity / epsilon
    key = F.concat_ws("\x01", *[F.col(c).cast("string") for c in group_cols])
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            *group_cols,
            F.greatest(
                F.lit(0.0),
                F.round(F.col("_n") + laplace_noise(key, b, seed), 4),
            ).alias("dp_n"),
        )
    )
