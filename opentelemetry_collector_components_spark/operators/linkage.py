"""Probabilistic record linkage: Fellegi–Sunter scoring over candidate
pairs.

The entity-resolution step AFTER blocking: the repo already generates
candidate pairs cheaply (sorted-neighborhood `operators/dedup.py::
sorted_neighborhood_pairs`, MinHash-LSH banding, plain blocking-key
equi-joins); this module decides which candidates are the SAME entity.
Fellegi & Sunter (JASA 1969) score each pair by summing per-field
log-likelihood weights: agreement on field i contributes
``log2(m_i/u_i)`` (m = P(agree | match), u = P(agree | non-match)),
disagreement ``log2((1−m_i)/(1−u_i))``; two thresholds split
match / possible (clerical review) / non-match.

Engineering choices for the 100 TB shape and the oracle contract:

- weights are computed ONCE in Python and inlined as literals, and the
  score is a fixed-order sum of those literals — bit-identical across
  engines, no runtime log() in the plan;
- comparisons are plain column expressions (exact / normalized /
  prefix / absolute-tolerance), scan-fused over the pair frame — cost
  is linear in CANDIDATE pairs, which blocking already bounded;
- m/u estimation is the caller's problem (labeled pairs or EM offline);
  this operator is the deterministic scoring half every run replays.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def field_agreement(
    left: Column, right: Column, mode: str = "exact", param=None
) -> Column:
    """Boolean agreement for one field pair.

    - ``exact``    : null-safe equality
    - ``norm``     : lower(trim(x)) equality (case/whitespace-proof)
    - ``prefix``   : first ``param`` chars equal after normalization
      (truncation-tolerant — the classic address comparator)
    - ``abs_tol``  : ``|a − b| <= param`` for numerics

    NULL on either side (after normalization) counts as DISAGREEMENT for
    exact/norm/prefix via eqNullSafe only when both NULL — a NULL vs
    value pair disagrees, two NULLs agree (no information either way is
    treated conservatively as agreement on a missing field; exclude the
    field upstream if that is wrong for the data).
    """
    if mode == "exact":
        return left.eqNullSafe(right)
    if mode == "norm":
        return F.lower(F.trim(left)).eqNullSafe(F.lower(F.trim(right)))
    if mode == "prefix":
        if not param or int(param) < 1:
            raise ValueError("prefix mode needs param >= 1")
        n = int(param)
        return F.substring(F.lower(F.trim(left)), 1, n).eqNullSafe(
            F.substring(F.lower(F.trim(right)), 1, n)
        )
    if mode == "abs_tol":
        if param is None or float(param) < 0:
            raise ValueError("abs_tol mode needs param >= 0")
        return F.abs(left - right) <= F.lit(float(param))
    raise ValueError(f"unknown agreement mode {mode!r}")


def fs_weights(m: float, u: float) -> tuple[float, float]:
    """(agreement_weight, disagreement_weight) = log2 likelihood ratios.
    Requires 0 < u < m < 1 — agreement must be more likely under a match
    or the field carries no linkage signal in this direction."""
    if not (0.0 < u < m < 1.0):
        raise ValueError("need 0 < u < m < 1")
    return math.log2(m / u), math.log2((1 - m) / (1 - u))


def fs_score(
    pairs: DataFrame,
    comparisons: list[dict],
    score_col: str = "fs_score",
) -> DataFrame:
    """Add per-field agreement flags and the summed FS score.

    ``comparisons``: dicts with keys ``name``, ``left``, ``right``
    (column names in ``pairs``), ``mode``/``param`` (see
    ``field_agreement``), ``m``, ``u``.  Adds ``agree_<name>`` BOOLEAN
    per field and ``score_col`` DOUBLE rounded to 4 dp (a fixed-order
    sum of inlined literal weights — replays bit-identically in SQL).
    """
    if not comparisons:
        raise ValueError("comparisons must be non-empty")
    out = pairs
    score = F.lit(0.0)
    for c in comparisons:
        wa, wd = fs_weights(c["m"], c["u"])
        agree = field_agreement(
            F.col(c["left"]), F.col(c["right"]), c.get("mode", "exact"),
            c.get("param"),
        )
        out = out.withColumn(f"agree_{c['name']}", agree)
        score = score + F.when(
            F.col(f"agree_{c['name']}"), F.lit(wa)
        ).otherwise(F.lit(wd))
    return out.withColumn(score_col, F.round(score, 4))


def classify_links(
    scored: DataFrame,
    upper: float,
    lower: float,
    score_col: str = "fs_score",
    band_col: str = "band",
) -> DataFrame:
    """Three-way FS decision: ``match`` (score >= upper), ``nonmatch``
    (score < lower), ``possible`` between — the clerical-review band."""
    if lower > upper:
        raise ValueError("lower must be <= upper")
    return scored.withColumn(
        band_col,
        F.when(F.col(score_col) >= upper, "match")
        .when(F.col(score_col) < lower, "nonmatch")
        .otherwise("possible"),
    )
