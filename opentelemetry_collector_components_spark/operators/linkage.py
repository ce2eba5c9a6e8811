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


def estimate_fs_em_quantized(
    agreements: DataFrame,
    fields: list[str],
    iterations: int = 3,
    init_m: int = 900_000,
    init_u: int = 100_000,
    init_p: int = 100_000,
) -> tuple[DataFrame, DataFrame]:
    """Unsupervised m/u estimation — the EM the module docstring
    deferred (Fellegi & Sunter 1969; Winkler's EM formulation): binary
    agreement vectors collapse to their ≤2^F distinct PATTERNS with one
    partial-aggregated groupBy (the only corpus-scale step), and EM runs
    on that tiny pattern table in exact micro-unit integers:

    - E-step: ``w = p·Π(m or 1−m)``, ``v = (1−p)·Π(u or 1−u)`` as
      DECIMAL(38,0) products (≤1e6 per factor, F+1 factors), posterior
      ``g = w·1e6 DIV (w+v)`` — truncating, engine-identical;
    - M-step: ``m_j = (Σ n·g·γ_j)·1e6 DIV (Σ n·g)`` etc., clamped to
      [1, 999999] so a degenerate field cannot absorb to 0/1 and kill
      every later product (documented, deterministic).

    Returns ``(params, posteriors)``: per-field ``(field, m_micro,
    u_micro)`` plus a ``_prevalence`` row, and per-pattern
    ``(fields..., n_pairs, posterior_micro)`` after the final round —
    the table ``fs_score`` consumers threshold.  The whole trajectory is
    a pure function of the pattern counts, replayed CTE-for-CTE by the
    oracle."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not fields:
        raise ValueError("fields must be non-empty")
    if len(fields) > 8:
        raise ValueError("more than 8 fields: pattern table no longer tiny")
    pat = (
        agreements.groupBy(*[F.col(f).cast("int").alias(f) for f in fields])
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = pat.collect()  # <= 2^F rows by construction (3^F with NULLs)
    for r in rows:
        for f in fields:
            if r[f] is None:
                raise ValueError(
                    f"NULL agreement values in field {f!r}: resolve the"
                    " missing-comparison semantics upstream (coalesce to"
                    " disagree, or model a third level explicitly)"
                )
    M = 1_000_000
    m = {f: init_m for f in fields}
    u = {f: init_u for f in fields}
    p = init_p
    n_total = sum(r["n"] for r in rows)
    if n_total == 0:
        raise ValueError("agreement table is empty")
    clamp = lambda x: max(1, min(M - 1, x))  # noqa: E731
    g_of = {}
    for _ in range(iterations):
        num_m = {f: 0 for f in fields}
        num_u = {f: 0 for f in fields}
        den_g = 0
        for r in rows:
            w, v = p, M - p
            for f in fields:
                w *= m[f] if r[f] else M - m[f]
                v *= u[f] if r[f] else M - u[f]
            g = (w * M) // (w + v)
            g_of[tuple(r[f] for f in fields)] = g
            den_g += r["n"] * g
            for f in fields:
                if r[f]:
                    num_m[f] += r["n"] * g
                    num_u[f] += r["n"] * (M - g)
        den_u = n_total * M - den_g
        if den_g == 0 or den_u == 0:
            raise ValueError(
                "EM collapsed: every posterior quantized to"
                f" {'0' if den_g == 0 else '1'} — the agreement table"
                " carries no separable mixture at this quantization"
                " (check blocking quality or reduce field count)"
            )
        m = {f: clamp((num_m[f] * M) // den_g) for f in fields}
        u = {f: clamp((num_u[f] * M) // den_u) for f in fields}
        p = clamp(den_g // n_total)
    # emitted posteriors use the FINAL parameters (one closing E-step)
    for r in rows:
        w, v = p, M - p
        for f in fields:
            w *= m[f] if r[f] else M - m[f]
            v *= u[f] if r[f] else M - u[f]
        g_of[tuple(r[f] for f in fields)] = (w * M) // (w + v)
    spark = agreements.sparkSession
    params = spark.createDataFrame(
        [(f, m[f], u[f]) for f in sorted(fields)]
        + [("_prevalence", p, p)],
        "field string, m_micro long, u_micro long",
    )
    posteriors = spark.createDataFrame(
        [
            tuple(int(r[f]) for f in fields)
            + (int(r["n"]), g_of[tuple(r[f] for f in fields)])
            for r in rows
        ],
        ", ".join(f"{f} int" for f in fields) + ", n_pairs long, posterior_micro long",
    )
    return params, posteriors
