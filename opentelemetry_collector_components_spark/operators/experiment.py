"""A/B experiment analysis: deterministic assignment, SRM guard, lift.

The product-analytics loop every event pipeline ends up serving:

- ``assign_variant`` — hash-based unit bucketing (md5, the repo's
  cross-engine hash): stable across runs and machines, no assignment
  table to join, weights in integer parts (50/30/20).  Salted by
  experiment name so concurrent experiments are independent.
- ``srm_check`` — the sample-ratio-mismatch guard that must gate every
  readout: a chi-square goodness-of-fit of observed unit counts against
  the configured weights.  A significant SRM means the assignment or
  logging is broken and the metric readout is garbage (the standard
  first check in any experimentation platform).  The statistic is a
  FIXED-ORDER sum of per-variant terms computed from one aggregate row —
  aggregation-order-proof, so the double replays exactly in SQL.
- ``variant_metrics`` — per-variant unit/event counts and metric means
  (ratios of exact integer sums for integral metrics) plus lift vs the
  control variant.

Scale shape: assignment is a scan-side expression; SRM and metrics are
single partial-aggregated passes; nothing keyed by unit ever shuffles
except the distinct-unit count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: chi-square upper-tail critical values at alpha = 0.001, by degrees of
#: freedom (variants - 1) — the conventional SRM alarm threshold
CHI2_CRIT_P001 = {1: 10.828, 2: 13.816, 3: 16.266, 4: 18.467, 5: 20.515}


def assign_variant(
    unit: Column,
    experiment: str,
    weights: dict[str, int],
    seed: int = 7,
) -> Column:
    """Deterministic variant for a unit id: md5 bucket in [0, Σweights),
    mapped through the cumulative weight ladder (insertion order)."""
    from ..functions.textstats import md5_hash60

    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    total = sum(weights.values())
    bucket = F.pmod(
        md5_hash60(
            F.concat(
                unit.cast("string"), F.lit(f":exp:{experiment}:{seed}")
            )
        ),
        F.lit(total),
    )
    expr = None
    acc = 0
    for name, w in weights.items():
        acc += w
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr


def srm_check(
    df: DataFrame,
    unit_col: str,
    variant_col: str,
    weights: dict[str, int],
) -> DataFrame:
    """One-row sample-ratio-mismatch report:
    ``(n_units, chi2, srm)`` — chi2 = Σ (o_v − e_v)²/e_v over DISTINCT
    units with e_v = n·w_v/W, compared against the 0.001 critical value
    for |variants|−1 degrees of freedom.  chi2 is rounded to 4 dp; the
    per-variant terms are summed in the weights' declared order (a
    fixed expression tree, not an aggregation fold)."""
    dof = len(weights) - 1
    if dof not in CHI2_CRIT_P001:
        raise ValueError(f"unsupported variant count {len(weights)}")
    total = sum(weights.values())
    units = df.select(unit_col, variant_col).distinct()
    aggs = [F.count(F.lit(1)).alias("n_units")]
    for name in weights:
        aggs.append(
            F.sum(F.when(F.col(variant_col) == name, 1).otherwise(0)).alias(
                f"_o_{name}"
            )
        )
    row = units.agg(*aggs)
    chi2 = None
    for name, w in weights.items():
        e = F.col("n_units").cast("double") * w / total
        d = F.col(f"_o_{name}") - e
        term = d * d / e  # explicit multiply: pow(x, 2) is not ulp-stable
        chi2 = term if chi2 is None else chi2 + term
    crit = CHI2_CRIT_P001[dof]
    return row.select(
        "n_units",
        F.round(chi2, 4).alias("chi2"),
        (F.round(chi2, 4) > F.lit(crit)).alias("srm"),
    )


def variant_metrics(
    df: DataFrame,
    unit_col: str,
    variant_col: str,
    value_col: str,
    control: str,
) -> DataFrame:
    """Per-variant readout: ``(variant, n_units, n_events, value_mean,
    lift_pct)`` — value_mean = Σvalue/Σevents rounded 4 dp; lift is the
    mean's relative change vs the control variant (control row: 0),
    rounded 2 dp.  One aggregate + a 1-row broadcast of the control
    mean."""
    per = df.groupBy(variant_col).agg(
        F.countDistinct(unit_col).alias("n_units"),
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(value_col) / F.count(F.lit(1))).alias("_mean"),
    )
    ctrl = per.where(F.col(variant_col) == control).select(
        F.col("_mean").alias("_cmean")
    )
    return (
        per.crossJoin(F.broadcast(ctrl))
        .select(
            F.col(variant_col).alias("variant"),
            "n_units",
            "n_events",
            F.round("_mean", 4).alias("value_mean"),
            F.round(
                (F.col("_mean") - F.col("_cmean")) * 100 / F.col("_cmean"), 2
            ).alias("lift_pct"),
        )
    )


def cuped_adjust(
    units: DataFrame,
    variant_col: str,
    y_col: str,
    x_col: str,
) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013): adjust each
    variant's metric mean with a pre-experiment covariate —
    ``mean_cuped_v = ȳ_v − θ·(x̄_v − x̄)`` with the pooled
    ``θ = cov(x, y)/var(x)`` — shrinking the readout's variance by the
    covariate's explained share (~ρ²) without touching the expectation
    (the covariate predates assignment, so E[x̄_v − x̄] = 0).

    Input is UNIT-level rows ``(variant, y, x)`` (aggregate events to
    units first — adjustment must happen at the randomization grain).
    θ comes from the closed-form integer-sum identity
    ``θ = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²)`` — for integral metrics every
    sum is exact, so θ and the adjusted means replay bit-identically in
    SQL.  Two aggregates total (one global, one per variant), no window.

    Returns ``(variant, n_units, mean_raw, mean_cuped, theta)`` with
    means/θ rounded to 4 dp.  Degenerate var(x)=0 yields θ=0 (no
    adjustment) rather than a NULL blow-up.
    """
    g = units.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x_col).alias("_sx"),
        F.sum(y_col).alias("_sy"),
        F.sum(F.col(x_col) * F.col(x_col)).alias("_sxx"),
        F.sum(F.col(x_col) * F.col(y_col)).alias("_sxy"),
    ).select(
        "_n", "_sx",
        F.when(
            F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx") == 0,
            F.lit(0.0),
        )
        .otherwise(
            (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
            / (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
        )
        .alias("_theta"),
    )
    per = units.groupBy(variant_col).agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum(y_col).alias("_vy"),
        F.sum(x_col).alias("_vx"),
    )
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            F.col(variant_col).alias("variant"),
            "n_units",
            F.round(F.col("_vy") / F.col("n_units"), 4).alias("mean_raw"),
            F.round(
                F.col("_vy") / F.col("n_units")
                - F.col("_theta")
                * (
                    F.col("_vx") / F.col("n_units")
                    - F.col("_sx") / F.col("_n")
                ),
                4,
            ).alias("mean_cuped"),
            F.round("_theta", 4).alias("theta"),
        )
    )


def lift_ci(
    units: DataFrame,
    unit_col: str,
    variant_col: str,
    y_col: str,
    control: str,
    treatment: str,
    b: int = 64,
    qs: tuple[float, ...] = (0.025, 0.5, 0.975),
    seed: int = 7,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the relative lift of
    ``treatment`` over ``control`` — the uncertainty band the point lift
    in ``variant_metrics`` must ship with before anyone acts on it.

    Per replica, each UNIT gets the deterministic Poisson(1) weight from
    ``operators/bootstrap.py::replica_weight`` (resampling at the
    randomization grain — resampling events would break independence);
    the replica lift is a ratio of exact integer sums, so every replica
    value — and the join-based order-statistic CI over them — replays
    bit-identically in SQL.  Returns ``(q DOUBLE, lift_pct DOUBLE)``
    (lift rounded 4 dp per replica before ranking, ties by replica id).

    One grouped pass over |units|·B exploded rows collapsing straight to
    2·B partial rows; the CI walk is a B-row join.  A zero-effect
    experiment brackets 0; a real effect's interval excludes it.
    """
    import math

    from .bootstrap import replica_weight

    if b < 2:
        raise ValueError("b must be >= 2")
    two = units.where(F.col(variant_col).isin(control, treatment))
    rep = F.explode(F.array([F.lit(i) for i in range(b)])).alias("rep")
    per = (
        two.select(
            F.col(variant_col).alias("_v"),
            F.col(y_col).cast("long").alias("_y"),
            F.col(unit_col).alias("_u"),
            rep,
        )
        .withColumn("_w", replica_weight(F.col("_u"), F.col("rep"), seed))
        .groupBy("rep", "_v")
        .agg(
            F.sum(F.col("_w").cast("long") * F.col("_y")).alias("_wy"),
            F.sum("_w").alias("_sw"),
        )
    )
    ctrl = per.where(F.col("_v") == control).select(
        "rep", F.col("_wy").alias("_cwy"), F.col("_sw").alias("_csw")
    )
    trt = per.where(F.col("_v") == treatment).select(
        "rep", F.col("_wy").alias("_twy"), F.col("_sw").alias("_tsw")
    )
    lifts = (
        ctrl.join(trt, "rep")
        .where((F.col("_csw") > 0) & (F.col("_tsw") > 0) & (F.col("_cwy") > 0))
        .select(
            "rep",
            F.round(
                (
                    F.col("_twy").cast("double") / F.col("_tsw")
                    - F.col("_cwy").cast("double") / F.col("_csw")
                )
                * 100
                / (F.col("_cwy").cast("double") / F.col("_csw")),
                4,
            ).alias("lift"),
        )
    )
    other = lifts.select(
        F.col("rep").alias("_r2"), F.col("lift").alias("_l2")
    )
    ranked = (
        lifts.join(
            F.broadcast(other),
            (F.col("_l2") < F.col("lift"))
            | ((F.col("_l2") == F.col("lift")) & (F.col("_r2") < F.col("rep"))),
            "left",
        )
        .groupBy("rep", "lift")
        .agg(F.count("_r2").alias("_rank"))
    )
    qdf = units.sparkSession.createDataFrame(
        [(float(q), int(math.floor(q * (b - 1)))) for q in qs],
        "q double, _target long",
    )
    return ranked.join(F.broadcast(qdf), F.col("_rank") == F.col("_target")).select(
        "q", F.col("lift").alias("lift_pct")
    )
