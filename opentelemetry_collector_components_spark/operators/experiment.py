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


def diff_in_diff(
    df: DataFrame,
    variant_col: str,
    period_col: str,
    value_col: str,
    treat,
    control,
    pre,
    post,
    key_cols: list[str] | None = None,
    y_cap: int = 1_000_000,
) -> DataFrame:
    """Difference-in-differences readout — the quasi-experimental
    estimator for rollouts WITHOUT randomization (staged launches,
    market tests): the treatment group's pre→post change minus the
    control group's, which nets out shared time trends that a naive
    post-only comparison absorbs as effect.

        did = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre)

    Completes the family: assign/srm/variant_metrics (randomized
    readout), cuped_adjust (variance reduction), lift_ci (bootstrap
    band) — this is the arm for when assignment was NOT random.

    Exactness: one partial-aggregated pass collects the four cells'
    (n, Σy, Σy²) as exact BIGINTs (integral metric required — use the
    cents idiom); the estimate, its large-sample standard error

        se = sqrt( Σ_cells s²_cell / n_cell ),
        s²_cell = (n·Σy² − (Σy)²) / (n·(n−1))

    and z ride ONE fixed-shape IEEE expression over those integers
    (identical tree in both engines), floored to ppm.  Any empty or
    singleton cell ⇒ NULL readouts (no silent degenerate SE); rows in
    neither arm/period are ignored.  Exactness is GUARDED, not hoped:
    |y| > ``y_cap`` raises scan-side, and a cell with more than
    2^62 / y_cap^2 rows raises post-agg (Σy² headroom) — the sibling
    operators' "sample or pre-bucket" contract.

    The parallel-trends assumption is the caller's burden (docstring,
    not code, can hold it); the classic two-way regression with unit
    fixed effects is equivalent for the 2×2 case emitted here.

    Output: (*keys, n_tpre, n_tpost, n_cpre, n_cpost, did_ppm, se_ppm,
    z_ppm).

    Scale shape: one groupBy over the keys with 12 conditional
    aggregates — a single shuffle, no window, no join."""
    keys = list(key_cols or [])
    if not 1 <= y_cap <= 3_000_000_000:
        # y_cap^2 must leave sum-of-squares headroom under 2^62
        raise ValueError("y_cap must be in [1, 3e9]")
    n_cell_cap = (2**62) // (y_cap * y_cap)
    val = F.col(value_col).cast("long")
    src = df.select(
        *[F.col(k) for k in keys],
        F.when(
            val.isNull() | (F.abs(val) > y_cap),
            F.raise_error(
                f"diff_in_diff: NULL or |{value_col}| > y_cap={y_cap} "
                "(raise y_cap, trading per-cell row headroom)"
            ).cast("long"),
        ).otherwise(val).alias("_y"),
        F.when(F.col(variant_col) == treat, F.lit(1))
        .when(F.col(variant_col) == control, F.lit(0))
        .alias("_t"),
        F.when(F.col(period_col) == post, F.lit(1))
        .when(F.col(period_col) == pre, F.lit(0))
        .alias("_p"),
    ).where(F.col("_t").isNotNull() & F.col("_p").isNotNull())

    def cell(t: int, p: int, what: str):
        cond = (F.col("_t") == t) & (F.col("_p") == p)
        if what == "n":
            return F.sum(F.when(cond, 1).otherwise(0)).cast("long")
        if what == "s":
            return F.sum(F.when(cond, F.col("_y")).otherwise(0)).cast("long")
        return F.sum(
            F.when(cond, F.col("_y") * F.col("_y")).otherwise(0)
        ).cast("long")

    agg = src.groupBy(*keys).agg(
        cell(1, 0, "n").alias("n_tpre"), cell(1, 1, "n").alias("n_tpost"),
        cell(0, 0, "n").alias("n_cpre"), cell(0, 1, "n").alias("n_cpost"),
        cell(1, 0, "s").alias("_s_tpre"), cell(1, 1, "s").alias("_s_tpost"),
        cell(0, 0, "s").alias("_s_cpre"), cell(0, 1, "s").alias("_s_cpost"),
        cell(1, 0, "q").alias("_q_tpre"), cell(1, 1, "q").alias("_q_tpost"),
        cell(0, 0, "q").alias("_q_cpre"), cell(0, 1, "q").alias("_q_cpost"),
    )
    biggest = F.greatest("n_tpre", "n_tpost", "n_cpre", "n_cpost")
    agg = agg.withColumn(
        "n_tpre",
        F.when(
            biggest > n_cell_cap,
            F.raise_error(
                f"diff_in_diff: a cell exceeds {n_cell_cap} rows at "
                f"y_cap={y_cap} — sample or aggregate to units first "
                "(sum-of-squares BIGINT headroom)"
            ).cast("long"),
        ).otherwise(F.col("n_tpre")),
    )
    ok = (
        (F.col("n_tpre") > 1) & (F.col("n_tpost") > 1)
        & (F.col("n_cpre") > 1) & (F.col("n_cpost") > 1)
    )
    did = (
        "(CAST(_s_tpost AS DOUBLE) / n_tpost - CAST(_s_tpre AS DOUBLE) / n_tpre"
        " - CAST(_s_cpost AS DOUBLE) / n_cpost + CAST(_s_cpre AS DOUBLE) / n_cpre)"
    )

    def varterm(c: str) -> str:
        return (
            f"(CAST(n_{c} AS DOUBLE) * _q_{c} - CAST(_s_{c} AS DOUBLE) * _s_{c})"
            f" / (CAST(n_{c} AS DOUBLE) * (n_{c} - 1)) / n_{c}"
        )

    se = (
        f"sqrt({varterm('tpost')} + {varterm('tpre')}"
        f" + {varterm('cpost')} + {varterm('cpre')})"
    )
    return agg.select(
        *keys,
        "n_tpre", "n_tpost", "n_cpre", "n_cpost",
        F.when(ok, F.expr(f"CAST(floor({did} * 1000000) AS BIGINT)")).alias(
            "did_ppm"
        ),
        F.when(ok, F.expr(f"CAST(floor({se} * 1000000) AS BIGINT)")).alias(
            "se_ppm"
        ),
        F.when(
            ok & F.expr(f"{se} > 0"),
            F.expr(f"CAST(floor({did} / {se} * 1000000) AS BIGINT)"),
        ).alias("z_ppm"),
    )


def diff_in_diff_oracle_sql(
    rows_sql: str,
    treat_expr: str,
    post_expr: str,
    value_expr: str,
    keys: list[str],
) -> str:
    """DuckDB replay of ``diff_in_diff``: ``rows_sql`` yields (*keys,
    and the referenced expressions); identical cells, identical IEEE
    expression trees."""
    kcsv = ", ".join(keys)
    kpfx = f"{kcsv}, " if keys else ""
    cells = []
    for c, t, p in (("tpre", 1, 0), ("tpost", 1, 1), ("cpre", 0, 0), ("cpost", 0, 1)):
        cond = f"_t = {t} AND _p = {p}"
        cells += [
            f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS n_{c}",
            f"CAST(SUM(CASE WHEN {cond} THEN _y ELSE 0 END) AS BIGINT) AS s_{c}",
            f"CAST(SUM(CASE WHEN {cond} THEN _y * _y ELSE 0 END) AS BIGINT) AS q_{c}",
        ]
    did = (
        "(CAST(s_tpost AS DOUBLE) / n_tpost - CAST(s_tpre AS DOUBLE) / n_tpre"
        " - CAST(s_cpost AS DOUBLE) / n_cpost + CAST(s_cpre AS DOUBLE) / n_cpre)"
    )

    def varterm(c: str) -> str:
        return (
            f"(CAST(n_{c} AS DOUBLE) * q_{c} - CAST(s_{c} AS DOUBLE) * s_{c})"
            f" / (CAST(n_{c} AS DOUBLE) * (n_{c} - 1)) / n_{c}"
        )

    se = (
        f"sqrt({varterm('tpost')} + {varterm('tpre')}"
        f" + {varterm('cpost')} + {varterm('cpre')})"
    )
    ok = "n_tpre > 1 AND n_tpost > 1 AND n_cpre > 1 AND n_cpost > 1"
    return f"""
    WITH src AS (
        SELECT {kpfx}CAST({value_expr} AS BIGINT) AS _y,
               {treat_expr} AS _t, {post_expr} AS _p
        FROM ({rows_sql}) q
        WHERE {treat_expr} IS NOT NULL AND {post_expr} IS NOT NULL
    ),
    agg AS (
        SELECT {kpfx}{', '.join(cells)}
        FROM src GROUP BY {kcsv if keys else 'ALL'}
    )
    SELECT {kpfx}n_tpre, n_tpost, n_cpre, n_cpost,
           CASE WHEN {ok} THEN CAST(FLOOR({did} * 1000000) AS BIGINT) END AS did_ppm,
           CASE WHEN {ok} THEN CAST(FLOOR({se} * 1000000) AS BIGINT) END AS se_ppm,
           CASE WHEN {ok} AND {se} > 0
                THEN CAST(FLOOR({did} / {se} * 1000000) AS BIGINT) END AS z_ppm
    FROM agg
    """


def bh_fdr(
    df: DataFrame,
    p_col: str,
    q_ppm: int = 50_000,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Benjamini-Hochberg FDR control (JRSS-B 1995) — the multiple-
    testing gate for fleets of readouts: with hundreds of per-segment
    z/chi-square tests (mann_whitney, chi_square_events,
    experiment_diff_in_diff...), per-test alpha floods dashboards with
    false positives; BH bounds the EXPECTED FALSE-DISCOVERY FRACTION at
    q instead of the per-test error rate.

    Input: one row per hypothesis with an integer-ppm p-value column
    (callers convert their statistic; p is consumed, not computed —
    normal/chi-square CDFs are lookup concerns, not shuffle concerns).
    Rule: sort p ascending (ties by p then stable on nothing else —
    ties share a verdict by construction), find the largest rank k with
    p_(k) * m <= k * q, reject ranks 1..k.  The comparison is the exact
    cross-multiplied integer form — no division anywhere.

    Output: input keys + (p_ppm, m, rejected BOOLEAN,
    bonferroni BOOLEAN) — Bonferroni (p * m <= q) rides along as the
    conservative family-wise reference.

    Scale shape: hypotheses are PRE-AGGREGATED readouts (one row per
    segment), so the two windows (rank, then running-max of satisfied
    ranks) run over a table that is tiny by construction; key_cols
    partition independent families."""
    if not 0 < q_ppm <= 1_000_000:
        raise ValueError("q_ppm must be in (0, 1e6]")
    reserved = {"p_ppm", "m", "rejected", "bonferroni", "_p", "_pstar",
                "_bh_rank"}
    clash = reserved & set(df.columns)
    if clash:
        # p_col itself is NOT exempt: a p column named 'm'/'p_ppm' is
        # clobbered by the internal withColumn exactly like any other
        raise ValueError(
            f"bh_fdr: input columns {sorted(clash)} collide with output/"
            "internal names — rename them first"
        )
    from pyspark.sql.window import Window

    keys = list(key_cols or [])
    p = F.col(p_col).cast("long")
    src = df.withColumn(
        "_p",
        F.when(
            p.isNull() | (p < 0) | (p > 1_000_000),
            F.raise_error(f"bh_fdr: {p_col} must be ppm in [0, 1e6]").cast(
                "long"
            ),
        ).otherwise(p),
    )
    wp = Window.partitionBy(*keys) if keys else Window.partitionBy()
    wr = wp.orderBy("_p")
    ranked = src.withColumn("_bh_rank", F.row_number().over(wr)).withColumn(
        "m", F.count(F.lit(1)).over(wp)
    )
    # reject all p <= p_(k*): the p-THRESHOLD form is tie-safe (equal
    # p-values always share a verdict even though their ranks are
    # arbitrary) — the rank<=k* form is not
    sat = F.when(
        F.col("_p") * F.col("m") <= F.col("_bh_rank") * q_ppm, F.col("_p")
    )
    ranked = ranked.withColumn("_pstar", F.max(sat).over(wp))
    return ranked.select(
        *[c for c in df.columns],
        F.col("_p").alias("p_ppm"),
        "m",
        F.coalesce(F.col("_p") <= F.col("_pstar"), F.lit(False)).alias(
            "rejected"
        ),
        (F.col("_p") * F.col("m") <= F.lit(q_ppm)).alias("bonferroni"),
    )


def bh_fdr_oracle_sql(
    rows_sql: str,
    p_col: str,
    q_ppm: int,
    keys: list[str],
) -> str:
    """DuckDB replay of ``bh_fdr``: identical ranks and exact
    cross-multiplied thresholds."""
    part = f"PARTITION BY {', '.join(keys)} " if keys else ""
    return f"""
    WITH ranked AS (
        SELECT *,
               CAST({p_col} AS BIGINT) AS p_ppm,
               CAST(ROW_NUMBER() OVER ({part}ORDER BY {p_col})
                   AS INTEGER) AS rank,
               CAST(COUNT(*) OVER ({part.rstrip() or ''}) AS BIGINT) AS m
        FROM ({rows_sql}) q
    ),
    kstar AS (
        SELECT *,
               MAX(CASE WHEN p_ppm * m <= rank * {q_ppm} THEN p_ppm
                        END) OVER ({part.rstrip() or ''}) AS _ps
        FROM ranked
    )
    SELECT * EXCLUDE (_ps, rank),
           COALESCE(p_ppm <= _ps, FALSE) AS rejected,
           p_ppm * m <= {q_ppm} AS bonferroni
    FROM kstar
    """
