"""Binary-classifier evaluation: exact ROC-AUC, confusion metrics, ECE.

The missing half of the quality-classifier loop: ``classifier.py``
trains and scores the CCNet/DCLM-style filter, ``conformal.py`` wraps
scores in distribution-free bands, ``ranking.py`` grades retrieval —
this module grades the CLASSIFIER itself, so a corpus team can compare
filter versions on a held-out labeled slice before re-filtering 100 TB.

All three readouts are exact-integer or single-double-division
arithmetic over quantized (ppm) scores, per the repo's oracle
discipline:

- ``roc_auc``: the Mann-Whitney rank form with average-rank tie
  handling.  AUC = (Σ_pos rank − P(P+1)/2) / (P·N_neg); with doubled
  rank sums D = Σ_s pos_s·(2·before_s + n_s + 1) (one term per DISTINCT
  score s) this is AUC = (D − P(P+1)) / (2·P·N_neg) — every quantity a
  BIGINT.  The ranking window runs over the per-(group, score)
  AGGREGATED table (≤ 1e6+1 rows per group for ppm scores), never over
  raw rows: a 10^12-row slice reduces to one partial-agg shuffle plus a
  window on a bounded table.  Overflow: D ≤ 3N² caps N at ~1.7e9 rows
  per group in pure BIGINT — past that, pre-bucket scores coarser.
  The final ppm value is floor(1e6·num/den) computed as one
  BIGINT-exact step when safe (num·1e6 < 2^63) and as one IEEE double
  division otherwise — both engines round casts and a single division
  identically.

- ``confusion_at``: tp/fp/fn/tn at a threshold plus
  precision/recall/f1 in exact ppm (numerators ≤ 2N·1e6 stay BIGINT).

- ``calibration_ece``: B equal-width bins over ppm scores;
  per-bin accuracy and mean confidence in exact ppm, ECE =
  Σ n_b·|acc_b − conf_b| / N — the standard expected-calibration-error
  readout (Naeini et al., AAAI 2015), exact in BIGINT.

Labels must be 0/1 and non-NULL (raised loudly, same contract as
drift.py's slice flag); scores must already be integers — quantize
floats upstream (the repo's classifiers emit ppm natively).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PPM = 1_000_000


def _guard_label(label_col: str, caller: str) -> Column:
    lab = F.col(label_col).cast("long")
    bad = lab.isNull() | ~lab.isin(0, 1)
    return F.when(
        bad,
        F.raise_error(
            f"{caller}: {label_col} must be 0/1 and non-NULL"
        ).cast("long"),
    ).otherwise(lab)


def roc_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact ROC-AUC per group: (*group_cols, n, n_pos, n_neg, auc_ppm).

    Groups with no positives or no negatives return NULL auc_ppm (AUC
    is undefined there) rather than raising — a per-slice readout over
    many slices should not die on a degenerate slice.
    """
    groups = list(group_cols or [])
    lab = _guard_label(label_col, "roc_auc")
    s = F.col(score_col).cast("long")
    # NULL scores raise loudly: Spark windows order NULLS FIRST where
    # DuckDB defaults NULLS LAST, so a silent NULL group would shift
    # every rank and quietly diverge from the oracle
    s = F.when(
        s.isNull(),
        F.raise_error(f"roc_auc: NULL in {score_col}").cast("long"),
    ).otherwise(s)
    per_score = (
        df.select(
            *[F.col(g) for g in groups],
            s.alias("_s"),
            lab.alias("_y"),
        )
        .groupBy(*groups, "_s")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_y").alias("_pos"),
        )
    )
    w = Window.partitionBy(*groups).orderBy("_s")
    ranked = per_score.withColumn(
        "_before",
        F.coalesce(
            F.sum("_n").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    agg = ranked.groupBy(*groups).agg(
        F.sum("_n").alias("n"),
        F.sum("_pos").alias("n_pos"),
        F.sum(
            F.col("_pos") * (2 * F.col("_before") + F.col("_n") + 1)
        ).alias("_d2"),
    )
    staged = agg.select(
        *groups,
        "n",
        "n_pos",
        (F.col("n") - F.col("n_pos")).alias("n_neg"),
        (F.col("_d2") - F.col("n_pos") * (F.col("n_pos") + 1)).alias("_num"),
        (2 * F.col("n_pos") * (F.col("n") - F.col("n_pos"))).alias("_den"),
    )
    # BIGINT-exact `div` when num*1e6 fits; one IEEE double division
    # beyond (the 1e9-row slice) — both engines round a single cast and
    # a single division identically.
    ppm = F.when(
        F.col("_num") <= (2**63 - 1) // PPM,
        F.expr(f"(_num * {PPM}) div _den"),
    ).otherwise(
        F.floor(
            F.col("_num").cast("double") / F.col("_den").cast("double") * PPM
        ).cast("long")
    )
    return staged.select(
        *groups,
        "n",
        "n_pos",
        "n_neg",
        F.when(F.col("_den") > 0, ppm).alias("auc_ppm"),
    )


def roc_auc_oracle_sql(
    rows_sql: str,
    label_col: str,
    score_col: str,
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB replay of the identical aggregated-rank arithmetic."""
    groups = list(group_cols or [])
    gsel = "".join(f"{g}, " for g in groups)
    gby = ", ".join(str(i + 1) for i in range(len(groups) + 1))
    part = f"PARTITION BY {', '.join(groups)} " if groups else ""
    gby2 = ("GROUP BY " + ", ".join(str(i + 1) for i in range(len(groups)))) if groups else ""
    return f"""
    WITH per_score AS (
        SELECT {gsel}CAST({score_col} AS BIGINT) AS s,
               COUNT(*) AS n, CAST(SUM({label_col}) AS BIGINT) AS pos
        FROM ({rows_sql}) src GROUP BY {gby}
    ), ranked AS (
        SELECT *, COALESCE(SUM(n) OVER ({part}ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        FROM per_score
    ), agg AS (
        SELECT {gsel}CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(pos * (2 * before + n + 1)) AS BIGINT) AS d2
        FROM ranked {gby2}
    )
    SELECT {gsel}n, n_pos, n - n_pos AS n_neg,
           CASE WHEN 2 * n_pos * (n - n_pos) > 0 THEN
             CASE WHEN d2 - n_pos * (n_pos + 1)
                       <= (9223372036854775807 // {PPM}) THEN
               CAST((d2 - n_pos * (n_pos + 1)) * {PPM}
                    // (2 * n_pos * (n - n_pos)) AS BIGINT)
             ELSE
               CAST(floor(CAST(d2 - n_pos * (n_pos + 1) AS DOUBLE)
                    / CAST(2 * n_pos * (n - n_pos) AS DOUBLE)
                    * {PPM}) AS BIGINT)
             END
           END AS auc_ppm
    FROM agg
    """


def confusion_at(
    df: DataFrame,
    label_col: str,
    score_col: str,
    threshold: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Confusion counts and exact-ppm precision/recall/F1 at
    ``score >= threshold``: (*group_cols, tp, fp, fn, tn,
    precision_ppm, recall_ppm, f1_ppm).  Empty denominators yield NULL
    (no predicted positives / no actual positives / no rows)."""
    groups = list(group_cols or [])
    lab = _guard_label(label_col, "confusion_at")
    pred = (F.col(score_col).cast("long") >= threshold).cast("long")
    cells = df.select(
        *[F.col(g) for g in groups],
        lab.alias("_y"),
        pred.alias("_p"),
    ).groupBy(*groups).agg(
        F.sum(F.col("_y") * F.col("_p")).alias("tp"),
        F.sum((1 - F.col("_y")) * F.col("_p")).alias("fp"),
        F.sum(F.col("_y") * (1 - F.col("_p"))).alias("fn"),
        F.sum((1 - F.col("_y")) * (1 - F.col("_p"))).alias("tn"),
    )

    def ratio(num_expr: str, den_expr: str) -> Column:
        return F.when(
            F.expr(den_expr) > 0,
            F.expr(f"(({num_expr}) * {PPM}) div ({den_expr})"),
        )

    return cells.select(
        *groups,
        "tp", "fp", "fn", "tn",
        ratio("tp", "tp + fp").alias("precision_ppm"),
        ratio("tp", "tp + fn").alias("recall_ppm"),
        ratio("2 * tp", "2 * tp + fp + fn").alias("f1_ppm"),
    )


def confusion_oracle_sql(
    rows_sql: str,
    label_col: str,
    score_col: str,
    threshold: int,
    group_cols: list[str] | None = None,
) -> str:
    groups = list(group_cols or [])
    gsel = "".join(f"{g}, " for g in groups)
    gby = ("GROUP BY " + ", ".join(str(i + 1) for i in range(len(groups)))) if groups else ""
    return f"""
    WITH cells AS (
        SELECT {gsel}
               CAST(SUM(CASE WHEN {label_col} = 1 AND {score_col} >= {threshold} THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN {label_col} = 0 AND {score_col} >= {threshold} THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN {label_col} = 1 AND {score_col} < {threshold} THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN {label_col} = 0 AND {score_col} < {threshold} THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM ({rows_sql}) src {gby}
    )
    SELECT {gsel}tp, fp, fn, tn,
           CASE WHEN tp + fp > 0 THEN tp * {PPM} // (tp + fp) END AS precision_ppm,
           CASE WHEN tp + fn > 0 THEN tp * {PPM} // (tp + fn) END AS recall_ppm,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN 2 * tp * {PPM} // (2 * tp + fp + fn) END AS f1_ppm
    FROM cells
    """


def calibration_ece(
    df: DataFrame,
    label_col: str,
    score_ppm_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-bin calibration table plus the ECE total row.

    Output: (bin, n, acc_ppm, conf_ppm, gap_ppm) for every non-empty
    bin, with bin = -1 carrying (N, NULL, NULL, ece_ppm) as the
    corpus-level summary — one result frame, no second pass.  Scores
    must be ppm in [0, 1e6]; 1e6 lands in the top bin.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    lab = _guard_label(label_col, "calibration_ece")
    s = F.col(score_ppm_col).cast("long")
    guarded = F.when(
        s.isNull() | (s < 0) | (s > PPM),
        F.raise_error("calibration_ece: score must be ppm in [0, 1e6]")
        .cast("long"),
    ).otherwise(s)
    b = F.least(
        F.expr(f"CAST(({score_ppm_col} * {n_bins}) div {PPM} AS BIGINT)"),
        F.lit(n_bins - 1).cast("long"),
    )
    bins = (
        df.select(b.alias("bin"), lab.alias("_y"), guarded.alias("_s"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("_pos"),
            F.sum("_s").alias("_conf_sum"),
        )
        .select(
            "bin",
            "n",
            F.expr(f"(_pos * {PPM}) div n").alias("acc_ppm"),
            F.expr("_conf_sum div n").alias("conf_ppm"),
        )
        .withColumn("gap_ppm", F.abs(F.col("acc_ppm") - F.col("conf_ppm")))
    )
    total = bins.agg(
        F.lit(-1).cast("long").alias("bin"),
        F.sum("n").alias("n"),
        F.lit(None).cast("long").alias("acc_ppm"),
        F.lit(None).cast("long").alias("conf_ppm"),
        F.expr("SUM(n * gap_ppm) div SUM(n)").alias("gap_ppm"),
    )
    return bins.unionAll(total)


def ece_oracle_sql(
    rows_sql: str, label_col: str, score_ppm_col: str, n_bins: int = 10
) -> str:
    return f"""
    WITH bins AS (
        SELECT LEAST({score_ppm_col} * {n_bins} // {PPM}, {n_bins - 1}) AS bin,
               COUNT(*) AS n,
               CAST(SUM({label_col}) AS BIGINT) AS pos,
               CAST(SUM({score_ppm_col}) AS BIGINT) AS conf_sum
        FROM ({rows_sql}) src GROUP BY 1
    ), per_bin AS (
        SELECT CAST(bin AS BIGINT) AS bin, n,
               pos * {PPM} // n AS acc_ppm,
               conf_sum // n AS conf_ppm,
               abs(pos * {PPM} // n - conf_sum // n) AS gap_ppm
        FROM bins
    )
    SELECT bin, n, acc_ppm, conf_ppm, gap_ppm FROM per_bin
    UNION ALL
    SELECT CAST(-1 AS BIGINT), CAST(SUM(n) AS BIGINT),
           NULL, NULL,
           CAST(SUM(n * gap_ppm) // SUM(n) AS BIGINT)
    FROM per_bin
    """


def lift_curve(
    df: DataFrame,
    label_col: str,
    score_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact cumulative gains/lift curve sampled at every distinct
    score, descending — "scoring the top X% of traffic captures Y% of
    positives at Z× lift", the triage readout behind every filter-
    threshold decision.

    Defined on DISTINCT SCORE LEVELS rather than fixed deciles on
    purpose: decile cuts land mid-tie (rows with equal scores straddle
    the cut, and any split of a tied level into two buckets is
    arbitrary), while the level-sampled curve is a pure function of
    the data.  Read a decile off the curve by picking the level whose
    frac_ppm first reaches 100000·d.

    Output per (group, s): n, pos, cum_n, cum_pos, frac_ppm (share of
    rows at-or-above s), capture_ppm (share of all positives captured),
    lift_ppm (capture/frac, 1e6 = baseline).  All BIGINT with the
    shared guarded-ratio discipline (``agreement._ppm_ratio``); groups
    with zero positives emit NULL capture/lift.  Same scale shape as
    roc_auc: one partial-agg groupBy, windows over the bounded level
    table only.
    """
    from .agreement import _ppm_ratio

    groups = list(group_cols or [])
    lab = _guard_label(label_col, "lift_curve")
    s = F.col(score_col).cast("long")
    s = F.when(
        s.isNull(),
        F.raise_error(f"lift_curve: NULL in {score_col}").cast("long"),
    ).otherwise(s)
    per_score = (
        df.select(*[F.col(g) for g in groups], s.alias("s"), lab.alias("_y"))
        .groupBy(*groups, "s")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_y").alias("pos"))
    )
    w = Window.partitionBy(*groups).orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wp = Window.partitionBy(*groups)
    staged = per_score.select(
        *groups,
        "s",
        "n",
        "pos",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("pos").over(w).alias("cum_pos"),
        F.sum("n").over(wp).alias("_total_n"),
        F.sum("pos").over(wp).alias("_total_pos"),
    )
    return staged.select(
        *groups,
        "s",
        "n",
        "pos",
        "cum_n",
        "cum_pos",
        _ppm_ratio("cum_n", "_total_n").alias("frac_ppm"),
        F.when(
            F.col("_total_pos") > 0, _ppm_ratio("cum_pos", "_total_pos")
        ).alias("capture_ppm"),
        F.when(
            F.col("_total_pos") > 0,
            _ppm_ratio("cum_pos * _total_n", "cum_n * _total_pos"),
        ).alias("lift_ppm"),
    )


def lift_curve_oracle_sql(
    rows_sql: str,
    label_col: str,
    score_col: str,
    group_cols: list[str] | None = None,
) -> str:
    from .agreement import _ppm_ratio_sql

    groups = list(group_cols or [])
    kc = "".join(f"{g}, " for g in groups)
    part = ("PARTITION BY " + ", ".join(groups) + " ") if groups else ""
    gby = "GROUP BY " + ", ".join(str(i + 1) for i in range(len(groups) + 1))
    return f"""
    WITH per_score AS (
        SELECT {kc}CAST({score_col} AS BIGINT) AS s,
               COUNT(*) AS n, CAST(SUM({label_col}) AS BIGINT) AS pos
        FROM ({rows_sql}) src {gby}
    ), staged AS (
        SELECT *,
               CAST(SUM(n) OVER ({part}ORDER BY s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_n,
               CAST(SUM(pos) OVER ({part}ORDER BY s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_pos,
               CAST(SUM(n) OVER ({part}) AS BIGINT) AS total_n,
               CAST(SUM(pos) OVER ({part}) AS BIGINT) AS total_pos
        FROM per_score
    )
    SELECT {kc}s, n, pos,
           cum_n,
           cum_pos,
           {_ppm_ratio_sql("cum_n", "total_n")} AS frac_ppm,
           CASE WHEN total_pos > 0 THEN
             {_ppm_ratio_sql("cum_pos", "total_pos")} END AS capture_ppm,
           CASE WHEN total_pos > 0 THEN
             {_ppm_ratio_sql("cum_pos * total_n", "cum_n * total_pos")}
           END AS lift_ppm
    FROM staged
    """


def average_precision(
    df: DataFrame,
    label_col: str,
    score_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tie-aware average precision (PR-AUC's rank form): every row at a
    score level shares the level's cumulative precision, so

        AP = Σ_levels pos_s · (cum_pos_s / cum_n_s) / P

    over the score-descending level table — the convention that makes
    AP a pure function of the aggregated table (per-row tie-breaking
    inside a level is arbitrary and engine-dependent; this form is
    not).  Each level's precision floors to ppm before the weighted
    BIGINT sum (order-free), and the final weighted mean floors once
    more: total truncation < (#levels + 1) ppm, one-sided,
    deterministic.  Output: (*group_cols, n, n_pos, ap_ppm); NULL
    ap_ppm when a group has no positives."""
    from .agreement import _ppm_ratio

    groups = list(group_cols or [])
    lab = _guard_label(label_col, "average_precision")
    s = F.col(score_col).cast("long")
    s = F.when(
        s.isNull(),
        F.raise_error(f"average_precision: NULL in {score_col}")
        .cast("long"),
    ).otherwise(s)
    per_score = (
        df.select(*[F.col(g) for g in groups], s.alias("_s"), lab.alias("_y"))
        .groupBy(*groups, "_s")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_y").alias("_pos"))
    )
    w = Window.partitionBy(*groups).orderBy(F.desc("_s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    staged = per_score.select(
        *groups,
        "_n",
        "_pos",
        F.sum("_n").over(w).alias("_cum_n"),
        F.sum("_pos").over(w).alias("_cum_pos"),
    ).withColumn("_prec_ppm", _ppm_ratio("_cum_pos", "_cum_n"))
    agg = staged.groupBy(*groups).agg(
        F.sum("_n").alias("n"),
        F.sum("_pos").alias("n_pos"),
        F.sum(F.col("_pos") * F.col("_prec_ppm")).alias("_wsum"),
    )
    return agg.select(
        *groups,
        "n",
        "n_pos",
        F.when(
            F.col("n_pos") > 0, F.expr("_wsum div n_pos")
        ).alias("ap_ppm"),
    )


def average_precision_oracle_sql(
    rows_sql: str,
    label_col: str,
    score_col: str,
    group_cols: list[str] | None = None,
) -> str:
    from .agreement import _ppm_ratio_sql

    groups = list(group_cols or [])
    kc = "".join(f"{g}, " for g in groups)
    part = ("PARTITION BY " + ", ".join(groups) + " ") if groups else ""
    gby = "GROUP BY " + ", ".join(str(i + 1) for i in range(len(groups) + 1))
    gby2 = ("GROUP BY " + ", ".join(str(i + 1) for i in range(len(groups)))) if groups else ""
    return f"""
    WITH per_score AS (
        SELECT {kc}CAST({score_col} AS BIGINT) AS s,
               COUNT(*) AS n, CAST(SUM({label_col}) AS BIGINT) AS pos
        FROM ({rows_sql}) src {gby}
    ), staged AS (
        SELECT *,
               {_ppm_ratio_sql(
                   "SUM(pos) OVER (" + part + "ORDER BY s DESC "
                   "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
                   "SUM(n) OVER (" + part + "ORDER BY s DESC "
                   "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")}
                   AS prec_ppm
        FROM per_score
    )
    SELECT {kc}CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CASE WHEN SUM(pos) > 0 THEN
             CAST(SUM(pos * prec_ppm) AS BIGINT) // CAST(SUM(pos) AS BIGINT)
           END AS ap_ppm
    FROM staged {gby2}
    """


def brier_score(
    df: DataFrame,
    label_col: str,
    score_ppm_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Brier score (mean squared probability error, Brier 1950) over
    ppm scores: per score LEVEL the exact contribution is
    pos·(s−1e6)² + (n−pos)·s², divided to micro units per level before
    the order-free BIGINT sum (totals safe to ~9e12 rows; a single
    LEVEL above ~9.2e6 rows switches to one IEEE double product —
    identical in both engines; truncation < #levels micro).  Output: (*group_cols, n,
    brier_micro) with brier_micro = 1e6·mean squared error — 0 is
    perfect, 250000 is the coin-flip-at-0.5 ceiling for balanced
    labels."""
    groups = list(group_cols or [])
    lab = _guard_label(label_col, "brier_score")
    s = F.col(score_ppm_col).cast("long")
    guarded = F.when(
        s.isNull() | (s < 0) | (s > PPM),
        F.raise_error("brier_score: score must be ppm in [0, 1e6]")
        .cast("long"),
    ).otherwise(s)
    per_score = (
        df.select(*[F.col(g) for g in groups], guarded.alias("_s"),
                  lab.alias("_y"))
        .groupBy(*groups, "_s")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_y").alias("_pos"))
    )
    # pos·(s−1e6)² overflows BIGINT once a single score LEVEL holds
    # > ~9.2e6 rows (a degenerate classifier can do that) — exact arm
    # below the cap, one IEEE double arm beyond, both floored to micro
    # per level before the order-free BIGINT sum and mirrored in SQL.
    level_cap = (2**63 - 1) // (PPM * PPM)
    term = F.when(
        F.col("_n") <= level_cap,
        F.expr(
            f"(_pos * (_s - {PPM}) * (_s - {PPM})"
            f" + (_n - _pos) * _s * _s) div {PPM}"
        ),
    ).otherwise(
        F.floor(
            (
                F.col("_pos").cast("double")
                * (F.col("_s") - PPM).cast("double")
                * (F.col("_s") - PPM).cast("double")
                + (F.col("_n") - F.col("_pos")).cast("double")
                * F.col("_s").cast("double")
                * F.col("_s").cast("double")
            )
            / PPM
        ).cast("long")
    )
    agg = per_score.withColumn("_t", term).groupBy(*groups).agg(
        F.sum("_n").alias("n"),
        F.sum("_t").alias("_tsum"),
    )
    return agg.select(
        *groups, "n", F.expr("_tsum div n").alias("brier_micro")
    )


def brier_oracle_sql(
    rows_sql: str,
    label_col: str,
    score_ppm_col: str,
    group_cols: list[str] | None = None,
) -> str:
    groups = list(group_cols or [])
    kc = "".join(f"{g}, " for g in groups)
    gby = "GROUP BY " + ", ".join(str(i + 1) for i in range(len(groups) + 1))
    gby2 = ("GROUP BY " + ", ".join(str(i + 1) for i in range(len(groups)))) if groups else ""
    return f"""
    WITH per_score AS (
        SELECT {kc}CAST({score_ppm_col} AS BIGINT) AS s,
               COUNT(*) AS n, CAST(SUM({label_col}) AS BIGINT) AS pos
        FROM ({rows_sql}) src {gby}
    ), terms AS (
        SELECT *, CASE WHEN n <= {(2**63 - 1) // (PPM * PPM)} THEN
                    (pos * (s - {PPM}) * (s - {PPM})
                     + (n - pos) * s * s) // {PPM}
                  ELSE
                    CAST(FLOOR((CAST(pos AS DOUBLE)
                        * CAST(s - {PPM} AS DOUBLE)
                        * CAST(s - {PPM} AS DOUBLE)
                        + CAST(n - pos AS DOUBLE)
                        * CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / {PPM}) AS BIGINT)
                  END AS t
        FROM per_score
    )
    SELECT {kc}CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(t) AS BIGINT) // CAST(SUM(n) AS BIGINT) AS brier_micro
    FROM terms {gby2}
    """
