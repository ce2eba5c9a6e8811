"""Inter-annotator agreement — Cohen's and Fleiss' kappa, exact ppm.

The label-quality audit a training-data pipeline runs before trusting
any labeled slice: when two labeling passes (a human pass vs the
``classifier.py`` filter, an old heuristic vs a new one, two crowd
raters) disagree beyond chance-corrected noise, the downstream eval
(``evalmetrics.py``) is grading against sand.  Cohen (1960) handles
exactly two raters; Fleiss (1971) generalizes to n ratings per item
from interchangeable raters.

Both statistics are ratios of small exact aggregates, so the repo's
integer discipline applies end to end:

- Cohen:  kappa = (po − pe) / (1 − pe) with po = agree/N and
  pe = Σ_k a_k·b_k / N².  Clearing denominators:
  kappa_ppm = 1e6·(N·agree − Σ a_k b_k) div (N² − Σ a_k b_k).

- Fleiss:  with n ratings per item, N items, S = Σ_i Σ_k n_ik² and
  column totals c_k (Σ c_k = Nn):
  kappa = [ Nn·(S − Nn) − (n−1)·Σ c_k² ]
        / [ (n−1)·( (Nn)² − Σ c_k² ) ]  — the standard
  (P̄ − P̄e)/(1 − P̄e) with both sides multiplied by (Nn)²·n(n−1).
  Items must carry exactly n ratings — a ragged panel raises loudly
  rather than silently reweighting.

Overflow: the Σ-products are O(N²), so the final ×1e6 leaves pure
BIGINT around N ≈ 3e6 — every ppm ratio therefore guards like
``evalmetrics.roc_auc``: the `div` arm while |num|·1e6 fits 2^63, one
IEEE double division beyond (both engines cast and divide a single
pair identically; the double arm floors where the int arm truncates —
irrelevant to parity because BOTH engines take the same arm).  The
intrinsic ceiling is the O(N²) aggregates themselves: N < ~3e9 for
Cohen, N·n·√n < ~3e9 for Fleiss; past that, subsample the audit slice
(kappa is a statistic, not a ledger).

Interpretation bands (Landis & Koch 1977): <0 poor, 0–0.2 slight,
0.2–0.4 fair, 0.4–0.6 moderate, 0.6–0.8 substantial, >0.8 almost
perfect — returned as a column so dashboards need no lookup table.

Scale shape: Cohen is ONE partial-aggregated groupBy over the paired
slice (per-(label_a, label_b) cells) then arithmetic on the ≤K² cell
table; Fleiss is one groupBy(item, label) count, one Σn² aggregate,
one K-row column-total aggregate — nothing driver-side, no window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000
_INT_CAP = (2**63 - 1) // PPM


def _ppm_ratio(num_expr: str, den_expr: str) -> Column:
    """floor-ish(1e6·num/den) with the shared overflow guard: exact
    BIGINT ``div`` while |num|·1e6 fits, one IEEE double division
    beyond.  Mirrored textually by ``_ppm_ratio_sql``."""
    num = F.expr(num_expr)
    den = F.expr(den_expr)
    return F.when(
        F.abs(num) <= _INT_CAP,
        F.expr(f"(({num_expr}) * {PPM}) div ({den_expr})"),
    ).otherwise(
        F.floor(num.cast("double") / den.cast("double") * PPM).cast("long")
    )


def _ppm_ratio_sql(num: str, den: str) -> str:
    return (
        f"CASE WHEN abs({num}) <= {_INT_CAP} "
        f"THEN (({num}) * {PPM}) // ({den}) "
        f"ELSE CAST(floor(CAST(({num}) AS DOUBLE) / CAST(({den}) AS DOUBLE)"
        f" * {PPM}) AS BIGINT) END"
    )


def _band(kappa_ppm: Column) -> Column:
    return (
        F.when(kappa_ppm.isNull(), F.lit(None).cast("string"))
        .when(kappa_ppm < 0, "poor")
        .when(kappa_ppm <= 200000, "slight")
        .when(kappa_ppm <= 400000, "fair")
        .when(kappa_ppm <= 600000, "moderate")
        .when(kappa_ppm <= 800000, "substantial")
        .otherwise("almost_perfect")
    )


def cohen_kappa(
    df: DataFrame, label_a_col: str, label_b_col: str
) -> DataFrame:
    """Chance-corrected two-rater agreement over paired labels:
    one row (n_items, po_ppm, pe_ppm, kappa_ppm, band).  NULL labels
    raise — an unlabeled item does not belong in an agreement slice.
    Perfect chance agreement (pe = 1: both raters constant and equal)
    yields NULL kappa (undefined 0/0), not a fake 1.0."""

    def guard(c: str) -> Column:
        col = F.col(c).cast("string")
        return F.when(
            col.isNull(),
            F.raise_error(f"cohen_kappa: NULL in {c}").cast("string"),
        ).otherwise(col)

    cells = (
        df.select(guard(label_a_col).alias("_a"), guard(label_b_col).alias("_b"))
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    # Σ a_k·b_k needs full marginals: build both from the cell table
    # (≤ K² rows), cross-multiplied via an inner join on the label.
    marg_a = cells.groupBy("_a").agg(F.sum("_n").alias("_na"))
    marg_b = cells.groupBy("_b").agg(F.sum("_n").alias("_nb"))
    chance = (
        marg_a.join(marg_b, marg_a["_a"] == marg_b["_b"], "inner")
        .agg(F.sum(F.col("_na") * F.col("_nb")).alias("_sab"))
    )
    totals = cells.agg(
        F.sum("_n").alias("n_items"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_n")).otherwise(0))
        .alias("_agree"),
    )
    staged = totals.crossJoin(chance).select(
        "n_items",
        "_agree",
        F.coalesce("_sab", F.lit(0)).alias("_sab"),
    )
    return staged.select(
        "n_items",
        _ppm_ratio("_agree", "n_items").alias("po_ppm"),
        _ppm_ratio("_sab", "n_items * n_items").alias("pe_ppm"),
        F.when(
            F.expr("n_items * n_items - _sab") > 0,
            _ppm_ratio(
                "n_items * _agree - _sab", "n_items * n_items - _sab"
            ),
        ).alias("kappa_ppm"),
    ).withColumn("band", _band(F.col("kappa_ppm")))


def cohen_kappa_oracle_sql(
    rows_sql: str, label_a_col: str, label_b_col: str
) -> str:
    kappa = _ppm_ratio_sql(
        "n_items * agree - sab", "n_items * n_items - sab"
    )
    return f"""
    WITH cells AS (
        SELECT CAST({label_a_col} AS VARCHAR) AS a,
               CAST({label_b_col} AS VARCHAR) AS b,
               COUNT(*) AS n
        FROM ({rows_sql}) src GROUP BY 1, 2
    ), ma AS (SELECT a, SUM(n) AS na FROM cells GROUP BY 1),
       mb AS (SELECT b, SUM(n) AS nb FROM cells GROUP BY 1),
    chance AS (
        SELECT COALESCE(CAST(SUM(na * nb) AS BIGINT), 0) AS sab
        FROM ma JOIN mb ON ma.a = mb.b
    ), totals AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_items,
               CAST(SUM(CASE WHEN a = b THEN n ELSE 0 END) AS BIGINT) AS agree
        FROM cells
    ), staged AS (
        SELECT n_items,
               {_ppm_ratio_sql("agree", "n_items")} AS po_ppm,
               {_ppm_ratio_sql("sab", "n_items * n_items")} AS pe_ppm,
               CASE WHEN n_items * n_items - sab > 0
                    THEN {kappa} END AS kappa_ppm
        FROM totals CROSS JOIN chance
    )
    SELECT n_items, po_ppm, pe_ppm, kappa_ppm,
           CASE WHEN kappa_ppm IS NULL THEN NULL
                WHEN kappa_ppm < 0 THEN 'poor'
                WHEN kappa_ppm <= 200000 THEN 'slight'
                WHEN kappa_ppm <= 400000 THEN 'fair'
                WHEN kappa_ppm <= 600000 THEN 'moderate'
                WHEN kappa_ppm <= 800000 THEN 'substantial'
                ELSE 'almost_perfect' END AS band
    FROM staged
    """


def fleiss_kappa(
    df: DataFrame, item_col: str, label_col: str
) -> DataFrame:
    """Fleiss' kappa over (item, label) rating rows — one row per
    RATING, n rows per item.  Output: one row (n_items, n_raters,
    pbar_ppm, pe_ppm, kappa_ppm, band).  Raises when items carry
    unequal rating counts (interchangeable-rater kappa is undefined on
    ragged panels — subsample upstream instead)."""
    ratings = df.select(
        F.col(item_col).alias("_i"),
        F.when(
            F.col(label_col).isNull(),
            F.raise_error("fleiss_kappa: NULL label").cast("string"),
        ).otherwise(F.col(label_col).cast("string")).alias("_k"),
    )
    per_cell = ratings.groupBy("_i", "_k").agg(
        F.count(F.lit(1)).alias("_nik")
    )
    per_item = per_cell.groupBy("_i").agg(
        F.sum("_nik").alias("_n"),
        F.sum(F.col("_nik") * F.col("_nik")).alias("_s2"),
    )
    ragged = per_item.agg(
        F.countDistinct("_n").alias("_d"),
        F.min("_n").alias("_n0"),
        F.count(F.lit(1)).alias("n_items"),
        F.sum("_s2").alias("_s"),
    ).select(
        F.when(
            F.col("_d") > 1,
            F.raise_error(
                "fleiss_kappa: unequal ratings per item"
            ).cast("long"),
        ).otherwise(F.col("_n0")).alias("n_raters"),
        "n_items",
        "_s",
    )
    col_tot = per_cell.groupBy("_k").agg(F.sum("_nik").alias("_ck")).agg(
        F.sum(F.col("_ck") * F.col("_ck")).alias("_c2")
    )
    staged = ragged.crossJoin(col_tot)
    # kappa = [Nn(S − Nn) − (n−1)Σc²] / [(n−1)((Nn)² − Σc²)]
    return staged.select(
        "n_items",
        "n_raters",
        F.when(
            F.expr("n_raters > 1"),
            _ppm_ratio(
                "_s - n_items * n_raters",
                "n_items * n_raters * (n_raters - 1)",
            ),
        ).alias("pbar_ppm"),
        _ppm_ratio(
            "_c2", "(n_items * n_raters) * (n_items * n_raters)"
        ).alias("pe_ppm"),
        F.when(
            F.expr(
                "n_raters > 1 AND "
                "(n_items * n_raters) * (n_items * n_raters) - _c2 > 0"
            ),
            _ppm_ratio(
                "n_items * n_raters * (_s - n_items * n_raters)"
                " - (n_raters - 1) * _c2",
                "(n_raters - 1) * ((n_items * n_raters)"
                " * (n_items * n_raters) - _c2)",
            ),
        ).alias("kappa_ppm"),
    ).withColumn("band", _band(F.col("kappa_ppm")))


def fleiss_kappa_oracle_sql(rows_sql: str, item_col: str, label_col: str) -> str:
    kappa = _ppm_ratio_sql(
        "n_items * n_raters * (s - n_items * n_raters) - (n_raters - 1) * c2",
        "(n_raters - 1) * ((n_items * n_raters) * (n_items * n_raters) - c2)",
    )
    return f"""
    WITH per_cell AS (
        SELECT {item_col} AS i, CAST({label_col} AS VARCHAR) AS k,
               COUNT(*) AS nik
        FROM ({rows_sql}) src GROUP BY 1, 2
    ), per_item AS (
        SELECT i, CAST(SUM(nik) AS BIGINT) AS n,
               CAST(SUM(nik * nik) AS BIGINT) AS s2
        FROM per_cell GROUP BY 1
    ), tot AS (
        SELECT MIN(n) AS n_raters, COUNT(*) AS n_items,
               CAST(SUM(s2) AS BIGINT) AS s
        FROM per_item
    ), cols AS (
        SELECT CAST(SUM(ck * ck) AS BIGINT) AS c2
        FROM (SELECT k, SUM(nik) AS ck FROM per_cell GROUP BY 1)
    ), staged AS (
        SELECT n_items, CAST(n_raters AS BIGINT) AS n_raters,
               CASE WHEN n_raters > 1 THEN
                 {_ppm_ratio_sql("s - n_items * n_raters",
                                 "n_items * n_raters * (n_raters - 1)")}
               END AS pbar_ppm,
               {_ppm_ratio_sql("c2",
                               "(n_items * n_raters) * (n_items * n_raters)")}
                 AS pe_ppm,
               CASE WHEN n_raters > 1 AND
                         (n_items * n_raters) * (n_items * n_raters) - c2 > 0
                    THEN {kappa} END AS kappa_ppm
        FROM tot CROSS JOIN cols
    )
    SELECT n_items, n_raters, pbar_ppm, pe_ppm, kappa_ppm,
           CASE WHEN kappa_ppm IS NULL THEN NULL
                WHEN kappa_ppm < 0 THEN 'poor'
                WHEN kappa_ppm <= 200000 THEN 'slight'
                WHEN kappa_ppm <= 400000 THEN 'fair'
                WHEN kappa_ppm <= 600000 THEN 'moderate'
                WHEN kappa_ppm <= 800000 THEN 'substantial'
                ELSE 'almost_perfect' END AS band
    FROM staged
    """


def _kripp_lcm(max_ratings: int) -> int:
    import math

    return math.lcm(*range(1, max_ratings))


def krippendorff_alpha(
    df: DataFrame,
    item_col: str,
    label_col: str,
    max_ratings: int = 13,
) -> DataFrame:
    """Krippendorff's alpha (nominal metric; Krippendorff 2004) — the
    agreement coefficient for RAGGED panels: any number of raters, any
    number of ratings per item, missing ratings allowed.  Cohen needs
    exactly two raters, Fleiss a constant n per item; real crowd-label
    slices have neither, which is why alpha is the reliability number
    content-analysis actually reports.

    Coincidence-matrix nominal form with per-item pair weights
    1/(m_i - 1) cleared exactly: items with m_i ratings contribute
    d_i = m_i^2 - sum_c n_ic^2 disagreeing ordered pairs, and

        alpha = 1 - (n-1) * [sum_i d_i/(m_i-1)] / (n^2 - sum_c n_c^2)

    where n and the marginals n_c count only USABLE items (m_i >= 2;
    singletons carry no pair information and are dropped, the standard
    rule).  Multiplying through by L = lcm(1..max_ratings-1) makes
    every term BIGINT-exact — (m_i - 1) divides L by construction —
    so the oracle replays integer-for-integer; the final ppm ratio
    rides the shared ``_ppm_ratio`` guard.  Items with more than
    ``max_ratings`` ratings raise (bump the parameter: L and the
    n <= sqrt(2^63/L/1e6)-ish headroom shrink as it grows); NULL
    labels raise; all-one-label slices (expected disagreement 0)
    yield NULL alpha.

    Output: one row (n_ratings, n_items, alpha_ppm, band).

    Scale shape: one groupBy(item, label) count, one per-item
    aggregate, one label-marginal aggregate over usable items — no
    windows, nothing driver-side."""
    if max_ratings < 3:
        raise ValueError("max_ratings must be >= 3")
    L = _kripp_lcm(max_ratings)
    n_cap = int((2**62 // L) ** 0.5)
    lbl = F.col(label_col).cast("string")
    src = df.select(
        F.col(item_col).alias("_i"),
        F.when(
            lbl.isNull(),
            F.raise_error(f"krippendorff_alpha: NULL in {label_col}").cast(
                "string"
            ),
        ).otherwise(lbl).alias("_l"),
    )
    cnt = src.groupBy("_i", "_l").agg(F.count(F.lit(1)).alias("_n"))
    items = cnt.groupBy("_i").agg(
        F.sum("_n").alias("_m"), F.sum(F.col("_n") * F.col("_n")).alias("_sq")
    )
    usable = items.where(F.col("_m") >= 2).select(
        "_i",
        F.when(
            F.col("_m") > max_ratings,
            F.raise_error(
                f"krippendorff_alpha: an item exceeds max_ratings="
                f"{max_ratings} — raise the parameter (L grows as lcm)"
            ).cast("long"),
        ).otherwise(F.col("_m")).alias("_m"),
        "_sq",
    )
    per_item = usable.agg(
        F.sum(
            (F.col("_m") * F.col("_m") - F.col("_sq"))
            * F.expr(f"{L} div (_m - 1)")
        ).alias("_a"),
        F.coalesce(F.sum("_m"), F.lit(0)).cast("long").alias("n_ratings"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    marg = (
        cnt.join(usable.select("_i"), "_i")
        .groupBy("_l")
        .agg(F.sum("_n").alias("_nc"))
        .agg(F.sum(F.col("_nc") * F.col("_nc")).alias("_sc"))
    )
    staged = per_item.crossJoin(marg).select(
        F.when(
            F.col("n_ratings") > n_cap,
            F.raise_error(
                f"krippendorff_alpha: more than {n_cap} usable ratings — "
                "subsample the audit slice (BIGINT bound n^2*L)"
            ).cast("long"),
        ).otherwise(F.col("n_ratings")).alias("n_ratings"),
        "n_items",
        F.coalesce("_a", F.lit(0)).alias("_a"),
        F.coalesce("_sc", F.lit(0)).alias("_sc"),
    )
    de = "(n_ratings * n_ratings - _sc)"
    return staged.select(
        "n_ratings",
        "n_items",
        F.when(
            F.expr(de) > 0,
            _ppm_ratio(
                f"{de} * {L} - (n_ratings - 1) * _a", f"{de} * {L}"
            ),
        ).alias("alpha_ppm"),
    ).withColumn("band", _band(F.col("alpha_ppm")))


def krippendorff_oracle_sql(
    rows_sql: str,
    item_col: str,
    label_col: str,
    max_ratings: int = 13,
) -> str:
    """DuckDB replay of ``krippendorff_alpha``: identical level tables,
    identical L-scaled integers, shared ppm-ratio text."""
    L = _kripp_lcm(max_ratings)
    de = "(n_ratings * n_ratings - sc)"
    alpha = _ppm_ratio_sql(
        f"{de} * {L} - (n_ratings - 1) * a", f"{de} * {L}"
    )
    return f"""
    WITH cnt AS (
        SELECT {item_col} AS i, CAST({label_col} AS VARCHAR) AS l,
               COUNT(*) AS n
        FROM ({rows_sql}) src GROUP BY 1, 2
    ),
    items AS (
        SELECT i, SUM(n) AS m, SUM(n * n) AS sq FROM cnt GROUP BY i
    ),
    usable AS (SELECT i, m, sq FROM items WHERE m >= 2),
    per_item AS (
        SELECT CAST(COALESCE(SUM((m * m - sq) * ({L} // (m - 1))), 0)
                   AS BIGINT) AS a,
               CAST(COALESCE(SUM(m), 0) AS BIGINT) AS n_ratings,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM usable
    ),
    marg AS (
        SELECT CAST(COALESCE(SUM(nc * nc), 0) AS BIGINT) AS sc FROM (
            SELECT c.l, SUM(c.n) AS nc
            FROM cnt c JOIN usable u ON c.i = u.i GROUP BY c.l
        ) t
    ),
    staged AS (
        SELECT n_ratings, n_items, a, sc FROM per_item CROSS JOIN marg
    )
    SELECT n_ratings, n_items,
           CASE WHEN {de} > 0 THEN {alpha} END AS alpha_ppm,
           CASE WHEN (CASE WHEN {de} > 0 THEN {alpha} END) IS NULL THEN NULL
                WHEN (CASE WHEN {de} > 0 THEN {alpha} END) < 0 THEN 'poor'
                WHEN (CASE WHEN {de} > 0 THEN {alpha} END) <= 200000 THEN 'slight'
                WHEN (CASE WHEN {de} > 0 THEN {alpha} END) <= 400000 THEN 'fair'
                WHEN (CASE WHEN {de} > 0 THEN {alpha} END) <= 600000 THEN 'moderate'
                WHEN (CASE WHEN {de} > 0 THEN {alpha} END) <= 800000 THEN 'substantial'
                ELSE 'almost_perfect' END AS band
    FROM staged
    """
