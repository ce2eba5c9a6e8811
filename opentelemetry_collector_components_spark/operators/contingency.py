"""Contingency-table independence: Pearson chi-square + Cramér's V.

The categorical-dependence screen beside ``mi.py`` (which answers "how
many bits do these columns share" in exact micro-nats): chi-square is
the classical TEST statistic reviewers expect on a crosstab — is
event-type dependent on hour bucket, does routing sink depend on
source — and Cramér's V (1946) normalizes it to [0, 1] so effect
sizes compare across table shapes.  ``benford.py`` carries the same
statistic hard-wired to first-digit bins; this operator is the general
two-column form.

Arithmetic, engine-exact by construction:

- per-cell inner term d = o·N − r·c stays BIGINT (|d| ≤ N², fine to
  N ≈ 3e9);
- the cell contribution 1e6·d²/(N·r·c) squares and divides in DOUBLE
  (d² and N·r·c overflow BIGINT long before N does) — one cast, one
  multiply, one divide, identical IEEE steps in both engines —
- and is TRUNCATED to integer micro per cell BEFORE summing, because
  a double Σ over cells would depend on aggregation order (hash-agg
  order differs between engines and between runs); the BIGINT sum is
  order-free.  Truncation perturbs chi2 by less than ±#cells micro
  (absent-cell mass is N − Σ floored e, so it can round either way) —
  negligible against any critical value, and deterministic.
- Cramér's V = sqrt(chi2 / (N·min(R−1, C−1))): one sqrt of an
  already-exact ratio, floored to micro.

Empty-ish tables (R = 1 or C = 1) have dof 0: chi2 is 0 by definition
and V is NULL (undefined normalization), not an error — a degenerate
slice in a per-slice sweep should report, not kill the job.

Scale shape: one partial-aggregated groupBy(a, b) to the ≤ R·C cell
table, marginals and totals from that table, arithmetic joined back on
the tiny frames — raw volume is touched exactly once (same shape as
``agreement.cohen_kappa``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def chi_square(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """One row: (n, n_rows_a, n_cols_b, dof, chi2_micro,
    cramers_v_micro).  NULL categories raise — crosstab cells must be
    real categories (map NULL to a sentinel upstream if it is one)."""

    def guard(c: str):
        col = F.col(c).cast("string")
        return F.when(
            col.isNull(),
            F.raise_error(f"chi_square: NULL in {c}").cast("string"),
        ).otherwise(col)

    cells = (
        df.select(guard(col_a).alias("_a"), guard(col_b).alias("_b"))
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_o"))
    )
    ra = cells.groupBy("_a").agg(F.sum("_o").alias("_r"))
    cb = cells.groupBy("_b").agg(F.sum("_o").alias("_c"))
    tot = cells.agg(
        F.sum("_o").alias("_n"),
        F.countDistinct("_a").alias("n_rows_a"),
        F.countDistinct("_b").alias("n_cols_b"),
    )
    joined = (
        cells.join(ra, "_a").join(cb, "_b").crossJoin(F.broadcast(tot))
    )
    # all (a, b) pairs with o = 0 contribute e = r·c/N each; expected
    # counts for ABSENT cells still belong in chi2.  Σ over absent
    # cells of e = N − Σ_present e, but the present-cell d-form already
    # accounts only for present cells — add the absent mass exactly:
    # chi2 = Σ_present (o−e)²/e + (N − Σ_present e).  The second term
    # uses the same per-cell truncation discipline via Σ_present e in
    # micro.
    d = F.col("_o") * F.col("_n") - F.col("_r") * F.col("_c")
    cell_micro = F.floor(
        F.lit(float(MICRO))
        * d.cast("double")
        * d.cast("double")
        / (
            F.col("_n").cast("double")
            * F.col("_r").cast("double")
            * F.col("_c").cast("double")
        )
    ).cast("long")
    e_micro = F.floor(
        F.lit(float(MICRO))
        * F.col("_r").cast("double")
        * F.col("_c").cast("double")
        / F.col("_n").cast("double")
    ).cast("long")
    agg = joined.groupBy("_n", "n_rows_a", "n_cols_b").agg(
        F.sum(cell_micro).alias("_present_micro"),
        F.sum(e_micro).alias("_e_present_micro"),
    )
    chi2 = (
        F.col("_present_micro")
        + F.col("_n") * MICRO
        - F.col("_e_present_micro")
    )
    dof = (F.col("n_rows_a") - 1) * (F.col("n_cols_b") - 1)
    mindim = F.least(F.col("n_rows_a"), F.col("n_cols_b")) - 1
    v = F.floor(
        F.lit(float(MICRO))
        * F.sqrt(
            chi2.cast("double")
            / F.lit(float(MICRO))
            / (F.col("_n").cast("double") * mindim.cast("double"))
        )
    ).cast("long")
    return agg.select(
        F.col("_n").alias("n"),
        "n_rows_a",
        "n_cols_b",
        dof.cast("long").alias("dof"),
        chi2.cast("long").alias("chi2_micro"),
        F.when(mindim > 0, v).alias("cramers_v_micro"),
    )


def chi_square_oracle_sql(rows_sql: str, col_a: str, col_b: str) -> str:
    """DuckDB replay: identical per-cell truncation, identical doubles."""
    return f"""
    WITH cells AS (
        SELECT CAST({col_a} AS VARCHAR) AS a, CAST({col_b} AS VARCHAR) AS b,
               COUNT(*) AS o
        FROM ({rows_sql}) src GROUP BY 1, 2
    ), ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
       cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
    tot AS (
        SELECT CAST(SUM(o) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT a) AS BIGINT) AS n_rows_a,
               CAST(COUNT(DISTINCT b) AS BIGINT) AS n_cols_b
        FROM cells
    ), agg AS (
        SELECT n, n_rows_a, n_cols_b,
               CAST(SUM(CAST(FLOOR({MICRO}.0
                   * CAST(o * n - r * c AS DOUBLE)
                   * CAST(o * n - r * c AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)
                      * CAST(c AS DOUBLE))) AS BIGINT)) AS BIGINT)
                   AS present_micro,
               CAST(SUM(CAST(FLOOR({MICRO}.0 * CAST(r AS DOUBLE)
                   * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT))
                   AS BIGINT) AS e_present_micro
        FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot
        GROUP BY 1, 2, 3
    )
    SELECT n, n_rows_a, n_cols_b,
           (n_rows_a - 1) * (n_cols_b - 1) AS dof,
           present_micro + n * {MICRO} - e_present_micro AS chi2_micro,
           CASE WHEN LEAST(n_rows_a, n_cols_b) - 1 > 0 THEN
             CAST(FLOOR({MICRO}.0 * sqrt(
               CAST(present_micro + n * {MICRO} - e_present_micro AS DOUBLE)
               / {MICRO}.0
               / (CAST(n AS DOUBLE)
                  * CAST(LEAST(n_rows_a, n_cols_b) - 1 AS DOUBLE))))
             AS BIGINT)
           END AS cramers_v_micro
    FROM agg
    """
