"""Spearman rank correlation — monotone-dependence audit, exact ranks.

The numeric companion to ``mi.py`` (categorical dependence) and
``contingency.py`` (crosstab tests): does document quality rise with
length, does latency track payload size — monotone association that
Pearson-on-raw-values misses and outliers corrupt.  Spearman is
Pearson on RANKS with average-rank ties (Spearman 1904; the tie-aware
form is standard).

Exact construction, the ``roc_auc`` discipline: per-column ranks come
from the per-(group, value) AGGREGATED level table — doubled average
rank 2r = 2·before + cnt + 1 stays integral, and CENTERED doubled
ranks c = 2r − (n+1) make every first moment exactly zero, so

    rho = Σ cx·cy / sqrt(Σ cx² · Σ cy²)

with all three sums exact BIGINTs.  The single sqrt+division runs in
IEEE double on exact integer inputs — identical in both engines — and
floors to ppm.  Overflow: Σc² ≤ n³, Σ|cx·cy| ≤ n³, so BIGINT holds to
n ≈ 2·10⁶ rows per group; beyond that the operator RAISES with
guidance (rank correlation is a statistic — sample or pre-bucket the
slice; silently wrapped moments would be garbage).

Scale shape: two partial-agg groupBys build the per-value rank maps
(windows over the bounded level tables only), two joins attach ranks
to rows (broadcast when the value domains are small), one final
aggregate.  Ties anywhere — including a column with ONE distinct
value — degrade to NULL rho (zero variance), not an error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PPM = 1_000_000
MAX_ROWS = 2_000_000


def _rank_map(
    df: DataFrame, groups: list[str], col: str, out: str
) -> DataFrame:
    """(groups, col, centered doubled rank, n) for each distinct value."""
    lv = df.groupBy(*groups, col).agg(F.count(F.lit(1)).alias("_c"))
    w = Window.partitionBy(*groups).orderBy(col)
    wp = Window.partitionBy(*groups)
    return lv.select(
        *groups,
        col,
        (
            2 * F.coalesce(
                F.sum("_c").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            )
            + F.col("_c")
            + 1
            - (F.sum("_c").over(wp) + 1)
        ).alias(out),
    )


def spearman(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group tie-aware Spearman: (*group_cols, n, rho_ppm).  NULL
    x or y raises; a constant column yields NULL rho; groups over
    2,000,000 rows raise (see module docstring)."""
    groups = list(group_cols or [])

    def guard(c: str):
        col = F.col(c).cast("long")
        return F.when(
            col.isNull(),
            F.raise_error(f"spearman: NULL in {c}").cast("long"),
        ).otherwise(col)

    src = df.select(
        *[F.col(g) for g in groups],
        guard(x_col).alias("_x"),
        guard(y_col).alias("_y"),
    )
    xmap = _rank_map(src, groups, "_x", "_cx")
    ymap = _rank_map(src, groups, "_y", "_cy")
    joined = src.join(xmap, groups + ["_x"]).join(ymap, groups + ["_y"])
    agg = joined.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_cx") * F.col("_cy")).alias("_sxy"),
        F.sum(F.col("_cx") * F.col("_cx")).alias("_sxx"),
        F.sum(F.col("_cy") * F.col("_cy")).alias("_syy"),
    )
    checked = agg.select(
        *groups,
        F.when(
            F.col("n") > MAX_ROWS,
            F.raise_error(
                f"spearman: group exceeds {MAX_ROWS} rows — sample or "
                "pre-bucket (BIGINT moment bound)"
            ).cast("long"),
        ).otherwise(F.col("n")).alias("n"),
        "_sxy", "_sxx", "_syy",
    )
    rho = F.floor(
        F.col("_sxy").cast("double")
        / F.sqrt(F.col("_sxx").cast("double") * F.col("_syy").cast("double"))
        * PPM
    ).cast("long")
    return checked.select(
        *groups,
        "n",
        F.when((F.col("_sxx") > 0) & (F.col("_syy") > 0), rho).alias(
            "rho_ppm"
        ),
    )


def spearman_oracle_sql(
    rows_sql: str,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> str:
    groups = list(group_cols or [])
    kc = "".join(f"{g}, " for g in groups)
    part = ("PARTITION BY " + ", ".join(groups) + " ") if groups else ""
    gby = "GROUP BY " + ", ".join(str(i + 1) for i in range(len(groups) + 1))
    gby2 = ("GROUP BY " + ", ".join(str(i + 1) for i in range(len(groups)))) if groups else ""
    join_x = " AND ".join([f"s.{g} = xm.{g}" for g in groups] + ["s.x = xm.x"])
    join_y = " AND ".join([f"s.{g} = ym.{g}" for g in groups] + ["s.y = ym.y"])

    def level(col: str) -> str:
        return f"""
        SELECT {kc}{col},
               CAST(2 * COALESCE(SUM(c) OVER ({part}ORDER BY {col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + c + 1 - (SUM(c) OVER ({part}) + 1) AS BIGINT) AS c{col}
        FROM (
            SELECT {kc}{col}, COUNT(*) AS c
            FROM src {gby}
        ) lv
        """

    return f"""
    WITH src AS (
        SELECT {kc}CAST({x_col} AS BIGINT) AS x, CAST({y_col} AS BIGINT) AS y
        FROM ({rows_sql}) r0
    ), xm AS ({level("x")}), ym AS ({level("y")}),
    agg AS (
        SELECT {"".join(f"s.{g}, " for g in groups)}COUNT(*) AS n,
               CAST(SUM(xm.cx * ym.cy) AS BIGINT) AS sxy,
               CAST(SUM(xm.cx * xm.cx) AS BIGINT) AS sxx,
               CAST(SUM(ym.cy * ym.cy) AS BIGINT) AS syy
        FROM src s JOIN xm ON {join_x} JOIN ym ON {join_y}
        {gby2}
    )
    SELECT {kc}CAST(n AS BIGINT) AS n,
           CASE WHEN sxx > 0 AND syy > 0 THEN
             CAST(FLOOR(CAST(sxy AS DOUBLE)
                  / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE))
                  * {PPM}) AS BIGINT)
           END AS rho_ppm
    FROM agg
    """
