"""Isotonic (PAV) calibration — the standard monotone score→probability map.

``calibration_ece`` measures how mis-calibrated a classifier is;
isotonic regression FIXES it: fit the best monotone non-decreasing
probability curve to (score, label) pairs by pool-adjacent-violators
(Ayer et al. 1955; Zadrozny & Elkan, KDD 2002 for classifier
calibration) — the non-parametric calibrator that beats Platt scaling
once there is enough data, and the one with an exact integer form.

Exact arithmetic throughout: PAV pools carry (Σlabel, n) as BIGINTs;
the violation test between adjacent pools is the cross-product
comparison ``pos_a·n_b > pos_b·n_a`` (no fraction ever materializes),
and the calibrated probability for every score level inside a pool is
``(pool_pos·1e6) div pool_n``.  Both engines replay the identical
merge sequence: PAV's result is unique regardless of merge order, but
the oracle replays the same left-to-right discipline anyway — one
recursion step per PUSH (consume the next score level) or per MERGE
(collapse the top two pools while they violate), carried as a LIST of
pool structs (the Holt-Winters LIST-state trick; total steps ≤ 2L
since every merge permanently removes a pool).

Scale shape: the corpus-sized pass is ONE partial-aggregated
groupBy(group, score) — PAV itself runs per group on the ≤(distinct
scores) table via ``applyInPandas`` (quantized ppm scores bound it at
1e6+1 rows; real eval slices are far smaller), exactly the
``roc_auc``/``km_survival`` aggregated-fold discipline.  Overflow:
cross products are O(N²) → N < ~3e9 rows per group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def pav_pools(levels: list[tuple[int, int]]) -> list[tuple[int, int, int, int]]:
    """Pure-Python PAV over score-ascending (pos, n) levels: returns
    pools as (pos, n, lo_idx, hi_idx) with 1-based level indexes —
    exported for tests and for the streaming twin to reuse."""
    stack: list[list[int]] = []
    for i, (pos, n) in enumerate(levels, start=1):
        stack.append([pos, n, i, i])
        while len(stack) >= 2 and stack[-2][0] * stack[-1][1] > stack[-1][0] * stack[-2][1]:
            b = stack.pop()
            a = stack.pop()
            stack.append([a[0] + b[0], a[1] + b[1], a[2], b[3]])
    return [tuple(p) for p in stack]


def isotonic_calibrate(
    df: DataFrame,
    label_col: str,
    score_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group monotone calibration table: (*group_cols, s, n, pos,
    calibrated_ppm, pool_lo_s, pool_n) — one row per distinct score,
    ``calibrated_ppm`` non-decreasing in s within each group.  Apply
    downstream with a range join or a broadcast map.  Labels must be
    0/1 non-NULL; NULL scores raise (same contract as roc_auc)."""
    groups = list(group_cols or [])
    lab = F.col(label_col).cast("long")
    lab = F.when(
        lab.isNull() | ~lab.isin(0, 1),
        F.raise_error(f"isotonic_calibrate: {label_col} must be 0/1")
        .cast("long"),
    ).otherwise(lab)
    s = F.col(score_col).cast("long")
    s = F.when(
        s.isNull(),
        F.raise_error(f"isotonic_calibrate: NULL in {score_col}")
        .cast("long"),
    ).otherwise(s)
    levels = (
        df.select(*[F.col(g) for g in groups], s.alias("s"), lab.alias("_y"))
        .groupBy(*groups, "s")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_y").alias("pos"))
    )
    key_fields = [levels.schema[g] for g in groups]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in key_fields]
        + ["s long", "n long", "pos long", "calibrated_ppm long",
           "pool_lo_s long", "pool_n long"]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("s").reset_index(drop=True)
        lv = list(zip(pdf["pos"].astype(int), pdf["n"].astype(int)))
        rows = []
        for pos, n, lo, hi in pav_pools(lv):
            ppm = pos * PPM // n
            lo_s = int(pdf["s"].iloc[lo - 1])
            for i in range(lo, hi + 1):
                rows.append(
                    {
                        **{g: pdf[g].iloc[0] for g in groups},
                        "s": int(pdf["s"].iloc[i - 1]),
                        "n": int(pdf["n"].iloc[i - 1]),
                        "pos": int(pdf["pos"].iloc[i - 1]),
                        "calibrated_ppm": ppm,
                        "pool_lo_s": lo_s,
                        "pool_n": n,
                    }
                )
        return pd.DataFrame(rows)

    return levels.groupBy(*groups).applyInPandas(fold, out_schema)


def isotonic_oracle_sql(
    rows_sql: str,
    label_col: str,
    score_col: str,
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB replay: push/merge recursion over a LIST of pool structs.

    Each recursion step performs exactly one action — MERGE the top two
    pools when they violate monotonicity, else PUSH the next score
    level — so the recursion is linear and needs no inner loop; the
    final state per group is the max-step row, unnested back onto the
    levels."""
    groups = list(group_cols or [])
    kc = "".join(f"{g}, " for g in groups)
    kcb = "".join(f"b.{g}, " for g in groups)
    kcr = "".join(f"r.{g}, " for g in groups)
    part = ("PARTITION BY " + ", ".join(groups) + " ") if groups else ""
    gby = "GROUP BY " + ", ".join(
        str(i + 1) for i in range(len(groups) + 1)
    )
    join_g = " AND ".join([f"x.{g} = r.{g}" for g in groups] or ["TRUE"])
    join_gf = " AND ".join([f"l.{g} = p.{g}" for g in groups] or ["TRUE"])
    top = "r.stack[len(r.stack)]"
    sub = "r.stack[len(r.stack) - 1]"
    viol = (
        f"len(r.stack) >= 2 AND {sub}.pos * {top}.n > {top}.pos * {sub}.n"
    )
    merged = (
        f"{{'pos': {sub}.pos + {top}.pos, 'n': {sub}.n + {top}.n, "
        f"'lo': {sub}.lo, 'hi': {top}.hi}}"
    )
    return f"""
    WITH RECURSIVE levels AS (
        SELECT {kc}CAST({score_col} AS BIGINT) AS s,
               COUNT(*) AS n, CAST(SUM({label_col}) AS BIGINT) AS pos
        FROM ({rows_sql}) src {gby}
    ), idx AS (
        SELECT *, ROW_NUMBER() OVER ({part}ORDER BY s) AS rn,
               COUNT(*) OVER ({part}) AS L
        FROM levels
    ), rec AS (
        SELECT {kc}L, CAST(1 AS BIGINT) AS i, CAST(1 AS BIGINT) AS step,
               [{{'pos': pos, 'n': n, 'lo': rn, 'hi': rn}}] AS stack
        FROM idx WHERE rn = 1
        UNION ALL
        SELECT {kcr}r.L,
               CASE WHEN {viol} THEN r.i ELSE r.i + 1 END,
               r.step + 1,
               CASE WHEN {viol}
                    THEN r.stack[:len(r.stack) - 2] || [{merged}]
                    ELSE r.stack
                         || [{{'pos': x.pos, 'n': x.n, 'lo': x.rn,
                               'hi': x.rn}}]
               END
        FROM rec r LEFT JOIN idx x ON {join_g} AND x.rn = r.i + 1
        WHERE ({viol}) OR x.rn IS NOT NULL
    ), final AS (
        SELECT *, ROW_NUMBER() OVER ({part}ORDER BY step DESC) AS rr
        FROM rec
    ), pools AS (
        SELECT {kc}unnest(stack, recursive := true)
        FROM final WHERE rr = 1
    )
    SELECT {"".join(f"l.{g}, " for g in groups)}l.s, l.n, l.pos,
           (p.pos * {PPM}) // p.n AS calibrated_ppm,
           lo_l.s AS pool_lo_s,
           p.n AS pool_n
    FROM pools p
    JOIN idx l ON {join_gf.replace("p.", "p.").replace("l.", "l.")}
              AND l.rn BETWEEN p.lo AND p.hi
    JOIN idx lo_l ON {" AND ".join([f"lo_l.{g} = p.{g}" for g in groups] or ["TRUE"])}
              AND lo_l.rn = p.lo
    """
