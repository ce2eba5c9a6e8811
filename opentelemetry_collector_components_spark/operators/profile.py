"""Table profiling: per-column statistics in one scan.

The first thing anyone does with an unfamiliar 100 TB table — row count,
null share, distinct cardinality, value range per column — and the
input to everything downstream that needs stats (expectation thresholds
in ``validate.py``, drift baselines in ``drift.py``, broadcast-vs-shuffle
decisions).  The engineering constraint is ONE scan: a naive
per-column loop reads the table once per column.

``profile_table`` computes every column's stats in a single aggregate
row and unpivots driver-side (the wide row is one row — no second job).
Distinct counts come in two modes:

- ``exact=False`` (default): ``approx_count_distinct`` (HLL, ~2 % RSE) —
  all columns still ONE plain hash aggregate, the 100 TB mode;
- ``exact=True``: ``count_distinct`` per column — Spark plans multiple
  DISTINCT aggregates via an Expand (scan multiplied by #profiled
  columns before the shuffle); right for gate-sized data and for audits
  that need exact numbers, explicitly not the default.

Numeric min/max are emitted as DOUBLE (rounded 4 dp); other columns as
strings (binary collation in both engines).  NULL-only columns report
NULL bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """One row per profiled column:
    ``(column, n, nulls, distinct_n, min_num, max_num, min_str, max_str)``.
    """
    if cols is not None and not cols:
        raise ValueError("cols must be None (all) or non-empty")
    cols = cols or df.columns
    if not cols:
        raise ValueError("no columns to profile")
    types = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in types]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"_nulls_{c}")
        )
        d = F.count_distinct(col) if exact else F.approx_count_distinct(col)
        aggs.append(d.alias(f"_d_{c}"))
        if isinstance(types[c], NumericType):
            aggs.append(F.round(F.min(col).cast("double"), 4).alias(f"_mn_{c}"))
            aggs.append(F.round(F.max(col).cast("double"), 4).alias(f"_mx_{c}"))
        else:
            aggs.append(F.min(col).cast("string").alias(f"_mn_{c}"))
            aggs.append(F.max(col).cast("string").alias(f"_mx_{c}"))
    wide = df.agg(*aggs).collect()[0]  # ONE row — the unpivot is driver-side
    rows = []
    for c in cols:
        num = isinstance(types[c], NumericType)
        rows.append(
            (
                c,
                wide["_n"],
                wide[f"_nulls_{c}"],
                int(wide[f"_d_{c}"]),
                float(wide[f"_mn_{c}"]) if num and wide[f"_mn_{c}"] is not None else None,
                float(wide[f"_mx_{c}"]) if num and wide[f"_mx_{c}"] is not None else None,
                None if num else wide[f"_mn_{c}"],
                None if num else wide[f"_mx_{c}"],
            )
        )
    return df.sparkSession.createDataFrame(
        rows,
        "column string, n long, nulls long, distinct_n long, "
        "min_num double, max_num double, min_str string, max_str string",
    )


def concentration_stats(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
) -> DataFrame:
    """Whole-distribution concentration per group — the Gini coefficient
    and Lorenz top-shares of a weight across units ("3% of hosts emit
    80% of the logs"; "one user is half the traffic").  Complements
    ``partition.skew_report``, which names the individual heavy keys:
    this one scores HOW concentrated the whole distribution is, the
    number a capacity plan or an abuse review tracks over time.

    Input: one row per unit with a non-negative integer weight (arrive
    pre-aggregated: groupBy(unit).count() upstream).  Exact integer
    core (tie order among equal weights provably cannot change either
    sum):

        gini_num  = sum over ascending rank i of (2i - n - 1) * w_i
        gini      = gini_num / (n * total)            in [0, 1)
        top t     = ceil(n * num / den) units by weight
        share     = (sum of their weights) / total

    emitted as BIGINTs (gini_num, topXX_sum) beside rounded doubles.
    Groups with zero total weight are dropped (shares undefined).
    Negative weights raise (Lorenz/Gini are defined for non-negative
    mass).

    Output: (*key_cols, n BIGINT, total BIGINT, gini_num BIGINT,
    gini DOUBLE 6dp, top1pct_n, top1pct_sum, top1pct_share,
    top10pct_n, top10pct_sum, top10pct_share).

    Scale shape: one key-partitioned sort shared by the rank and the
    group totals; one partial-aggregated groupBy.  Overflow:
    n * max_weight * n under 9.2e18 — 1e6 units each up to 9e6 weight
    per group fits.
    """
    from pyspark.sql.window import Window

    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    w = (
        F.when(
            F.col(weight_col) < 0,
            F.raise_error("concentration_stats: negative weight").cast("long"),
        )
        .otherwise(F.col(weight_col))
        .cast("long")
    )
    win = Window.partitionBy(*key_cols).orderBy(F.col(weight_col).cast("long"))
    full = win.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = (
        df.withColumn("_w", w)
        .withColumn("_i", F.row_number().over(win).cast("long"))
        .withColumn("_n", F.count(F.lit(1)).over(full))
    )

    def top_cols(num: int, den: int, tag: str):
        t = F.expr(f"(_n * {num} + {den} - 1) div {den}")
        in_top = F.col("_i") > (F.col("_n") - t)
        return [
            F.max(t).cast("long").alias(f"{tag}_n"),
            F.sum(F.when(in_top, F.col("_w")).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"{tag}_sum"),
        ]

    agg = ranked.groupBy(*key_cols).agg(
        F.max("_n").cast("long").alias("n"),
        F.sum("_w").cast("long").alias("total"),
        F.sum((2 * F.col("_i") - F.col("_n") - 1) * F.col("_w"))
        .cast("long")
        .alias("gini_num"),
        *top_cols(1, 100, "top1pct"),
        *top_cols(1, 10, "top10pct"),
    )
    return agg.where(F.col("total") > 0).select(
        *key_cols,
        "n",
        "total",
        "gini_num",
        F.round(F.col("gini_num") / (F.col("n") * F.col("total")), 6).alias("gini"),
        "top1pct_n",
        "top1pct_sum",
        F.round(F.col("top1pct_sum") / F.col("total"), 6).alias("top1pct_share"),
        "top10pct_n",
        "top10pct_sum",
        F.round(F.col("top10pct_sum") / F.col("total"), 6).alias("top10pct_share"),
    )
