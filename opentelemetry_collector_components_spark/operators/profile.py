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
