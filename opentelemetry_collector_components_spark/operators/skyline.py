"""Skyline / Pareto frontier: rows no other row dominates.

The multi-criteria shortlist operator (Borzsony/Kossmann/Stocker, ICDE
2001): "cheapest AND closest hotels", "highest-quality AND
least-duplicated sources", "most-traffic AND fewest-errors hosts".  A
row is dominated when some other row is at least as good on EVERY
criterion and strictly better on at least one; the skyline is the
undominated set — exactly the rows a weighted score might unfairly
drop, whatever the weights.

Distributed shape (the standard two-phase argument, same family as
``partition.two_phase_top_n``): a global skyline row survives ANY
subset's local skyline, so phase 1 prunes each Arrow batch to its
local frontier (vectorized numpy dominance, Python touches candidate
batches only), and phase 2 settles exactness with one dominance
anti-join among the surviving candidates.  Phase-2 cost is quadratic
in the FRONTIER size, not the input — data-dependent by nature
(anti-correlated criteria inflate frontiers; that is the operator's
honest complexity, not an implementation artifact).

Ties: identical criterion vectors dominate nobody, so duplicates all
survive — callers wanting one representative per point dedupe first.
Criterion columns must be non-null numerics; NULL rows are rejected
loudly (a NULL is not comparable, and silently dropping it would turn
the audit into a lie).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_frontier(
    pdf: pd.DataFrame, cols: list[str], signs: list[int]
) -> pd.DataFrame:
    import numpy as np

    m = pdf[cols].to_numpy(dtype="float64") * np.asarray(signs, dtype="float64")
    n = m.shape[0]
    keep = np.ones(n, dtype=bool)
    # vectorized pairwise dominance, row-chunked to bound memory
    chunk = max(1, 2_000_000 // max(n, 1))
    for s in range(0, n, chunk):
        block = m[s : s + chunk]  # (c, d)
        ge = (m[None, :, :] >= block[:, None, :]).all(axis=2)  # o >= b
        gt = (m[None, :, :] > block[:, None, :]).any(axis=2)
        dominated = (ge & gt).any(axis=1)
        keep[s : s + chunk] &= ~dominated
    return pdf[keep]


def skyline(
    df: DataFrame,
    maximize: list[str] | None = None,
    minimize: list[str] | None = None,
) -> DataFrame:
    """Undominated rows of ``df`` under the given criteria.  All other
    columns pass through untouched."""
    maximize = list(maximize or [])
    minimize = list(minimize or [])
    cols = maximize + minimize
    if not cols:
        raise ValueError("at least one criterion column is required")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate criterion columns in {cols}")
    signs = [1] * len(maximize) + [-1] * len(minimize)
    null_rows = df.where(
        F.greatest(*[F.col(c).isNull() for c in cols])
        if len(cols) > 1
        else F.col(cols[0]).isNull()
    ).limit(1).count()
    if null_rows:
        raise ValueError(
            f"criterion columns {cols} contain NULLs — not comparable"
        )

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _local_frontier(pdf, cols, signs)

    cand = df.mapInPandas(prune, df.schema)
    a = cand.alias("a")
    b = cand.alias("b")
    ge = None
    gt = None
    for c, s in zip(cols, signs):
        bc, ac = F.col(f"b.{c}") * s, F.col(f"a.{c}") * s
        ge = (bc >= ac) if ge is None else ge & (bc >= ac)
        gt = (bc > ac) if gt is None else gt | (bc > ac)
    return a.join(b, ge & gt, "left_anti")
