"""Exact quantiles with bounded memory — no global sort.

The naive exact quantile sorts the whole column (a full-range shuffle —
the single most expensive plan shape at 100 TB); the usual escape is an
approximate sketch (``approx_percentile``/KLL) that trades error bounds
for memory.  This operator gets EXACT answers at sketch-like cost by
iterative range narrowing (the classic distributed k-th-element
algorithm): each round histograms the surviving value range into B
buckets with ONE aggregation job (all requested quantiles share the
job), finds the bucket containing the k-th element from exact counts,
and recurses into it.  The candidate range shrinks ~B x per round, so a
double-precision domain collapses in a handful of rounds; once a
quantile's surviving range holds <= ``final_threshold`` rows, its
element is fetched with a TakeOrderedAndProject (driver holds
<= threshold rows, never the column).

Exactness argument: every range bound the algorithm carries is an
ACTUAL DATA VALUE (the chosen bucket's min/max, aggregated in the same
histogram job), never a synthetic float boundary.  Bucket assignment
floor((v - lo) / width) is monotone nondecreasing in v, so a bucket's
member set is exactly { v : min_b <= v <= max_b } — the next round's
range predicate reproduces the counted set bit-for-bit no matter how
the division rounds.  Bucket counts are exact integers; ties and
duplicates fall out of the same argument (a bucket whose min == max is
resolved immediately, to a data value).  The companion bounded-memory
operator for heavy hitters is ``partition.frequent_items_verified``.

Semantics match SQL ``quantile_disc``/``percentile_disc`` (verified
against DuckDB): the k-th smallest non-null value with
k = clamp(ceil(q * n), 1, n).  NULLs are ignored, like the SQL
aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    buckets: int = 512,
    final_threshold: int = 50_000,
    max_rounds: int = 12,
) -> DataFrame:
    """Exact discrete quantiles of ``value_col`` for each q in ``qs``.
    Returns a tiny DataFrame (quantile double, value <input type>).

    Cost: one min/max/count job, then one shared histogram job per round
    (shuffle is |qs| x buckets count rows — nothing), then one bounded
    top-k job per quantile.  The input is scanned ~rounds + 2 times with
    the value column pruned; persist upstream if the scan is expensive.
    """
    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    vals = df.select(F.col(value_col).alias("v")).where(F.col("v").isNotNull())
    head = vals.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("v").alias("n")
    ).collect()[0]
    n = head["n"]
    if n == 0:
        raise ValueError(f"no non-null values in {value_col!r}")

    # state per quantile: the k-th smallest member of [lo, hi] (both
    # bounds actual data values), in_range = exact member count
    state = {
        q: {
            "k": min(n, max(1, math.ceil(q * n))),
            "lo": head["lo"],
            "hi": head["hi"],
            "in_range": n,
        }
        for q in qs
    }
    resolved: dict[float, object] = {}
    for q, s in state.items():
        if s["lo"] == s["hi"]:
            resolved[q] = s["lo"]  # single distinct value

    for _ in range(max_rounds):
        live = sorted(
            (q, s)
            for q, s in state.items()
            if q not in resolved and s["in_range"] > final_threshold
        )
        if not live:
            break
        # float-plateau guard: when (hi - lo) / buckets underflows to 0.0
        # (bounds a few ULPs apart, e.g. [0.0, 5e-324]), the range holds
        # at most a handful of representable doubles — subdividing would
        # divide by zero.  Resolve exactly from per-distinct-value counts
        # (a tiny bounded job: <= ~buckets distinct values by construction).
        for q, s in live:
            if (float(s["hi"]) - float(s["lo"])) / buckets > 0.0:
                continue
            in_r = (F.col("v") >= F.lit(s["lo"])) & (F.col("v") <= F.lit(s["hi"]))
            k = s["k"]
            for r in (
                vals.where(in_r)
                .groupBy("v")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .orderBy("v")
                .collect()
            ):
                if k <= r["cnt"]:
                    resolved[q] = r["v"]
                    break
                k -= r["cnt"]
        live = [(q, s) for q, s in live if q not in resolved]
        if not live:
            break
        # one shared job: per (quantile, bucket) exact counts AND the
        # bucket's actual min/max member values (the next round's bounds)
        entries = []
        for i, (q, s) in enumerate(live):
            width = (float(s["hi"]) - float(s["lo"])) / buckets
            in_r = (F.col("v") >= F.lit(s["lo"])) & (F.col("v") <= F.lit(s["hi"]))
            b = F.when(
                in_r,
                F.greatest(
                    F.lit(0),
                    F.least(
                        F.lit(buckets - 1),
                        F.floor(
                            (F.col("v") - F.lit(s["lo"])) / F.lit(width)
                        ).cast("int"),
                    ),
                ),
            )
            entries.append(F.struct(F.lit(i).alias("qi"), b.alias("b")))
        hist = {
            (r["qi"], r["b"]): (r["cnt"], r["b_min"], r["b_max"])
            for r in vals.select(
                F.explode(F.array(*entries)).alias("e"), F.col("v")
            )
            .select("e.qi", "e.b", "v")
            .where(F.col("b").isNotNull())
            .groupBy("qi", "b")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.min("v").alias("b_min"),
                F.max("v").alias("b_max"),
            )
            .collect()
        }
        progressed = False
        for i, (q, s) in enumerate(live):
            k = s["k"]
            for bi in range(buckets):
                c, b_min, b_max = hist.get((i, bi), (0, None, None))
                if k <= c:
                    if b_min == b_max:
                        resolved[q] = b_min  # all members equal: exact
                    elif c < s["in_range"] or b_min != s["lo"] or b_max != s["hi"]:
                        progressed = True
                    state[q] = {"k": k, "lo": b_min, "hi": b_max, "in_range": c}
                    break
                k -= c
        if not progressed and not any(q in resolved for q, _ in live):
            break  # degenerate float plateau: fall through to final fetch

    # bounded final fetch: k-th smallest within the narrowed member set
    out_rows = []
    for q in qs:
        if q in resolved:
            out_rows.append((float(q), resolved[q]))
            continue
        s = state[q]
        got = (
            vals.where((F.col("v") >= F.lit(s["lo"])) & (F.col("v") <= F.lit(s["hi"])))
            .orderBy("v")
            .limit(s["k"])
            .agg(F.max("v").alias("v"))
            .collect()[0]["v"]
        )
        out_rows.append((float(q), got))
    vtype = df.schema[value_col].dataType.simpleString()
    return df.sparkSession.createDataFrame(
        out_rows, schema=f"quantile double, `value` {vtype}"
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs: list[float],
    buckets: int = 512,
    final_threshold: int = 50_000,
    max_rounds: int = 12,
) -> DataFrame:
    """Exact WEIGHTED discrete quantiles — same iterative range
    narrowing as :func:`exact_quantiles`, ranking by cumulative weight
    instead of row count (bytes-weighted p95 file size, duration-
    weighted latency, token-weighted doc length: the questions where
    "half the rows" and "half the bytes" are different values).

    Semantics (exact, integer): with ``q_ppm = round(q * 1e6)`` and
    total weight ``W``, the answer is the smallest data value whose
    cumulative weight ``cumw`` satisfies ``cumw * 1e6 >= q_ppm * W`` —
    i.e. the ``ceil(q_ppm*W/1e6)``-th weight unit, the weighted
    ``quantile_disc``.  Weights must be positive BIGINT-safe integers
    (the exactness contract; scale fractional weights up front).
    With all weights 1 this reduces to :func:`exact_quantiles` for any
    q expressible in ppm.

    Cost shape is identical to the unweighted form: one bounds/total
    job, one shared histogram job per round (weight sums + row counts
    per bucket, bounds are actual data values, so the recursion is
    exact), and a bounded final fetch over <= ``final_threshold`` rows.
    """
    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    vals = df.select(
        F.col(value_col).alias("v"), F.col(weight_col).alias("w")
    ).where(F.col(value_col).isNotNull() & F.col(weight_col).isNotNull())
    head = vals.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"),
        F.sum("w").alias("tw"), F.count("v").alias("n"),
        F.min("w").alias("w_min"),
    ).collect()[0]
    n, total_w = head["n"], head["tw"]
    if n == 0:
        raise ValueError(f"no non-null values in {value_col!r}")
    if head["w_min"] is None or head["w_min"] <= 0:
        raise ValueError(
            f"weights must be positive integers, got min={head['w_min']}"
        )

    def target(q: float) -> int:
        q_ppm = round(q * 1_000_000)
        return max(1, min(total_w, (q_ppm * total_w + 999_999) // 1_000_000))

    state = {
        q: {"r": target(q), "lo": head["lo"], "hi": head["hi"], "rows": n}
        for q in qs
    }
    resolved: dict[float, object] = {}
    for q, s in state.items():
        if s["lo"] == s["hi"]:
            resolved[q] = s["lo"]

    for _ in range(max_rounds):
        live = sorted(
            (q, s)
            for q, s in state.items()
            if q not in resolved and s["rows"] > final_threshold
        )
        if not live:
            break
        # float-plateau guard: resolve from per-distinct-value weights
        for q, s in live:
            if (float(s["hi"]) - float(s["lo"])) / buckets > 0.0:
                continue
            in_r = (F.col("v") >= F.lit(s["lo"])) & (F.col("v") <= F.lit(s["hi"]))
            r = s["r"]
            for row in (
                vals.where(in_r)
                .groupBy("v")
                .agg(F.sum("w").alias("bw"))
                .orderBy("v")
                .collect()
            ):
                if r <= row["bw"]:
                    resolved[q] = row["v"]
                    break
                r -= row["bw"]
        live = [(q, s) for q, s in live if q not in resolved]
        if not live:
            break
        entries = []
        for i, (q, s) in enumerate(live):
            width = (float(s["hi"]) - float(s["lo"])) / buckets
            in_r = (F.col("v") >= F.lit(s["lo"])) & (F.col("v") <= F.lit(s["hi"]))
            b = F.when(
                in_r,
                F.greatest(
                    F.lit(0),
                    F.least(
                        F.lit(buckets - 1),
                        F.floor(
                            (F.col("v") - F.lit(s["lo"])) / F.lit(width)
                        ).cast("int"),
                    ),
                ),
            )
            entries.append(F.struct(F.lit(i).alias("qi"), b.alias("b")))
        hist = {
            (r["qi"], r["b"]): (r["bw"], r["cnt"], r["b_min"], r["b_max"])
            for r in vals.select(
                F.explode(F.array(*entries)).alias("e"), "v", "w"
            )
            .select("e.qi", "e.b", "v", "w")
            .where(F.col("b").isNotNull())
            .groupBy("qi", "b")
            .agg(
                F.sum("w").alias("bw"),
                F.count(F.lit(1)).alias("cnt"),
                F.min("v").alias("b_min"),
                F.max("v").alias("b_max"),
            )
            .collect()
        }
        progressed = False
        for i, (q, s) in enumerate(live):
            r = s["r"]
            for bi in range(buckets):
                bw, c, b_min, b_max = hist.get((i, bi), (0, 0, None, None))
                if r <= bw:
                    if b_min == b_max:
                        resolved[q] = b_min
                    elif c < s["rows"] or b_min != s["lo"] or b_max != s["hi"]:
                        progressed = True
                    state[q] = {"r": r, "lo": b_min, "hi": b_max, "rows": c}
                    break
                r -= bw
        if not progressed and not any(q in resolved for q, _ in live):
            break

    out_rows = []
    for q in qs:
        if q in resolved:
            out_rows.append((float(q), resolved[q]))
            continue
        s = state[q]
        r = s["r"]
        # distributed cumulative-weight selection: smallest v whose
        # running weight reaches r.  The self-join is quadratic in the
        # DISTINCT values left in the range — tiny (<= final_threshold
        # rows) on the normal path, and on a degenerate no-progress
        # plateau (e.g. +Infinity values defeating the bucket widths)
        # it degrades to a distributed job whose driver result is ONE
        # row, never a full-range groupBy().collect() on the driver.
        wv = vals.where(
            (F.col("v") >= F.lit(s["lo"])) & (F.col("v") <= F.lit(s["hi"]))
        ).groupBy("v").agg(F.sum("w").alias("bw"))
        got = (
            wv.alias("x")
            .join(wv.alias("y"), F.col("y.v") <= F.col("x.v"))
            .groupBy("x.v")
            .agg(F.sum("y.bw").alias("cum"))
            .where(F.col("cum") >= F.lit(r))
            .agg(F.min("v").alias("v"))
            .first()["v"]
        )
        if got is None:  # r past the range's total weight: keep max
            got = wv.agg(F.max("v").alias("v")).first()["v"]
        out_rows.append((float(q), got))
    vtype = df.schema[value_col].dataType.simpleString()
    return df.sparkSession.createDataFrame(
        out_rows, schema=f"quantile double, `value` {vtype}"
    )
