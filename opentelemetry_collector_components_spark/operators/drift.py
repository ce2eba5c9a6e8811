"""Distribution drift between two corpus slices (PSI / Jeffreys divergence).

The monitoring primitive of a continuously-ingesting pipeline: did this
week's crawl shift against the reference corpus?  Computed as the
Population Stability Index over a bucketed feature histogram,

    PSI = sum over buckets of (p_i - q_i) * ln(p_i / q_i)

which is exactly the symmetric (Jeffreys) KL divergence — every bucket's
contribution is nonnegative, so per-bucket rows are directly readable as
"where the shift lives".  Conventional alert bands: < 0.1 stable,
0.1-0.25 moderate, > 0.25 shifted.

Engine-exact arithmetic: with add-1 smoothing over the union bucket set
(B buckets; zero-count buckets on either side stay finite),

    p_i = (cp_i + 1) / (Np + B),   q_i = (cq_i + 1) / (Nq + B)

the log-ratio is one double division of exact BIGINT cross-products then
one ``ln``:  ``lnr_micro = floor(1e6 * ln(pnum / qnum))`` with
``pnum = (cp+1)*(Nq+B)``, ``qnum = (cq+1)*(Np+B)``.  The contribution

    psi_micro = (pnum - qnum) * lnr_micro div ((Np+B) * (Nq+B))

is pure BIGINT; ``pnum - qnum`` and ``lnr_micro`` always share a sign
(both follow sign(p - q); ``floor`` keeps a barely-negative log at -1 and
a barely-positive one at 0), so the product is nonnegative and truncating
division is engine-unambiguous.  Total PSI = sum(psi_micro) / 1e6.

Overflow bound: the cross products need (Np+B)*(Nq+B) < 9.2e18 — holds to
~3e9 rows per slice; past that, pre-aggregate counts per bucket are tiny
anyway, so rescale both slices' counts by a common factor before calling
(PSI is scale-free in the true distribution; document the smoothing
perturbation) or consume the float column.

Scale shape: ONE partial-aggregated groupBy over the bucketed scan (the
conditional counts combine map-side), a one-row totals aggregate
broadcast-cross-joined back, and arithmetic on the B-row histogram —
the corpus is touched exactly once, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _slice_histogram(
    df: DataFrame,
    bucket_col: str,
    baseline_col: str,
    caller: str,
    drop_null_buckets: bool = False,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Shared (*group_cols, bucket, cp, cq) two-slice histogram: one
    partial-aggregated groupBy over the scan; NULL in the slice flag
    raises (every row must belong to exactly one slice); NULL buckets are
    kept as a real cell unless the caller's statistic needs an ordered
    domain."""
    if drop_null_buckets:
        df = df.filter(F.col(bucket_col).isNotNull())
    flag = F.col(baseline_col)
    guarded = F.when(
        flag.isNull(),
        F.raise_error(
            f"{caller}: NULL in {baseline_col} — every row must "
            "belong to exactly one slice"
        ).cast("boolean"),
    ).otherwise(flag)
    groups = list(group_cols or [])
    return (
        df.select(
            *[F.col(g) for g in groups],
            F.col(bucket_col).alias("bucket"),
            guarded.alias("_p"),
        )
        .groupBy(*groups, "bucket")
        .agg(
            F.sum(F.when(F.col("_p"), 1).otherwise(0)).cast("long").alias("cp"),
            F.sum(F.when(F.col("_p"), 0).otherwise(1)).cast("long").alias("cq"),
        )
    )


def _psi_from_totals(withtot: DataFrame) -> DataFrame:
    """Attach the engine-exact PSI columns to histogram rows that already
    carry their slice totals (cp, cq, np_total, nq_total, n_buckets) —
    the single copy of the add-1-smoothed micro-nat arithmetic shared by
    ``psi_histogram_drift`` (crossJoin totals) and
    ``psi_histogram_drift_by`` (per-group window totals); the two MUST
    stay bit-identical (test_grouped_psi_equals_per_group_runs)."""
    pnum = (F.col("cp") + 1) * (F.col("nq_total") + F.col("n_buckets"))
    qnum = (F.col("cq") + 1) * (F.col("np_total") + F.col("n_buckets"))
    return (
        withtot.withColumn("_pnum", pnum.cast("long"))
        .withColumn("_qnum", qnum.cast("long"))
        .withColumn(
            "lnr_micro",
            F.floor(
                F.lit(1000000.0)
                * F.log(F.col("_pnum").cast("double") / F.col("_qnum").cast("double"))
            ),
        )
        .withColumn(
            "psi_micro",
            F.expr(
                "((_pnum - _qnum) * lnr_micro)"
                " div ((np_total + n_buckets) * (nq_total + n_buckets))"
            ),
        )
        .withColumn("psi", F.round(F.col("psi_micro") / 1000000.0, 6))
    )


def psi_histogram_drift(
    df: DataFrame,
    bucket_col: str,
    baseline_col: str,
) -> DataFrame:
    """Per-bucket PSI contributions: baseline slice (``baseline_col`` true)
    vs comparison slice (false).

    Returns one row per distinct bucket value (union of both slices):
    (bucket, cp BIGINT, cq BIGINT, lnr_micro BIGINT, psi_micro BIGINT,
    psi DOUBLE rounded 6dp).  ``cp`` counts baseline rows.  NULL buckets
    are their own bucket (NULL is a real histogram cell, not droppable);
    NULL in ``baseline_col`` raises — the caller must decide slice
    membership for every row.
    """
    hist = _slice_histogram(df, bucket_col, baseline_col, "psi_histogram_drift")
    totals = hist.agg(
        F.sum("cp").cast("long").alias("np_total"),
        F.sum("cq").cast("long").alias("nq_total"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    out = _psi_from_totals(hist.crossJoin(F.broadcast(totals)))
    return out.select("bucket", "cp", "cq", "lnr_micro", "psi_micro", "psi")


def psi_total(
    df: DataFrame,
    bucket_col: str,
    baseline_col: str,
) -> DataFrame:
    """One-row total: (psi_micro BIGINT, psi DOUBLE 6dp, n_buckets BIGINT).
    Sum of the per-bucket BIGINT contributions — associative, exact."""
    per = psi_histogram_drift(df, bucket_col, baseline_col)
    return per.agg(
        F.sum("psi_micro").cast("long").alias("psi_micro"),
        F.round(F.sum("psi_micro") / 1000000.0, 6).alias("psi"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )


def psi_histogram_drift_by(
    df: DataFrame,
    bucket_col: str,
    baseline_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Grouped PSI: one independent PSI computation per group — the
    monitoring shape (drift per day / per source / per sink, in ONE job)
    rather than |groups| separate runs.

    Semantics per group are identical to ``psi_histogram_drift``
    (including add-1 smoothing over the GROUP'S OWN bucket set — B is the
    group's distinct-bucket count, so sparse groups smooth over their own
    support, the same rule a per-group loop would apply).  Returns
    (*group_cols, bucket, cp, cq, lnr_micro, psi_micro, psi).

    Scale shape: the corpus pays one partial-aggregated groupBy on
    (*group_cols, bucket); per-group totals come from a full-frame window
    PARTITIONED BY the group over the histogram rows (bounded at B rows
    per group — never corpus rows, and never an unpartitioned window).
    """
    from pyspark.sql.window import Window

    if not group_cols:
        raise ValueError(
            "group_cols must be non-empty — use psi_histogram_drift for the "
            "ungrouped form"
        )
    hist = _slice_histogram(
        df, bucket_col, baseline_col, "psi_histogram_drift_by",
        group_cols=group_cols,
    )
    wg = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    withtot = hist.select(
        *group_cols,
        "bucket",
        "cp",
        "cq",
        F.sum("cp").over(wg).cast("long").alias("np_total"),
        F.sum("cq").over(wg).cast("long").alias("nq_total"),
        F.count(F.lit(1)).over(wg).cast("long").alias("n_buckets"),
    )
    return _psi_from_totals(withtot).select(
        *group_cols, "bucket", "cp", "cq", "lnr_micro", "psi_micro", "psi"
    )


def ks_statistic(
    df: DataFrame,
    bucket_col: str,
    baseline_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic over a bucketed feature —
    the rank-based drift twin of PSI (sensitive to location shifts PSI's
    binned density can smear; no smoothing parameter, no transcendental).

        D = max over buckets of |CDF_p(bucket) - CDF_q(bucket)|

    computed EXACTLY in integers: with cumulative counts ccp/ccq and
    totals Np/Nq, ``D = max |ccp*Nq - ccq*Np| / (Np*Nq)`` — the numerator
    and denominator are emitted as BIGINTs (``d_num``, Np, Nq) alongside
    the rounded double, so the gate hashes pure integers.

    One row out: (d_num BIGINT, np_total BIGINT, nq_total BIGINT,
    ks DOUBLE 6dp).  NULL buckets are excluded from BOTH the CDF and the
    totals (KS needs an ordered domain; a NULL cell has no rank — use
    ``psi_histogram_drift`` when missingness itself is the signal).
    Raises when one slice is empty but the other is not (D is undefined);
    an entirely empty histogram (no rows, or every bucket NULL) yields an
    EMPTY result frame — a lazy expression cannot raise when no row ever
    evaluates it, so callers doing ``.collect()[0]`` must treat zero rows
    as "no data", not "no drift".

    Scale shape: the corpus pays the same single partial-aggregated
    groupBy as PSI; the cumulative window then runs UNPARTITIONED but
    over the B-row bucket HISTOGRAM only (B = domain/width by
    construction, e.g. token-count buckets — never corpus rows), the
    same bounded-window rationale as limits' threshold tables.  Overflow:
    ccp*Nq needs Np*Nq < 9.2e18 — ~3e9 rows per slice, as PSI.
    """
    from pyspark.sql.window import Window

    hist = _slice_histogram(
        df, bucket_col, baseline_col, "ks_statistic", drop_null_buckets=True
    )
    # both windows run over the SAME B-row sorted histogram (one sort, one
    # pass): cumulative counts for the CDF, full-frame sums for the totals
    # — no second corpus scan, no join
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    wfull = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    diffs = hist.select(
        F.abs(
            F.sum("cp").over(w) * F.sum("cq").over(wfull)
            - F.sum("cq").over(w) * F.sum("cp").over(wfull)
        ).alias("d"),
        F.sum("cp").over(wfull).cast("long").alias("np_total"),
        F.sum("cq").over(wfull).cast("long").alias("nq_total"),
    )
    res = diffs.groupBy("np_total", "nq_total").agg(
        F.max("d").cast("long").alias("d_num")
    )
    return res.select(
        F.when(
            (F.col("np_total") == 0) | (F.col("nq_total") == 0),
            F.raise_error("ks_statistic: a slice is empty — D is undefined")
            .cast("long"),
        )
        .otherwise(F.col("d_num"))
        .alias("d_num"),
        "np_total",
        "nq_total",
        F.round(
            F.col("d_num") / (F.col("np_total") * F.col("nq_total")).cast("double"),
            6,
        ).alias("ks"),
    )


def emd_statistic(
    df: DataFrame,
    bucket_col: str,
    baseline_col: str,
) -> DataFrame:
    """Two-sample earth-mover's distance (1-Wasserstein) over a bucketed
    feature — the magnitude-aware third member of the drift family: PSI
    weighs density ratios (needs smoothing), KS takes the WORST CDF gap
    (blind to how long the gap persists), W1 INTEGRATES the gap over the
    domain, so a small shift across the whole range and a large shift in
    one spot are distinguished:

        W1 = integral over x of |CDF_p(x) - CDF_q(x)| dx
           = sum over adjacent bucket pairs of
                 |CDF_p(b_i) - CDF_q(b_i)| * (b_{i+1} - b_i)

    (the CDFs are step functions constant between present buckets, so
    absent empty buckets are handled exactly by the lead-difference gap;
    past the last bucket both CDFs are 1 and the tail contributes 0).
    Computed EXACTLY in integers: with cumulative counts ccp/ccq and
    totals Np/Nq, each term is |ccp*Nq - ccq*Np| * gap, summed as the
    BIGINT numerator ``w1_num``; ``emd = w1_num / (Np*Nq)`` is emitted
    rounded alongside, in the bucket column's own units.

    One row out: (w1_num BIGINT, np_total BIGINT, nq_total BIGINT,
    emd DOUBLE 6dp).  NULL buckets are excluded from both CDFs and
    totals (W1 needs an ordered metric domain, same rationale as KS);
    empty-slice rows raise; an entirely empty histogram yields an EMPTY
    frame (same caller contract as ``ks_statistic``).

    Scale shape: identical to KS — one partial-aggregated corpus groupBy,
    then cumulative/lead windows over the B-row bucket HISTOGRAM only.
    Overflow: w1_num <= Np*Nq*range(bucket) must stay under 9.2e18 —
    e.g. 1e6-wide domains cap slices near 3e6 rows each; pre-scale wide
    domains with a coarser ``width_bucket`` (W1 in bucket units) when
    slices are larger.
    """
    from pyspark.sql.window import Window

    hist = _slice_histogram(
        df, bucket_col, baseline_col, "emd_statistic", drop_null_buckets=True
    )
    # gaps multiply into the BIGINT numerator: a fractional bucket would
    # silently truncate, so the integral-domain contract is enforced
    # (pre-bucket continuous features with width_bucket)
    bucket_type = hist.schema["bucket"].dataType.simpleString()
    if bucket_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"emd_statistic: bucket column must be integral, got {bucket_type}"
            " — bucket continuous features with width_bucket first"
        )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    wlead = Window.orderBy("bucket")
    wfull = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    terms = hist.select(
        (
            F.abs(
                F.sum("cp").over(w) * F.sum("cq").over(wfull)
                - F.sum("cq").over(w) * F.sum("cp").over(wfull)
            )
            * (F.lead("bucket").over(wlead) - F.col("bucket"))
        ).alias("term"),
        F.sum("cp").over(wfull).cast("long").alias("np_total"),
        F.sum("cq").over(wfull).cast("long").alias("nq_total"),
    )
    res = terms.groupBy("np_total", "nq_total").agg(
        F.coalesce(F.sum("term"), F.lit(0)).cast("long").alias("w1_num")
    )
    return res.select(
        F.when(
            (F.col("np_total") == 0) | (F.col("nq_total") == 0),
            F.raise_error("emd_statistic: a slice is empty — W1 is undefined")
            .cast("long"),
        )
        .otherwise(F.col("w1_num"))
        .alias("w1_num"),
        "np_total",
        "nq_total",
        F.round(
            F.col("w1_num") / (F.col("np_total") * F.col("nq_total")).cast("double"),
            6,
        ).alias("emd"),
    )


def width_bucket(col: Column, width: int) -> Column:
    """Fixed-width integer bucketing for continuous features: the bucket's
    LOWER BOUND, ``value - pmod(value, width)`` = ``width * floor(value /
    width)`` as BIGINT.  Floor semantics hold for negatives too
    (width_bucket(-3, 8) = -8).  Kept trivial on purpose: the rule must be
    restatable in one SQL expression for the oracle — for nonnegative
    inputs (token counts, byte sizes, durations) that is ``v - (v % w)``;
    a signed feature needs the full floor form ``v - ((v % w + w) % w)``
    because bare ``%`` truncates toward zero in both engines."""
    if width < 1:
        raise ValueError("width must be >= 1")
    return col.cast("long") - F.pmod(col.cast("long"), F.lit(width))


def embedding_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space drift between two corpus slices: one row with
    ``n_ref``, ``n_cur``, ``centroid_cos`` (cosine between the two
    micro-quantized centroid directions, rounded to 4 dp) and
    ``l2_shift_sq_micro2`` (exact integer squared L2 distance between
    the per-dim centroid means, in micro^2 units) — the cheap corpus
    monitor that catches an embedding-model swap or a topic-mix shift
    before any downstream ANN index degrades.

    Engine-exact arithmetic: each component is quantized ONCE as
    ``ROUND(x * 1e6)`` (half away from zero in both engines), per-dim
    sums are exact BIGINTs, and the centroid mean is
    ``FLOOR(sum / n)`` via one double division (exact below 2^53).
    Dot product and norms over the BIGINT centroids are integer sums
    (bounded by dims x 1e12 — no overflow at any corpus size), so the
    final cosine is one double chain both engines share.

    Scale shape: one posexplode scan per slice into a dims-bounded
    groupBy (partial-aggregated; dims rows out), a dims-row join, and
    a one-row aggregate.  Nothing scales with corpus size after the
    first pass."""
    def dim_sums(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("pos")
            .agg(
                F.sum(
                    F.round(F.col("x").cast("double") * 1_000_000, 0)
                    .cast("long")
                ).alias(f"s_{tag}"),
                F.count(F.lit(1)).alias(f"n_{tag}"),
            )
        )

    r = dim_sums(ref, "ref")
    c = dim_sums(cur, "cur")
    cent = r.join(c, "pos").select(
        "pos", "n_ref", "n_cur",
        F.floor(F.col("s_ref").cast("double") / F.col("n_ref"))
        .cast("long")
        .alias("cr"),
        F.floor(F.col("s_cur").cast("double") / F.col("n_cur"))
        .cast("long")
        .alias("cc"),
    )
    agg = cent.agg(
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        F.sum(F.col("cr") * F.col("cc")).alias("dot"),
        F.sum(F.col("cr") * F.col("cr")).alias("na"),
        F.sum(F.col("cc") * F.col("cc")).alias("nb"),
        F.sum(
            (F.col("cr") - F.col("cc")) * (F.col("cr") - F.col("cc"))
        ).alias("l2_shift_sq_micro2"),
    )
    return agg.select(
        "n_ref", "n_cur",
        F.when(
            (F.col("na") > 0) & (F.col("nb") > 0),
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")),
                4,
            ),
        ).alias("centroid_cos"),
        "l2_shift_sq_micro2",
    )


def embedding_drift_oracle_sql(
    ref_sql: str,
    cur_sql: str,
    vec_col: str = "embedding",
) -> str:
    """DuckDB replay of :func:`embedding_drift` — identical
    quantization, per-dim BIGINT sums, and final double chain."""
    def sums(src: str, tag: str) -> str:
        return f"""
        SELECT i - 1 AS pos,
               CAST(SUM(CAST(ROUND(v[i] * 1000000, 0) AS BIGINT))
                    AS BIGINT) AS s_{tag},
               CAST(COUNT(*) AS BIGINT) AS n_{tag}
        FROM (SELECT {vec_col}::DOUBLE[] AS v FROM ({src}) x) e
        CROSS JOIN (SELECT unnest(range(1, (
            SELECT MAX(len({vec_col})) FROM ({src}) y) + 1)) AS i) d
        GROUP BY 1"""

    return f"""
    WITH r AS ({sums(ref_sql, "ref")}), c AS ({sums(cur_sql, "cur")}),
    cent AS (
        SELECT r.pos, r.n_ref, c.n_cur,
               CAST(FLOOR(CAST(r.s_ref AS DOUBLE) / r.n_ref) AS BIGINT)
                   AS cr,
               CAST(FLOOR(CAST(c.s_cur AS DOUBLE) / c.n_cur) AS BIGINT)
                   AS cc
        FROM r JOIN c ON c.pos = r.pos
    ), agg AS (
        SELECT MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur,
               CAST(SUM(cr * cc) AS BIGINT) AS dot,
               CAST(SUM(cr * cr) AS BIGINT) AS na,
               CAST(SUM(cc * cc) AS BIGINT) AS nb,
               CAST(SUM((cr - cc) * (cr - cc)) AS BIGINT)
                   AS l2_shift_sq_micro2
        FROM cent
    )
    SELECT n_ref, n_cur,
           CASE WHEN na > 0 AND nb > 0 THEN
               ROUND(CAST(dot AS DOUBLE)
                     / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 4)
           END AS centroid_cos,
           l2_shift_sq_micro2
    FROM agg
    """
