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
#: Jonckheere-Terpstra's tighter cap: its variance A-term is ~2n^3
#: (2n^3 crosses 2^63 at n ~ 1.66M), vs the n^3 bound behind MAX_ROWS
JT_MAX_ROWS = 1_500_000


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


def mann_whitney(
    df: DataFrame,
    value_col: str,
    group_col: str,
    treat,
    control,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key Mann-Whitney U test (Wilcoxon rank-sum) — THE standard
    nonparametric two-sample readout for A/B experiments whose metric
    is skewed or ordinal (where the t-test's normality premise fails).

    Same exact-rank discipline as ``spearman``: doubled midranks from
    the aggregated level table keep everything integral, so

        U2 = 2*U_treat = sum over treat rows of centered doubled rank
             + n_t * n_c

    is an exact BIGINT (identity: 2R_t - n_t(n_t+1) folded through the
    centering).  Tie-corrected normal approximation

        z = (U2 - n_t*n_c) / (2*sigma),
        sigma^2 = n_t*n_c*((n^3 - n) - T) / (12*n*(n-1)),  T = sum(t^3 - t)

    runs its one sqrt+division in IEEE double on exact integer inputs
    (engine-identical) and floors to ppm.  Rank-biserial effect size
    r = 2U/(n_t*n_c) - 1 is emitted as a POSITIVE-numerator truncating
    division minus 1e6, so Spark `div` and DuckDB `//` agree exactly.

    Rows whose group is neither ``treat`` nor ``control`` are ignored;
    a key missing either arm yields NULL r/z (U2 = 0 against an empty
    arm); all-tied values yield NULL z.  Groups over 2,000,000 rows
    raise (n^3 BIGINT moment bound, same as spearman).

    Scale shape: one groupBy to the per-(key, value) level table,
    window over the BOUNDED level table only, one join back, one final
    aggregate — never a window over raw rows.
    """
    keys = list(key_cols or [])
    val = F.col(value_col).cast("long")
    src = df.select(
        *[F.col(k) for k in keys],
        F.when(
            val.isNull(),
            F.raise_error(f"mann_whitney: NULL in {value_col}").cast("long"),
        ).otherwise(val).alias("_v"),
        F.when(F.col(group_col) == treat, F.lit(1))
        .when(F.col(group_col) == control, F.lit(0))
        .alias("_t"),
    ).where(F.col("_t").isNotNull())
    lv = src.groupBy(*keys, "_v").agg(
        F.count(F.lit(1)).alias("_c"), F.sum("_t").alias("_ct")
    )
    w = Window.partitionBy(*keys).orderBy("_v")
    wp = Window.partitionBy(*keys)
    ranked = lv.select(
        *keys,
        "_c",
        "_ct",
        (
            2 * F.coalesce(
                F.sum("_c").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            )
            + F.col("_c")
            + 1
            - (F.sum("_c").over(wp) + 1)
        ).alias("_cd"),
    )
    agg = ranked.groupBy(*keys).agg(
        F.sum("_ct").cast("long").alias("n_t"),
        F.sum(F.col("_c") - F.col("_ct")).cast("long").alias("n_c"),
        F.sum(F.col("_ct") * F.col("_cd")).alias("_sct"),
        F.sum(F.col("_c") * F.col("_c") * F.col("_c") - F.col("_c")).alias("_ties"),
    )
    n = F.col("n_t") + F.col("n_c")
    checked = agg.select(
        *keys,
        F.when(
            n > MAX_ROWS,
            F.raise_error(
                f"mann_whitney: group exceeds {MAX_ROWS} rows — sample or "
                "pre-bucket (BIGINT moment bound)"
            ).cast("long"),
        ).otherwise(F.col("n_t")).alias("n_t"),
        "n_c", "_sct", "_ties",
    )
    nn = F.col("n_t") + F.col("n_c")
    u2 = (F.col("_sct") + F.col("n_t") * F.col("n_c")).cast("long")
    prod = F.col("n_t") * F.col("n_c")
    s2_num = (
        (nn * nn * nn - nn - F.col("_ties")).cast("double")
        * prod.cast("double")
    )
    z = F.floor(
        F.col("_sct").cast("double")
        / (2.0 * F.sqrt(s2_num / (12.0 * nn.cast("double") * (nn - 1).cast("double"))))
        * PPM
    ).cast("long")
    return checked.select(
        *keys,
        "n_t",
        "n_c",
        u2.alias("u2"),
        F.when(prod > 0, F.expr(f"((_sct + n_t * n_c) * {PPM}) div (n_t * n_c) - {PPM}"))
        .cast("long")
        .alias("r_ppm"),
        F.when((prod > 0) & (s2_num > 0), z).alias("z_ppm"),
    )


def mann_whitney_oracle_sql(
    rows_sql: str,
    value_col: str,
    group_expr: str,
    keys: list[str],
) -> str:
    """DuckDB replay of ``mann_whitney``: ``rows_sql`` must yield
    (*keys, value_col, and a 0/1 column per ``group_expr``); identical
    level table, doubled midranks, and IEEE z expression."""
    kcsv = ", ".join(keys)
    kpfx = f"{kcsv}, " if keys else ""
    part = f"PARTITION BY {kcsv} " if keys else ""
    return f"""
    WITH src AS (
        SELECT {kpfx}CAST({value_col} AS BIGINT) AS _v,
               CAST({group_expr} AS BIGINT) AS _t
        FROM ({rows_sql}) q WHERE {group_expr} IS NOT NULL
    ),
    lv AS (
        SELECT {kpfx}_v, COUNT(*) AS _c, SUM(_t) AS _ct
        FROM src GROUP BY {kpfx}_v
    ),
    ranked AS (
        SELECT {kpfx}_c, _ct,
               2 * COALESCE(SUM(_c) OVER ({part}ORDER BY _v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + _c + 1 - (SUM(_c) OVER ({part.rstrip() or ''}) + 1) AS _cd
        FROM lv
    ),
    agg AS (
        SELECT {kpfx}
               CAST(SUM(_ct) AS BIGINT) AS n_t,
               CAST(SUM(_c - _ct) AS BIGINT) AS n_c,
               CAST(SUM(_ct * _cd) AS BIGINT) AS _sct,
               CAST(SUM(_c * _c * _c - _c) AS BIGINT) AS _ties
        FROM ranked GROUP BY {kcsv if keys else 'ALL'}
    )
    SELECT {kpfx}n_t, n_c,
           CAST(_sct + n_t * n_c AS BIGINT) AS u2,
           CASE WHEN n_t * n_c > 0 THEN
               CAST(((_sct + n_t * n_c) * {PPM}) // (n_t * n_c) - {PPM} AS BIGINT)
           END AS r_ppm,
           CASE WHEN n_t * n_c > 0 AND
                CAST(((n_t + n_c) * (n_t + n_c) * (n_t + n_c) - (n_t + n_c)
                      - _ties) AS DOUBLE) * CAST(n_t * n_c AS DOUBLE) > 0 THEN
               CAST(FLOOR(
                   CAST(_sct AS DOUBLE)
                   / (2.0 * SQRT(
                       CAST(((n_t + n_c) * (n_t + n_c) * (n_t + n_c)
                             - (n_t + n_c) - _ties) AS DOUBLE)
                       * CAST(n_t * n_c AS DOUBLE)
                       / (12.0 * CAST(n_t + n_c AS DOUBLE)
                          * CAST(n_t + n_c - 1 AS DOUBLE))))
                   * {PPM}) AS BIGINT)
           END AS z_ppm
    FROM agg
    """


def jonckheere_terpstra(
    df: DataFrame,
    value_col: str,
    group_order_col: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key Jonckheere-Terpstra trend test — the ORDERED-alternative
    k-sample rank test (does the metric rise monotonically across dose/
    severity/cohort-ordered arms?), strictly more powerful there than
    Kruskal-Wallis' any-difference alternative and the k-arm
    generalization of ``mann_whitney``.

        J = sum over group pairs g < h of U_gh,
        U_gh = #(x_g < x_h) + 1/2 #(x_g = x_h)

    Exact doubled form J2 = 2J as one BIGINT, computed WITHOUT pairwise
    explosion: on the dense (value level x group) grid per key, one
    exclusive window over group order gives "mass in earlier groups at
    this value", a second exclusive window over value order turns that
    into "strictly smaller mass in earlier groups" — every grid cell
    contributes c * (2*below + equal).

    Tie-corrected normal approximation (Lehmann 1975, the standard
    three-term variance):

        var(J) = A/72 + B/(36 n(n-1)(n-2)) + C/(8 n(n-1))
        A = n(n-1)(2n+5) - sum_g n_g(n_g-1)(2n_g+5)
                         - sum_v t_v(t_v-1)(2t_v+5)
        B = [sum_g n_g(n_g-1)(n_g-2)] * [sum_v t_v(t_v-1)(t_v-2)]
        C = [sum_g n_g(n_g-1)] * [sum_v t_v(t_v-1)]
        z = (J2 - E[J2]) / (2*sqrt(var)),  E[J2] = n^2 - sum_g n_g^2 over 2

    Every aggregate is exact BIGINT; the B product and the final z ride
    a fixed-shape IEEE expression (identical tree both engines),
    floored to ppm.  Fewer than 2 groups or zero variance => NULL z.
    Groups over ``JT_MAX_ROWS`` rows per key raise (see the constant's
    rationale).

    Output: (*keys, n, k_groups, j2, z_ppm).

    Scale shape: one groupBy to the (key, group, value) level table,
    a dim-side dense grid (levels x k, k = ordered arms, small), two
    windows over the bounded grid, one final aggregate."""
    keys = list(key_cols or [])
    val = F.col(value_col).cast("long")
    grp = F.col(group_order_col).cast("long")

    def guard(c, name):
        return F.when(
            c.isNull(),
            F.raise_error(f"jonckheere_terpstra: NULL in {name}").cast("long"),
        ).otherwise(c)

    src = df.select(
        *[F.col(k) for k in keys],
        guard(val, value_col).alias("_v"),
        guard(grp, group_order_col).alias("_g"),
    )
    lv = src.groupBy(*keys, "_g", "_v").agg(F.count(F.lit(1)).alias("_c"))
    vals = lv.select(*keys, "_v").distinct()
    grps = lv.select(*keys, "_g").distinct()
    grid = (
        vals.join(grps, keys) if keys else vals.crossJoin(grps)
    ).join(lv, [*keys, "_g", "_v"], "left").withColumn(
        "_c", F.coalesce(F.col("_c"), F.lit(0))
    )
    wg = (
        Window.partitionBy(*keys, "_v")
        .orderBy("_g")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grid = grid.withColumn("_earlier_eq", F.coalesce(F.sum("_c").over(wg), F.lit(0)))
    wv = (
        Window.partitionBy(*keys, "_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grid = grid.withColumn(
        "_earlier_lt", F.coalesce(F.sum("_earlier_eq").over(wv), F.lit(0))
    )
    j2 = grid.groupBy(*keys).agg(
        F.sum(
            F.col("_c") * (2 * F.col("_earlier_lt") + F.col("_earlier_eq"))
        ).cast("long").alias("j2")
    )
    per_g = lv.groupBy(*keys, "_g").agg(F.sum("_c").alias("_ng"))
    gstats = per_g.groupBy(*keys).agg(
        F.sum("_ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum(F.col("_ng") * F.col("_ng")).alias("_sng2"),
        F.sum(F.col("_ng") * (F.col("_ng") - 1) * (2 * F.col("_ng") + 5)).alias("_ga"),
        F.sum(F.col("_ng") * (F.col("_ng") - 1) * (F.col("_ng") - 2)).alias("_gb"),
        F.sum(F.col("_ng") * (F.col("_ng") - 1)).alias("_gc2"),
    )
    per_v = lv.groupBy(*keys, "_v").agg(F.sum("_c").alias("_tv"))
    vstats = per_v.groupBy(*keys).agg(
        F.sum(F.col("_tv") * (F.col("_tv") - 1) * (2 * F.col("_tv") + 5)).alias("_va"),
        F.sum(F.col("_tv") * (F.col("_tv") - 1) * (F.col("_tv") - 2)).alias("_vb"),
        F.sum(F.col("_tv") * (F.col("_tv") - 1)).alias("_vc2"),
    )
    staged = (
        j2.join(gstats, keys) if keys else j2.crossJoin(gstats)
    )
    staged = staged.join(vstats, keys) if keys else staged.crossJoin(vstats)
    staged = staged.select(
        *keys,
        F.when(
            F.col("n") > JT_MAX_ROWS,
            F.raise_error(
                f"jonckheere_terpstra: group exceeds {JT_MAX_ROWS} rows — "
                "sample or pre-bucket (2n^3 BIGINT moment bound)"
            ).cast("long"),
        ).otherwise(F.col("n")).alias("n"),
        "k_groups", "j2", "_sng2", "_ga", "_gb", "_gc2", "_va", "_vb", "_vc2",
    )
    var_expr = (
        "(CAST(n * (n - 1) * (2 * n + 5) - _ga - _va AS DOUBLE) / 72.0"
        " + CAST(_gb AS DOUBLE) * CAST(_vb AS DOUBLE)"
        "   / (36.0 * n * (n - 1) * (n - 2))"
        " + CAST(_gc2 AS DOUBLE) * CAST(_vc2 AS DOUBLE)"
        "   / (8.0 * n * (n - 1)))"
    )
    # z = (J - E[J]) / sqrt(var) with J = j2/2, E[J] = (n^2 - sum n_g^2)/4:
    # numerator 2*j2 - (n^2 - sum n_g^2) is exact BIGINT, z = num/(4*sqrt(var))
    z_expr = (
        f"CAST(floor(CAST(2 * j2 - (n * n - _sng2) AS DOUBLE) / 4.0"
        f" / sqrt({var_expr}) * {PPM}) AS BIGINT)"
    )
    return staged.select(
        *keys,
        "n",
        "k_groups",
        "j2",
        F.when(
            (F.col("k_groups") >= 2) & (F.col("n") > 2) & F.expr(f"{var_expr} > 0"),
            F.expr(z_expr),
        ).alias("z_ppm"),
    )


def jonckheere_oracle_sql(
    rows_sql: str,
    value_col: str,
    group_col: str,
    keys: list[str],
) -> str:
    """DuckDB replay of ``jonckheere_terpstra``: identical grid, the
    same two exclusive windows, the same exact aggregates and IEEE
    z expression."""
    kcsv = ", ".join(keys)
    kpfx = f"{kcsv}, " if keys else ""
    part = f"{kcsv}, " if keys else ""
    on_k = " AND ".join(f"v.{k} = g.{k}" for k in keys) or "TRUE"
    on_lv = (
        " AND ".join(f"l.{k} = v.{k}" for k in keys)
        + (" AND " if keys else "")
        + "l._g = g._g AND l._v = v._v"
    )
    kv = ", ".join(f"v.{k}" for k in keys)
    kvpfx = f"{kv}, " if keys else ""
    gb = kcsv if keys else "ALL"
    var_expr = (
        "(CAST(n * (n - 1) * (2 * n + 5) - _ga - _va AS DOUBLE) / 72.0"
        " + CAST(_gb AS DOUBLE) * CAST(_vb AS DOUBLE)"
        "   / (36.0 * n * (n - 1) * (n - 2))"
        " + CAST(_gc2 AS DOUBLE) * CAST(_vc2 AS DOUBLE)"
        "   / (8.0 * n * (n - 1)))"
    )
    z_expr = (
        f"CAST(floor(CAST(2 * j2 - (n * n - _sng2) AS DOUBLE) / 4.0"
        f" / sqrt({var_expr}) * {PPM}) AS BIGINT)"
    )
    join_keys = f"USING ({kcsv})" if keys else "ON TRUE"
    return f"""
    WITH src AS (
        SELECT {kpfx}CAST({value_col} AS BIGINT) AS _v,
               CAST({group_col} AS BIGINT) AS _g
        FROM ({rows_sql}) q
    ),
    lv AS (
        SELECT {kpfx}_g, _v, COUNT(*) AS _c FROM src GROUP BY {kpfx}_g, _v
    ),
    vals AS (SELECT DISTINCT {kpfx}_v FROM lv),
    grps AS (SELECT DISTINCT {kpfx}_g FROM lv),
    grid AS (
        SELECT {kvpfx}v._v, g._g, COALESCE(l._c, 0) AS _c
        FROM vals v JOIN grps g ON {on_k}
        LEFT JOIN lv l ON {on_lv}
    ),
    w1 AS (
        SELECT *, COALESCE(SUM(_c) OVER (PARTITION BY {part}_v ORDER BY _g
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _eq
        FROM grid
    ),
    w2 AS (
        SELECT *, COALESCE(SUM(_eq) OVER (PARTITION BY {part}_g ORDER BY _v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _lt
        FROM w1
    ),
    j AS (
        SELECT {kpfx}CAST(SUM(_c * (2 * _lt + _eq)) AS BIGINT) AS j2
        FROM w2 GROUP BY {gb}
    ),
    pg AS (SELECT {kpfx}_g, SUM(_c) AS _ng FROM lv GROUP BY {kpfx}_g),
    gstats AS (
        SELECT {kpfx}CAST(SUM(_ng) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k_groups,
               CAST(SUM(_ng * _ng) AS BIGINT) AS _sng2,
               CAST(SUM(_ng * (_ng - 1) * (2 * _ng + 5)) AS BIGINT) AS _ga,
               CAST(SUM(_ng * (_ng - 1) * (_ng - 2)) AS BIGINT) AS _gb,
               CAST(SUM(_ng * (_ng - 1)) AS BIGINT) AS _gc2
        FROM pg GROUP BY {gb}
    ),
    pv AS (SELECT {kpfx}_v, SUM(_c) AS _tv FROM lv GROUP BY {kpfx}_v),
    vstats AS (
        SELECT {kpfx}CAST(SUM(_tv * (_tv - 1) * (2 * _tv + 5)) AS BIGINT) AS _va,
               CAST(SUM(_tv * (_tv - 1) * (_tv - 2)) AS BIGINT) AS _vb,
               CAST(SUM(_tv * (_tv - 1)) AS BIGINT) AS _vc2
        FROM pv GROUP BY {gb}
    ),
    staged AS (
        SELECT j.*, gstats.n, gstats.k_groups, gstats._sng2, gstats._ga,
               gstats._gb, gstats._gc2, vstats._va, vstats._vb, vstats._vc2
        FROM j JOIN gstats {join_keys} JOIN vstats {join_keys}
    )
    SELECT {kpfx}n, k_groups, j2,
           CASE WHEN k_groups >= 2 AND n > 2 AND {var_expr} > 0
                THEN {z_expr} END AS z_ppm
    FROM staged
    """
