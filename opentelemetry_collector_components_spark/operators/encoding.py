"""Out-of-fold target encoding (m-estimate) for categorical features.

The feature-engineering step in front of the quality classifier
(``classifier.quality_lr_train``): replace a high-cardinality
categorical (source, domain, user agent family) with the smoothed
target rate of its OTHER folds — the standard leakage guard that
keeps a row's own label out of its own feature (Micci-Barreca, SIGKDD
Explorations 2001).

Exact fixed-point arithmetic (engine-identical):

    fold(unit)  = md5_hash60(salt || ':' || unit) % folds
    prior_ppm   = (total_y * 1e6) div total_n          (quantized once)
    enc_ppm(cat, f) = ((tot_s_cat - s_{cat,f}) * 1e6 + m * prior_ppm)
                      div (tot_n_cat - n_{cat,f} + m)

``m`` is the smoothing pseudo-count: a category seen once out-of-fold
stays near the prior; a category with thousands of observations
converges to its own rate.  ``y`` must be integer-valued (a 0/1
label or micro-unit amount) so every sum below ~9.2e12 stays exact in
BIGINT after the 1e6 scale-up — the same bound family as ``mi.py``.

Scale shape: one partial-aggregated groupBy on (category, fold) —
raw rows are touched once; everything after is bounded by
|categories| x folds.  The encoding table is tiny and broadcast-
joins back onto the training frame by (category, fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import md5_hash60


def target_encode(
    df: DataFrame,
    cat_col: str,
    y_col: str,
    unit_col: str,
    m: int = 20,
    folds: int = 5,
    salt: str = "te",
) -> DataFrame:
    """The out-of-fold encoding table: (``cat_col``, fold, n_oof,
    enc_ppm).  Join back on (category, fold(unit)) to attach the
    feature; ``n_oof`` is the out-of-fold observation count behind
    each value (0 means pure prior)."""
    if m < 1:
        raise ValueError("m must be >= 1 (m=0 divides by zero when a"
                         " category lives in a single fold)")
    if folds < 2:
        raise ValueError("folds must be >= 2 (fold 0 would see itself)")
    fold = (
        md5_hash60(
            F.concat(F.lit(salt), F.lit(":"), F.col(unit_col).cast("string"))
        )
        % folds
    )
    stats = (
        df.where(F.col(cat_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(cat_col).alias("cat"), fold.alias("fold"))
        .agg(
            F.sum(F.col(y_col).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    totals = stats.groupBy("cat").agg(
        F.sum("s").alias("tot_s"), F.sum("n").alias("tot_n")
    )
    prior = stats.agg(
        F.expr("CAST((sum(s) * 1000000) div sum(n) AS BIGINT)").alias(
            "prior_ppm"
        )
    )
    return (
        stats.join(totals, "cat")
        .crossJoin(F.broadcast(prior))
        .select(
            F.col("cat").alias(cat_col),
            "fold",
            (F.col("tot_n") - F.col("n")).alias("n_oof"),
            F.expr(
                f"CAST(((tot_s - s) * 1000000 + {int(m)} * prior_ppm)"
                f" div (tot_n - n + {int(m)}) AS BIGINT)"
            ).alias("enc_ppm"),
        )
    )


def target_encode_oracle_sql(
    source_sql: str,
    cat_col: str,
    y_col: str,
    unit_col: str,
    m: int = 20,
    folds: int = 5,
    salt: str = "te",
) -> str:
    """DuckDB replay over the same source rows and md5 fold hash."""
    return f"""
    WITH stats AS (
        SELECT {cat_col} AS cat,
               ('0x' || substr(md5('{salt}' || ':'
                   || CAST({unit_col} AS VARCHAR)), 1, 15))::BIGINT
                   % {int(folds)} AS fold,
               CAST(SUM(CAST({y_col} AS BIGINT)) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ({source_sql}) src
        WHERE {cat_col} IS NOT NULL AND {y_col} IS NOT NULL
        GROUP BY 1, 2
    ), totals AS (
        SELECT cat, CAST(SUM(s) AS BIGINT) AS tot_s,
               CAST(SUM(n) AS BIGINT) AS tot_n
        FROM stats GROUP BY 1
    ), prior AS (
        SELECT CAST((SUM(s) * 1000000) // SUM(n) AS BIGINT) AS prior_ppm
        FROM stats
    )
    SELECT st.cat AS {cat_col}, st.fold,
           t.tot_n - st.n AS n_oof,
           CAST(((t.tot_s - st.s) * 1000000 + {int(m)} * p.prior_ppm)
                // (t.tot_n - st.n + {int(m)}) AS BIGINT) AS enc_ppm
    FROM stats st JOIN totals t ON t.cat = st.cat CROSS JOIN prior p
    """
