"""Feature hashing (the hashing trick — Weinberger et al., ICML 2009).

The dictionary-free text-to-vector step for training a linear filter
at corpus scale: ``bpe.py`` and ``tfidf`` build explicit vocabularies
(a full extra pass plus a broadcast dictionary); the hashing trick
maps each token straight to ``h(token) mod n_features`` with a second
hash bit choosing ±1 sign (the signed construction keeps collision
noise zero-mean, the paper's key lemma), so featurization is ONE scan
— no vocabulary pass, no dictionary to ship, no out-of-vocabulary
rows on tomorrow's crawl.  This is exactly how Vowpal Wabbit / CCNet-
style quality filters featurize web text, and the natural input to
``classifier.train_logreg_quantized``.

Exact arithmetic: values are signed token counts (BIGINT) — the dot
products downstream stay integer; L2/L1 normalization is a downstream
concern.  Hashing uses the repo-wide md5 60-bit integer hash
(``functions.textstats.md5_hash60``), so the oracle rebuilds the same
indices/signs relationally; swap ``engine="xxhash"`` for the cheaper
JVM hash when SQL replay is not needed (same plan shape).

Scale shape: tokenize in the scan, one explode, ONE partial-aggregated
groupBy(id, feature_idx) — token counts combine map-side, output is
the sparse (id, idx, value) triple table ready for a bucketed write.
No vocabulary state anywhere: the operator is a pure function of the
row, which is what makes it embarrassingly parallel at 10^12 docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dictmatch import tokenize


def hashed_features(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_features: int = 1 << 18,
    signed: bool = True,
    engine: str = "md5",
) -> DataFrame:
    """Sparse hashed bag-of-words: (``id_col``, feature_idx, value)
    with value = Σ sign(token)·count(token) over tokens hashing to the
    index; exact-zero cancellations are dropped (they carry no mass).
    ``n_features`` must be a positive power of two (the conventional
    mask-friendly choice; enforced so layouts stay comparable)."""
    if n_features < 2 or n_features & (n_features - 1):
        raise ValueError("n_features must be a power of two >= 2")
    if engine == "md5":
        from ..functions.textstats import md5_hash60

        h_idx = md5_hash60(F.col("_tok"))
        h_sign = md5_hash60(F.concat(F.col("_tok"), F.lit("#sign")))
    elif engine == "xxhash":
        # 63-bit mask keeps both derived values non-negative
        mask = (1 << 63) - 1
        h_idx = F.xxhash64(F.col("_tok")).bitwiseAND(F.lit(mask))
        h_sign = F.xxhash64(F.col("_tok"), F.lit(1)).bitwiseAND(F.lit(mask))
    else:
        raise ValueError(f"unknown hash engine: {engine!r}")
    sign = (
        F.when(h_sign % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
        if signed
        else F.lit(1)
    )
    toks = docs.select(
        F.col(id_col),
        F.explode(tokenize(F.col(text_col))).alias("_tok"),
    )
    return (
        toks.select(
            id_col,
            (h_idx % n_features).alias("feature_idx"),
            sign.cast("long").alias("_sign"),
        )
        .groupBy(id_col, "feature_idx")
        .agg(F.sum("_sign").alias("value"))
        .where(F.col("value") != 0)
    )


def hashed_features_oracle_sql(
    docs_sql: str,
    id_col: str,
    text_col: str,
    n_features: int,
    signed: bool = True,
) -> str:
    """DuckDB replay of the md5-engine construction."""
    h = "('0x' || substr(md5(tok), 1, 15))::BIGINT"
    hs = "('0x' || substr(md5(tok || '#sign'), 1, 15))::BIGINT"
    sign = f"CASE WHEN {hs} % 2 = 0 THEN 1 ELSE -1 END" if signed else "1"
    return f"""
    WITH toks AS (
        SELECT {id_col},
               unnest(regexp_extract_all(lower({text_col}), '[a-z0-9]+'))
                   AS tok
        FROM ({docs_sql}) src
    )
    SELECT {id_col},
           {h} % {n_features} AS feature_idx,
           CAST(SUM({sign}) AS BIGINT) AS value
    FROM toks
    GROUP BY 1, 2
    HAVING SUM({sign}) <> 0
    """
