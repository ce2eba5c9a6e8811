"""SAX symbolization + motif counting (Lin/Keogh et al., DMKD 2003).

Time-series motif mining for operational telemetry: compress each
per-key series into a short symbolic string (PAA segment means →
alphabet symbols), then count recurring words — "this traffic shape
happens every night at 2am" falls out of a groupBy instead of a
quadratic subsequence scan.  Complements the repo's point-wise anomaly
stack (MAD / CUSUM / seasonal baselines): those flag WHERE a series
deviates; SAX words name WHICH SHAPE repeats or never repeated before
(a novel word is a shape-level anomaly, same readout as
``template_novelty_daily`` but for numeric series).

This is the EQUAL-FREQUENCY variant: classic SAX z-normalizes and
cuts at Gaussian breakpoints — float μ/σ arithmetic no cross-engine
oracle can replay exactly.  Discretizing PAA values by per-key rank
(``NTILE(alphabet)`` over segments ordered by (paa, segment) — a total
order, so tie placement is engine-identical) keeps the same
"similar shapes → same word" property with pure integer semantics,
and adapts to each key's own level/scale the way z-normalization was
meant to (Lin et al. use Gaussian cuts BECAUSE z-scores make values
~N(0,1); rank cuts achieve uniform symbol usage directly).

Arithmetic: PAA mean in exact micro units — ``(Σy · 1e6) div n_pts``
over BIGINT y (quantize float series upstream).  Word assembly sorts
segments inside each word window and concatenates symbol letters.

Scale shape: one partial-aggregated groupBy(key, segment) over the
raw scan; one NTILE window PARTITIONED BY KEY over the segment table
(≤ series_len/seg_len rows per key — bounded, never the raw stream);
one groupBy(key, word_idx) assembly; one groupBy(key, word) motif
count.  Every shuffle keys on the series key; hot keys are bounded by
their own segment count, not by row volume.
"""

from __future__ import annotations

import string

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def sax_words(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    y_col: str,
    seg_len: int,
    word_len: int,
    alphabet: int = 4,
) -> DataFrame:
    """Per-key SAX words: (*key_cols, word_idx, t_start, n_segments,
    word).  ``t_col`` must be an integer grid (hour index, minute
    index — see resample.fill_intervals for gap handling first);
    ``y_col`` an integral measure.  Trailing partial words are kept
    with their natural shorter length."""
    if not 2 <= alphabet <= 26:
        raise ValueError("alphabet must be in [2, 26]")
    if seg_len < 1 or word_len < 1:
        raise ValueError("seg_len and word_len must be >= 1")
    keys = list(key_cols)
    letters = F.array(*[F.lit(c) for c in string.ascii_lowercase[:alphabet]])
    paa = (
        df.select(
            *keys,
            F.expr(f"CAST({t_col} AS BIGINT) div {seg_len}").alias("_seg"),
            F.col(y_col).cast("long").alias("_y"),
        )
        .groupBy(*keys, "_seg")
        .agg(
            F.expr(f"(SUM(_y) * {MICRO}) div COUNT(*)").alias("_paa"),
        )
    )
    w = Window.partitionBy(*keys).orderBy("_paa", "_seg")
    sym = paa.withColumn("_tile", F.ntile(alphabet).over(w)).select(
        *keys,
        "_seg",
        F.element_at(letters, F.col("_tile")).alias("_chr"),
    )
    return (
        sym.groupBy(*keys, F.expr(f"_seg div {word_len}").alias("word_idx"))
        .agg(
            F.min("_seg").alias("_seg0"),
            F.count(F.lit(1)).alias("n_segments"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_seg", "_chr"))),
                    lambda s: s["_chr"],
                ),
                "",
            ).alias("word"),
        )
        .select(
            *keys,
            "word_idx",
            (F.col("_seg0") * seg_len).alias("t_start"),
            "n_segments",
            "word",
        )
    )


def sax_motifs(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    y_col: str,
    seg_len: int,
    word_len: int,
    alphabet: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """Recurring shapes: (*key_cols, word, n_occurrences) for words of
    FULL length seen at least ``min_count`` times within their key —
    the motif table.  Partial tail words are excluded (a shorter word
    equal to a prefix is a different shape)."""
    words = sax_words(df, key_cols, t_col, y_col, seg_len, word_len, alphabet)
    return (
        words.where(F.col("n_segments") == word_len)
        .groupBy(*key_cols, "word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .where(F.col("n_occurrences") >= min_count)
    )


def sax_words_oracle_sql(
    series_sql: str,
    key_cols: list[str],
    t_col: str,
    y_col: str,
    seg_len: int,
    word_len: int,
    alphabet: int = 4,
) -> str:
    """DuckDB replay: identical PAA integer mean, identical NTILE total
    order, string_agg word assembly."""
    keys = ", ".join(key_cols)
    letters = "[" + ", ".join(f"'{c}'" for c in string.ascii_lowercase[:alphabet]) + "]"
    return f"""
    WITH paa AS (
        SELECT {keys}, CAST({t_col} AS BIGINT) // {seg_len} AS seg,
               (SUM(CAST({y_col} AS BIGINT)) * {MICRO}) // COUNT(*) AS paa
        FROM ({series_sql}) src
        GROUP BY {keys}, seg
    ), sym AS (
        SELECT {keys}, seg,
               list_extract({letters},
                   NTILE({alphabet}) OVER (PARTITION BY {keys}
                                           ORDER BY paa, seg)) AS chr
        FROM paa
    )
    SELECT {keys}, seg // {word_len} AS word_idx,
           CAST(MIN(seg) * {seg_len} AS BIGINT) AS t_start,
           COUNT(*) AS n_segments,
           string_agg(chr, '' ORDER BY seg) AS word
    FROM sym GROUP BY {keys}, word_idx
    """


def sax_motifs_oracle_sql(
    series_sql: str,
    key_cols: list[str],
    t_col: str,
    y_col: str,
    seg_len: int,
    word_len: int,
    alphabet: int = 4,
    min_count: int = 2,
) -> str:
    keys = ", ".join(key_cols)
    words = sax_words_oracle_sql(
        series_sql, key_cols, t_col, y_col, seg_len, word_len, alphabet
    )
    return f"""
    SELECT {keys}, word, COUNT(*) AS n_occurrences
    FROM ({words}) w
    WHERE n_segments = {word_len}
    GROUP BY {keys}, word
    HAVING COUNT(*) >= {min_count}
    """
