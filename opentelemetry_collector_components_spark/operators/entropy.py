"""Character-distribution entropy as a document quality signal.

Shannon entropy of the per-document character histogram separates
natural prose (en ~4.0-4.5 bits/char over a few dozen symbols) from the
two junk tails a web crawl actually contains: base64/binary blobs and
hex dumps sit HIGH (near log2(alphabet) with a flat histogram), while
template spam, padding runs, and single-char filler sit LOW.  Filters
cut on both ends; the repo's other quality features (length, stopword,
repetition ratios in ``functions/textstats.py`` / ``webtext.py``) are
word-level and miss non-tokenizable junk entirely — this is the
byte-level complement.

Engine-exactness follows the PSI micro-nat discipline
(``operators/drift.py`` module docstring): the ONLY transcendental is
one ``ln`` per distinct (doc, char) cell, floored once at micro
precision —

    lnr_micro       = floor(1e6 * ln(n / cnt))        per cell
    entropy_micro   = sum(cnt * lnr_micro) div n      per doc (BIGINT)

so the gate hashes pure integers; the bits/char double is derived from
the integer for presentation only.  Error vs true entropy < 1e-6 nats
per cell — far below any filter threshold anyone would set.

Scale shape: one explode (rows x chars, the unavoidable histogram
cost), one partial-aggregated groupBy on (doc, char), one
doc-partitioned window — no unpartitioned stage, no corpus-wide
shuffle beyond the histogram groupBy.  Overflow: cnt * lnr_micro <
n * 1e6 * ln(n) — a single 100 GB document would still fit BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def char_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document character Shannon entropy.

    Output: (id_col, n_chars BIGINT, entropy_micro_nats BIGINT,
    entropy_bits DOUBLE 4dp).  Empty documents produce no output row
    (no characters -> no histogram; treat absence as "no signal", the
    same contract as the drift statistics' empty-histogram rule).
    Characters are unicode code points of the raw text — case, spaces,
    and punctuation all count (junk detection wants the raw stream,
    not a normalized one).
    """
    counts = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(F.col(text_col), "")).alias("ch"),
        )
        .where(F.col("ch") != "")
        .groupBy("_id", "ch")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("_id")
    terms = counts.withColumn("n", F.sum("cnt").over(w)).withColumn(
        "lnr_micro",
        F.floor(
            F.lit(1000000.0)
            * F.log(F.col("n").cast("double") / F.col("cnt").cast("double"))
        ),
    )
    return (
        terms.groupBy("_id")
        .agg(
            F.max("n").cast("long").alias("n_chars"),
            F.expr("sum(cnt * lnr_micro) div max(n)")
            .cast("long")
            .alias("entropy_micro_nats"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_chars",
            "entropy_micro_nats",
            F.round(
                F.col("entropy_micro_nats") / 1000000.0 / F.log(F.lit(2.0)), 4
            ).alias("entropy_bits"),
        )
    )
