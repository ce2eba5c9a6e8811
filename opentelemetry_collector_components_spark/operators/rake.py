"""RAKE keyphrase extraction: corpus keyphrases without a model.

Rapid Automatic Keyword Extraction (Rose et al. 2010): candidate
phrases are the maximal runs of content words between stopwords /
punctuation; each word scores ``degree/frequency`` (degree = summed
length of phrases it appears in — words that live in long multi-word
phrases outrank words that appear alone), and a phrase scores the sum
of its member word scores.  The cheap, deterministic keyphrase miner
for corpus exploration and doc tagging — complements
``textmine.pmi_collocations`` (adjacent-bigram statistics) with
variable-length phrases.

Fixed point: word score = ``deg * 1e6 div freq`` (exact BIGINT);
phrase score = integer sum of member word scores — engine-exact.

Phrase splitting is ONE regex — punctuation runs or stopword tokens —
in the Java∩RE2 subset, so the DuckDB oracle replays the identical
split.  The stopword list is the repo's small shared snapshot
(``textstats.STOPWORDS``) — a heuristic boundary set, documented, not
a linguistic claim; pass a custom list for serious use.

Scale shape: one scan-fused split + two explodes into partial-
aggregated groupBys (vocabulary/phrase-bounded, never corpus-row
joins); final ranking is the shared skew-proof ``two_phase_top_n``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import STOPWORDS


def rake_delim_regex(stopwords: list[str]) -> str:
    """The shared phrase-boundary regex (punctuation run OR stopword
    token) — exported so the oracle embeds the identical pattern.
    Stopwords are regex-escaped (``re.escape`` emits only backslash
    escapes, valid in both Java regex and RE2), so a custom list with
    metacharacters ("c++") cannot corrupt the alternation."""
    import re

    alts = "|".join(re.escape(w) for w in sorted(stopwords))
    return rf"[^a-z0-9\s]+|\b(?:{alts})\b"


def rake_keyphrases(
    df: DataFrame,
    text_col: str = "text",
    stopwords: list[str] | None = None,
    max_words: int = 4,
    min_count: int = 2,
    top: int = 50,
) -> DataFrame:
    """Top-``top`` phrases: (phrase, n, score_ppm), ranked by
    (score desc, phrase asc) — a total order, deterministic boundary."""
    if max_words < 1 or min_count < 1 or top < 1:
        raise ValueError("max_words, min_count and top must be >= 1")
    sw = stopwords if stopwords is not None else STOPWORDS["en"]
    if not sw:
        raise ValueError("stopwords must be non-empty")
    delim = rake_delim_regex(sw)
    pieces = F.split(F.lower(F.col(text_col)), delim)
    phrase = F.explode(
        F.filter(
            F.transform(
                pieces,
                # collapse ALL whitespace runs to ' ' BEFORE trimming:
                # F.trim strips only ' ' (SPARK-17299), so a piece
                # edged by \t or \n would otherwise keep a leading
                # space and fragment the phrase identity
                lambda p: F.trim(F.regexp_replace(p, r"\s+", " ")),
            ),
            lambda p: p != "",
        )
    ).alias("phrase")
    phrases = df.select(phrase).where(
        F.size(F.split(F.col("phrase"), " ")) <= max_words
    )
    words = phrases.select(
        F.explode(F.split(F.col("phrase"), " ")).alias("word"),
        F.size(F.split(F.col("phrase"), " ")).alias("plen"),
    )
    wstats = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    ).withColumn("wscore", F.expr("(deg * 1000000) div freq"))
    counts = phrases.groupBy("phrase").agg(F.count(F.lit(1)).alias("n"))
    scored = (
        counts.where(F.col("n") >= min_count)
        .select("phrase", "n", F.explode(F.split("phrase", " ")).alias("word"))
        .join(wstats.select("word", "wscore"), "word")
        .groupBy("phrase", "n")
        .agg(F.sum("wscore").alias("score_ppm"))
    )
    from .partition import two_phase_top_n

    return two_phase_top_n(
        scored, [], [F.desc("score_ppm"), F.asc("phrase")], top
    ).select("phrase", "n", "score_ppm")
