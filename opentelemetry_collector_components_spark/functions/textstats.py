"""Text analysis functions for large-scale training-data pipelines.

Not part of the reference's surface — these are the document-quality /
language-ID / tokenization operators a 100 TB web-text pipeline needs on
top of the parse->route->aggregate core.  All pure JVM expressions
(whole-stage codegen); every one has an exact SQL restatement so it is
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "la", "et", "les", "un"],
    "es": ["el", "los", "y", "las", "una"],
}


def tokens_ws(text: Column) -> Column:
    """Whitespace tokenization (split on runs of spaces)."""
    return F.split(text, r"\s+")


def token_count_ws(text: Column) -> Column:
    return F.size(tokens_ws(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish regex token count (letter runs / digit runs / punct)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_TOKEN_RE), F.lit(0)))


def _count_in(tokens: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens_ws(F.lower(text))
    return F.round(_count_in(toks, STOPWORDS[lang]) / F.size(toks), 4)


def quality_features(text: Column) -> dict[str, Column]:
    """Document quality scoring features (length / punct / stopword ratios)."""
    toks = tokens_ws(F.lower(text))
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_token_len": F.round((n_chars - n_tokens + 1) / n_tokens, 4),
        "stopword_ratio": F.round(_count_in(toks, STOPWORDS["en"]) / n_tokens, 4),
        "uniq_token_ratio": F.round(F.size(F.array_distinct(toks)) / n_tokens, 4),
    }


def lang_id(text: Column) -> Column:
    """N-gram/stopword language-ID heuristic.

    CJK codepoints -> zh; otherwise the language whose stopword list hits
    most tokens (ties broken in en>de>fr>es order); no hits -> 'und'.
    """
    toks = tokens_ws(F.lower(text))
    counts = {lg: _count_in(toks, ws) for lg, ws in STOPWORDS.items()}
    best = F.greatest(*counts.values())
    out = F.when(text.rlike(r"[一-鿿]"), F.lit("zh")).when(best == 0, F.lit("und"))
    for lg in ["en", "de", "fr", "es"]:  # tie-break order
        out = out.when(counts[lg] == best, F.lit(lg))
    return out


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text (rolling-hash analog; md5 exists in both engines)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))
