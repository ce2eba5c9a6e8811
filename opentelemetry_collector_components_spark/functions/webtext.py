"""Web-text corpus hygiene functions for training-data pipelines.

Not part of the reference's surface — these are the repetition-filter /
PII-redaction operators a 100 TB web-text pipeline applies between parse
and dedup (the Gopher/C4 rule families).  All pure JVM higher-order-
function expressions (whole-stage codegen, no Python in the hot path);
every one has an exact SQL restatement so it is oracle-checkable.

Scale notes:
- per-document repetition features are O(L^2) in the number of units
  (lines / bigrams) because the mode-count is computed with a
  filter-inside-transform; ``max_tokens`` caps L so the cost per row is
  bounded regardless of document length (the standard practice: quality
  signals stabilize after the first ~1k tokens).
- everything here is a narrow projection — no shuffle, no UDF, safe to
  fuse into any scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Redaction patterns kept to the syntax subset shared by Java regex (Spark)
# and RE2 (DuckDB) so the oracle restatement is exact.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{7,15}",
}
# Scrub order matters: emails first (their domains contain dotted tokens an
# IPv4 pattern could clip), then IPs, then bare international phone numbers.
PII_ORDER = ["email", "ipv4", "phone"]


def chunk_tokens(text: Column, size: int = 8) -> Column:
    """Split ``text`` into pseudo-lines: space-joined chunks of ``size``
    whitespace tokens.  Web text would chunk on '\\n'; the synthetic corpus
    has no newlines, so fixed token windows stand in as the line unit."""
    toks = F.split(text, r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(size)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * size + 1, size), " "),
    )


def _mode_weight(units: Column, weight) -> Column:
    """max over distinct units of count(unit) * weight(unit)."""
    return F.array_max(
        F.transform(
            F.array_distinct(units),
            lambda u: F.size(F.filter(units, lambda x: x == u)) * weight(u),
        )
    )


def repetition_features(
    text: Column, chunk_size: int = 8, max_tokens: int = 512
) -> dict[str, Column]:
    """Gopher-style repetition signals over pseudo-lines and word bigrams.

    - dup_line_frac:        1 - distinct(lines)/lines
    - dup_line_char_frac:   chars inside lines occurring >1 time / chars
    - top_bigram_char_frac: chars covered by the most-covering word bigram
                            (count * len) / chars
    - dup_bigram_frac:      1 - distinct(bigrams)/bigrams
    """
    toks = F.slice(F.split(text, r"\s+"), 1, max_tokens)
    capped = F.array_join(toks, " ")
    lines = chunk_tokens(capped, chunk_size)
    n_lines = F.size(lines)
    n_chars = F.length(capped)
    dup_lines = F.filter(
        lines, lambda l: F.size(F.filter(lines, lambda x: x == l)) > 1
    )
    dup_chars = F.aggregate(
        dup_lines, F.lit(0), lambda acc, l: acc + F.length(l)
    )
    n_tok = F.size(toks)
    bigrams = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tok - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bi = F.size(bigrams)
    top_bi_chars = F.when(
        n_bi > 0, _mode_weight(bigrams, lambda u: F.length(u))
    ).otherwise(F.lit(0))
    return {
        "n_lines": n_lines.cast("long"),
        "dup_line_frac": F.round(1 - F.size(F.array_distinct(lines)) / n_lines, 4),
        "dup_line_char_frac": F.round(dup_chars / n_chars, 4),
        "top_bigram_char_frac": F.round(top_bi_chars / n_chars, 4),
        "dup_bigram_frac": F.when(
            n_bi > 0, F.round(1 - F.size(F.array_distinct(bigrams)) / n_bi, 4)
        ).otherwise(F.lit(0.0)),
    }


def pii_counts(text: Column) -> dict[str, Column]:
    return {
        f"n_{name}": F.size(
            F.regexp_extract_all(text, F.lit(pat), F.lit(0))
        ).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def pii_scrub(text: Column) -> Column:
    """Replace each PII class with a typed placeholder token."""
    out = text
    for name in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[name], f"<{name.upper()}>")
    return out
