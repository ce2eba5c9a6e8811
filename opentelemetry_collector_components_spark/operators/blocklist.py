"""Category blocklist matching over document text (UT1-style hygiene).

The webtext filtering stage every production corpus pipeline runs
before training: category word/phrase lists (the shape of the public
UT1 blacklists — adult, gambling, malware, ...) matched against every
document, emitting per-category hit counts that downstream policy
turns into drops or downweights.  Complements ``pii_scrub`` (rewrites
spans), ``text_quality`` (statistical scores), and
``urls.registered_domain`` (domain-level blocking: broadcast-join the
eTLD+1 against a domain list — that path needs no new operator).

Matching semantics: phrases are lowercased, regex-escaped, and
compiled into ONE word-boundary alternation per category, ordered
longest-first so a multi-word phrase wins over its prefix word at the
same position in both engines (Java regex and RE2 are leftmost-first
alternations).  Counts are non-overlapping left-to-right matches —
``regexp_count`` on the Spark side, ``len(regexp_extract_all(...))``
in the DuckDB oracle, same scan semantics.

Scale shape: one scan-fused pass — one JVM ``regexp_count`` column
per category (categories are few; list SIZE grows the regex, not the
pass count), stacked to (id, category, n_hits) rows by an explode of
a small struct array.  No UDF, no join, no shuffle before the
(bounded) output.  Pattern size is the practical limit: beyond a few
thousand phrases per category, shard the category into chunked
alternations (same plan shape, k regex columns) — noted here rather
than hidden.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def category_pattern(phrases: list[str]) -> str:
    """The shared category regex: lowercase, escaped, word-bounded,
    longest-first — exported so the oracle embeds the identical
    pattern (Java∩RE2 subset)."""
    if not phrases:
        raise ValueError("category phrase list must be non-empty")
    ordered = sorted({p.lower().strip() for p in phrases},
                     key=lambda p: (-len(p), p))
    if any(not p for p in ordered):
        raise ValueError("blank phrase in category list")
    alts = "|".join(re.escape(p) for p in ordered)
    return rf"\b(?:{alts})\b"


def blocklist_matches(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    categories: dict[str, list[str]],
) -> DataFrame:
    """Per-document category hits: (``id_col``, category, n_hits),
    rows only where n_hits > 0.  Dict iteration order does not matter
    — output is one row per (doc, category) regardless."""
    if not categories:
        raise ValueError("categories must be non-empty")
    low = F.lower(F.col(text_col))
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("category"),
                F.regexp_count(low, F.lit(category_pattern(phrases)))
                .cast("long")
                .alias("n_hits"),
            )
            for name, phrases in sorted(categories.items())
        ]
    )
    return (
        docs.select(F.col(id_col), F.explode(entries).alias("e"))
        .select(id_col, "e.category", "e.n_hits")
        .where(F.col("n_hits") > 0)
    )


def blocklist_filter(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    categories: dict[str, list[str]],
    max_total_hits: int = 0,
) -> DataFrame:
    """Documents whose TOTAL hits across all categories stay <=
    ``max_total_hits`` (default: zero tolerance).  Same single-pass
    shape; the filter is a sum of the category count columns, no
    join-back."""
    if max_total_hits < 0:
        raise ValueError("max_total_hits must be >= 0")
    low = F.lower(F.col(text_col))
    total = None
    for _, phrases in sorted(categories.items()):
        cnt = F.regexp_count(low, F.lit(category_pattern(phrases)))
        total = cnt if total is None else total + cnt
    if total is None:
        raise ValueError("categories must be non-empty")
    return docs.where(total.cast("long") <= max_total_hits)
