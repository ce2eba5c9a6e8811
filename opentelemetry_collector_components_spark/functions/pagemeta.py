"""HTML head metadata extraction: description, canonical URL, OpenGraph
fields, charset, document language, and meta-robots directives.

Corpus curation reads these before it reads the body: the canonical link
is a dedup key (``operators/urls.py``), meta robots ``noindex`` is a
compliance filter beside robots.txt (``operators/robots.py``), OpenGraph
title/description feed snippet quality scoring, and charset/lang drive
decode + language routing.  HTML attributes come in either order
(``<meta name=.. content=..>`` and ``<meta content=.. name=..>`` are both
common) and any case, so every extractor is a pair of case-insensitive
regexes coalesced — all JVM ``regexp_extract`` over the decoded bytes,
scan-fused, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _nonempty(col: Column) -> Column:
    return F.when(col != "", col)


def _meta_content(html: Column, attr: str, name: str) -> Column:
    fwd = F.regexp_extract(
        html,
        rf"""(?i)<meta\s[^>]*{attr}=["']{name}["'][^>]*content=["']([^"']*)["']""",
        1,
    )
    rev = F.regexp_extract(
        html,
        rf"""(?i)<meta\s[^>]*content=["']([^"']*)["'][^>]*{attr}=["']{name}["']""",
        1,
    )
    return _nonempty(F.when(fwd != "", fwd).otherwise(rev))


def meta_description(html: Column) -> Column:
    return _meta_content(html, "name", "description")


def og_property(html: Column, prop: str) -> Column:
    """content of ``<meta property="og:<prop>">``."""
    return _meta_content(html, "property", f"og:{prop}")


def canonical_url(html: Column) -> Column:
    fwd = F.regexp_extract(
        html,
        r"""(?i)<link\s[^>]*rel=["']canonical["'][^>]*href=["']([^"']*)["']""",
        1,
    )
    rev = F.regexp_extract(
        html,
        r"""(?i)<link\s[^>]*href=["']([^"']*)["'][^>]*rel=["']canonical["']""",
        1,
    )
    return _nonempty(F.when(fwd != "", fwd).otherwise(rev))


def meta_charset(html: Column) -> Column:
    """``<meta charset=...>`` or the http-equiv Content-Type form,
    lowercased."""
    direct = F.regexp_extract(
        html, r"""(?i)<meta\s+charset=["']?([a-z0-9_.:-]+)""", 1
    )
    equiv = F.regexp_extract(
        _meta_content(html, "http-equiv", "content-type"),
        r"(?i)charset=([a-z0-9_.:-]+)",
        1,
    )
    return _nonempty(F.lower(F.when(direct != "", direct).otherwise(equiv)))


def html_lang(html: Column) -> Column:
    return _nonempty(
        F.regexp_extract(html, r"""(?i)<html\s[^>]*lang=["']([^"']*)["']""", 1)
    )


def meta_robots_flags(html: Column) -> tuple[Column, Column]:
    """(noindex BOOLEAN, nofollow BOOLEAN) from ``<meta name="robots">``
    content tokens (comma/space separated, case-insensitive); a page
    without the tag is (false, false) — indexable by default."""
    content = F.lower(F.coalesce(_meta_content(html, "name", "robots"), F.lit("")))
    toks = F.transform(F.split(content, r"[,\s]+"), lambda t: F.trim(t))
    return (
        F.array_contains(toks, "noindex"),
        F.array_contains(toks, "nofollow"),
    )


def page_metadata(df, html_col: str = "html"):
    """Attach the full head-metadata column set to a pages frame."""
    html = F.col(html_col).cast("string")
    noindex, nofollow = meta_robots_flags(html)
    return df.withColumns(
        {
            "meta_description": meta_description(html),
            "canonical": canonical_url(html),
            "og_title": og_property(html, "title"),
            "charset": meta_charset(html),
            "html_lang": html_lang(html),
            "noindex": noindex,
            "nofollow": nofollow,
        }
    )
