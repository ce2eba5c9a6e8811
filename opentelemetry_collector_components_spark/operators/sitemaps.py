"""Sitemap ingestion: XML urlset/sitemapindex parsing and robots.txt
sitemap discovery.

Sitemaps are the crawl scheduler's push signal — the site tells the
crawler what exists and when it changed — and pair with the pull signals
already in the repo (``operators/recrawl.py`` churn rates,
``operators/robots.py`` permissions).  The reference pipeline has no
sitemap stage (it ingests telemetry, not crawls); this is part of the
crawl-native surface mandated by BASELINE.json's Common-Crawl input shape,
built the same way as the rest of the repo: JVM regexp extraction over the
decoded body, one explode, zero Python in the data path.

Format per sitemaps.org (the public protocol): a ``<urlset>`` of ``<url>``
entries carrying ``<loc>`` (required) and optional ``<lastmod>`` (W3C
datetime: date-only or full timestamp), ``<changefreq>``, ``<priority>``;
or a ``<sitemapindex>`` of ``<sitemap>`` entries carrying ``<loc>`` /
``<lastmod>``.  Tag names are matched case-insensitively and ``<loc>``
values are whitespace-trimmed (the spec allows both).

Scale shape: parse is map-only (two non-greedy regexp scans + one explode
per kind).  A 50k-URL sitemap body (the spec cap) explodes to 50k rows
from one input row — downstream joins should repartition after the parse
rather than inherit the one-row-per-file layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

URL_BLOCK = "(?is)<url>(.*?)</url>"
SITEMAP_BLOCK = "(?is)<sitemap>(.*?)</sitemap>"


def _field(block: Column, tag: str) -> Column:
    raw = F.regexp_extract(
        block, f"(?is)<{tag}>\\s*(.*?)\\s*</{tag}>", 1
    )
    return F.when(raw != "", raw)


def _lastmod_ts(lastmod: Column) -> Column:
    # W3C datetime: full timestamp with zone designator, or date-only
    # (midnight).  try_to_timestamp returns NULL on mismatch, so the
    # coalesce ladder is total.
    return F.coalesce(
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd")),
    )


def parse_sitemaps(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """One row per sitemap entry: (host, kind, loc, lastmod_ts,
    changefreq, priority).

    ``kind`` is ``'url'`` for urlset entries and ``'sitemap'`` for index
    entries (an index file's children are fetch targets, not documents).
    Entries without a ``<loc>`` are dropped per spec; ``changefreq`` is
    lowercased; ``priority`` is a DOUBLE (NULL when absent or
    non-numeric).
    """
    body = F.col(body_col).cast("string")
    host = F.col(host_col).alias("host")

    def entries(pattern: str, kind: str) -> DataFrame:
        block = F.explode(
            F.regexp_extract_all(body, F.lit(pattern), F.lit(1))
        ).alias("_block")
        base = df.select(host, block)
        b = F.col("_block")
        return base.select(
            "host",
            F.lit(kind).alias("kind"),
            _field(b, "loc").alias("loc"),
            _lastmod_ts(_field(b, "lastmod")).alias("lastmod_ts"),
            F.lower(_field(b, "changefreq")).alias("changefreq"),
            _field(b, "priority").try_cast("double").alias("priority"),
        )

    out = entries(URL_BLOCK, "url").unionByName(
        entries(SITEMAP_BLOCK, "sitemap")
    )
    return out.where(F.col("loc").isNotNull())


def robots_sitemap_urls(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Sitemap discovery from robots.txt: one row per ``Sitemap:`` line.

    Per RFC 9309 §2.3 the Sitemap field is non-group (valid anywhere in
    the file, any capitalization) and its value is an absolute URL —
    extracted here with the same line-split discipline as
    ``operators/robots.py::parse_robots`` (comments stripped, values
    trimmed, empty values dropped).
    """
    body = F.col(body_col).cast("string")
    line = F.explode(F.split(body, "\r?\n")).alias("_line")
    base = df.select(F.col(host_col).alias("host"), line)
    # strip trailing comment, then match the field name case-insensitively
    clean = F.trim(F.regexp_replace(F.col("_line"), "#.*$", ""))
    value = F.trim(F.regexp_extract(clean, r"(?i)^sitemap\s*:\s*(.+)$", 1))
    return (
        base.select("host", value.alias("sitemap_url"))
        .where(F.col("sitemap_url") != "")
    )
