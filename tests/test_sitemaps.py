"""Sitemap urlset/sitemapindex parsing and robots Sitemap discovery:
hand-checked bodies per spec branch (trim, case, optional fields, drops)."""

from __future__ import annotations

from datetime import datetime

from opentelemetry_collector_components_spark.operators.sitemaps import (
    parse_sitemaps,
    robots_sitemap_urls,
)


def _files(spark, rows):
    return spark.createDataFrame(rows, "host string, body string")


def test_urlset_fields_and_dropped_entries(spark):
    body = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>\n https://s.org/a \n</loc>"
        "<lastmod>2026-02-03T10:20:30Z</lastmod>"
        "<changefreq>WEEKLY</changefreq><priority>0.8</priority></url>"
        "<url><loc>https://s.org/b</loc><lastmod>2026-02-04</lastmod></url>"
        "<url><lastmod>2026-01-01</lastmod></url>"  # loc-less: dropped
        "<url><loc>https://s.org/c</loc><priority>high</priority></url>"
        "</urlset>"
    )
    out = parse_sitemaps(_files(spark, [("s.org", body)])).orderBy("loc")
    rows = out.collect()
    assert [r.loc for r in rows] == [
        "https://s.org/a", "https://s.org/b", "https://s.org/c",
    ]
    a, b, c = rows
    assert a.kind == "url"
    assert a.lastmod_ts == datetime(2026, 2, 3, 10, 20, 30)
    assert a.changefreq == "weekly" and a.priority == 0.8
    # date-only lastmod is midnight; absent fields are NULL
    assert b.lastmod_ts == datetime(2026, 2, 4)
    assert b.changefreq is None and b.priority is None
    # non-numeric priority -> NULL, not an error
    assert c.priority is None and c.lastmod_ts is None


def test_sitemapindex_and_case_insensitive_tags(spark):
    body = (
        "<SITEMAPINDEX>"
        "<SiteMap><Loc>https://s.org/s1.xml</Loc>"
        "<LastMod>2026-01-10</LastMod></SiteMap>"
        "<sitemap><loc>https://s.org/s2.xml</loc></sitemap>"
        "</SITEMAPINDEX>"
    )
    out = parse_sitemaps(_files(spark, [("s.org", body)])).orderBy("loc")
    rows = out.collect()
    assert [(r.kind, r.loc) for r in rows] == [
        ("sitemap", "https://s.org/s1.xml"),
        ("sitemap", "https://s.org/s2.xml"),
    ]
    assert rows[0].lastmod_ts == datetime(2026, 1, 10)


def test_robots_sitemap_lines(spark):
    body = (
        "User-agent: *\nDisallow: /private/\n"
        "SITEMAP: https://s.org/a.xml  \n"
        "sitemap:https://s.org/b.xml # trailing comment\r\n"
        "# sitemap: https://s.org/commented.xml\n"
        "Sitemap:\n"  # empty value: dropped
    )
    out = robots_sitemap_urls(_files(spark, [("s.org", body)]))
    got = sorted(r.sitemap_url for r in out.collect())
    assert got == ["https://s.org/a.xml", "https://s.org/b.xml"]
