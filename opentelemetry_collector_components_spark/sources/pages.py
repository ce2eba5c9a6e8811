"""Deterministic Common-Crawl-style `pages` table generator.

The input shape mandated by BASELINE.json: ``(url string, warc_ts timestamp,
html binary, text string, lang string)``.  Every column is a pure function of
``row_id`` built from JVM-side expressions (``spark.range`` + builtins) — no
Python in the data path, no wall clock, no RNG state.  This is the analog of
the reference's ``loadgenreceiver`` corpus replay
(receiver/loadgenreceiver/logs.go:58-109) recast as a columnar generator.

Skew is built in on purpose (FIXTURES.md §1): ~20%% of rows land on 3 hot
domains so the salted-repartition path (processor/partitioningprocessor
analog) is actually exercised.

The embedded ``text`` column is a grok-able log line:

    ts=<iso> level=<INFO|WARN|ERROR> svc=<svc-N> code=<100..599>
    dur_us=<int> msg="<verb> /p/<n>"

with a fixed 1%% of rows malformed (level+code dropped) to test error
routing, mirroring the reference's malformed-NDJSON handling
(receiver/elasticapmintakereceiver/internal/ndjsondecoder/stream.go:97-300).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_DOMAINS = 50
N_HOT = 3
N_COLD = N_DOMAINS - N_HOT
HOT_PCT = 20  # percent of rows on the hot domains
EPOCH_2026 = 1767225600  # 2026-01-01T00:00:00Z

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def domain_expr(id_col):
    """Domain as a pure function of row id with Zipf-ish head skew."""
    is_hot = F.pmod(F.xxhash64(id_col), F.lit(100)) < F.lit(HOT_PCT)
    hot = F.concat(F.lit("hot"), F.pmod(id_col, F.lit(N_HOT)), F.lit(".example.com"))
    cold = F.concat(
        F.lit("d"),
        F.pmod(F.xxhash64(id_col, F.lit(1)), F.lit(N_COLD)),
        F.lit(".example.org"),
    )
    return F.when(is_hot, hot).otherwise(cold)


def generate_pages(
    spark: SparkSession,
    n_rows: int,
    partitions: int | None = None,
    replayable: bool = False,
) -> DataFrame:
    """Generate the pages table: columns are exact functions of ``id``.

    ``spark.range`` is already parallel; every derived column stays inside
    whole-stage codegen, so the generator itself scales linearly with cores
    (it stands in for an Iceberg scan in the benchmarks).

    ``replayable=True`` swaps the two xxhash64-derived columns (domain
    skew, 1% malformed picks) for mod-arithmetic twins so an ANSI-SQL
    oracle can rebuild every row from ``range(n)`` — used by the
    flagship-pipeline gate; benchmarks keep the hashed default.
    """
    df = spark.range(0, n_rows, 1, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    id_ = F.col("id")

    domain = domain_expr_replayable(id_) if replayable else domain_expr(id_)
    path = F.concat(F.lit("p/"), F.pmod(id_, F.lit(1000)))
    url = F.concat(F.lit("https://"), domain, F.lit("/"), path)

    warc_ts = F.timestamp_seconds(F.lit(EPOCH_2026) + F.pmod(id_, F.lit(86400)))
    iso = F.date_format(warc_ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")

    lvl_bucket = F.pmod(id_, F.lit(10))
    level = (
        F.when(lvl_bucket <= 6, F.lit("INFO"))
        .when(lvl_bucket <= 8, F.lit("WARN"))
        .otherwise(F.lit("ERROR"))
    )
    svc = F.concat(F.lit("svc-"), F.pmod(id_, F.lit(20)))
    code = (F.lit(100) + F.pmod(id_ * F.lit(7), F.lit(500))).cast("int")
    dur_us = F.pmod(id_ * F.lit(131), F.lit(1000000))
    verb_bucket = F.pmod(id_, F.lit(3))
    verb = (
        F.when(verb_bucket == 0, F.lit("GET"))
        .when(verb_bucket == 1, F.lit("POST"))
        .otherwise(F.lit("PUT"))
    )
    msg = F.concat(F.lit('msg="'), verb, F.lit(" /"), path, F.lit('"'))

    well_formed = F.concat_ws(
        " ",
        F.concat(F.lit("ts="), iso),
        F.concat(F.lit("level="), level),
        F.concat(F.lit("svc="), svc),
        F.concat(F.lit("code="), code),
        F.concat(F.lit("dur_us="), dur_us),
        msg,
    )
    # fixed 1% malformed: level+code missing entirely
    malformed = F.concat_ws(
        " ",
        F.concat(F.lit("ts="), iso),
        F.concat(F.lit("svc="), svc),
        F.concat(F.lit("dur_us="), dur_us),
        msg,
    )
    is_malformed = (
        F.pmod(id_, F.lit(100)) == F.lit(0)
        if replayable
        else F.pmod(F.xxhash64(id_, F.lit(2)), F.lit(100)) == F.lit(0)
    )
    text = F.when(is_malformed, malformed).otherwise(well_formed)

    lang_bucket = F.pmod(id_, F.lit(20))
    lang = (
        F.when(lang_bucket < 12, F.lit("en"))   # 60%
        .when(lang_bucket < 15, F.lit("de"))    # 15%
        .when(lang_bucket < 17, F.lit("fr"))    # 10%
        .when(lang_bucket < 19, F.lit("es"))    # 10%
        .otherwise(F.lit("ja"))                  # 5%
    )

    html = F.concat(
        F.lit("<html><head><title>T"),
        id_,
        F.lit("</title></head><body>"),
        text,
        F.lit("</body></html>"),
    ).cast("binary")

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        id_.alias("doc_id"),  # kept for golden joins; drop with select(PAGES_COLUMNS) if strict shape needed
    )


def domain_expr_replayable(id_col):
    """Mod-based domain (same hot/cold shape as ``domain_expr`` with an
    exact 20% hot share) for fixtures whose oracle must rebuild the URL in
    ANSI SQL — ``xxhash64`` has no DuckDB equivalent."""
    is_hot = F.pmod(id_col, F.lit(5)) == 0
    hot = F.concat(F.lit("hot"), F.pmod(id_col, F.lit(N_HOT)), F.lit(".example.com"))
    cold = F.concat(F.lit("d"), F.pmod(id_col, F.lit(N_COLD)), F.lit(".example.org"))
    return F.when(is_hot, hot).otherwise(cold)


def generate_linked_pages(
    spark: SparkSession, n_rows: int, replayable: bool = False
) -> DataFrame:
    """Pages with deterministic anchor tags appended to the html — the
    web-graph fixture (operators/webgraph.py gates).

    Every page gets one absolute link; rows also cycle through the other
    href shapes crawlers meet (root-relative, directory-relative,
    protocol-relative, fragment-suffixed, quote-style variants, and the
    empty/pure-fragment hrefs that must be dropped), all pure functions of
    ``doc_id``.  ``replayable=True`` swaps the hashed-skew domain for the
    mod-based one so the DuckDB oracle can rebuild the identical URL set.
    """
    df = generate_pages(spark, n_rows)
    id_ = F.col("doc_id")
    if replayable:
        domain = domain_expr_replayable(id_)
        df = df.withColumn(
            "url",
            F.concat(
                F.lit("https://"), domain, F.lit("/p/"), F.pmod(id_, F.lit(1000))
            ),
        )
    absolute = F.concat(
        F.lit('<a href="https://d'), F.pmod(id_ * F.lit(3), F.lit(N_COLD)),
        F.lit(".example.org/p/"), F.pmod(id_, F.lit(97)), F.lit('">x</a>'),
    )
    root_rel = F.when(
        F.pmod(id_, F.lit(2)) == 0,
        F.concat(F.lit("<a href='/p/"), F.pmod(id_ + 1, F.lit(1000)), F.lit("'>y</a>")),
    ).otherwise(F.lit(""))
    dir_rel = F.when(
        F.pmod(id_, F.lit(3)) == 0,
        F.concat(F.lit('<a href="q/'), F.pmod(id_, F.lit(13)), F.lit('">z</a>')),
    ).otherwise(F.lit(""))
    proto_rel = F.when(
        F.pmod(id_, F.lit(5)) == 0,
        F.concat(F.lit('<a href="//hot'), F.pmod(id_ + 1, F.lit(N_HOT)), F.lit('.example.com/pp">w</a>')),
    ).otherwise(F.lit(""))
    fragment = F.when(
        F.pmod(id_, F.lit(7)) == 0,
        F.concat(F.lit('<a href="https://d'), F.pmod(id_, F.lit(N_COLD)),
                 F.lit('.example.org/f#sec'), F.pmod(id_, F.lit(4)), F.lit('">f</a>')),
    ).otherwise(F.lit(""))
    noise = F.when(
        F.pmod(id_, F.lit(11)) == 0,
        F.lit(
            '<a href="">e</a><a href="#top">t</a>'
            '<a href="mailto:crawl@example.org">m</a>'
            '<a href="javascript:void(0)">j</a>'
        ),
    ).otherwise(F.lit(""))
    # uppercase tag + attribute: HTML is case-insensitive and real crawls
    # carry <A HREF=...>; the extractor must still see this link
    upper_tag = F.when(
        F.pmod(id_, F.lit(13)) == 0,
        F.concat(
            F.lit("<A HREF='https://hot"), F.pmod(id_, F.lit(N_HOT)),
            F.lit(".example.com/u'>U</A>"),
        ),
    ).otherwise(F.lit(""))
    # anchors wrapping child elements — a large share of real links: the
    # styled-text anchor must yield tag-stripped collapsed text
    # ('big deal', across a newline), the image anchor must survive as a
    # link with NULL text
    wrapped = F.when(
        F.pmod(id_, F.lit(17)) == 0,
        F.concat(
            F.lit('<a href="https://b'), F.pmod(id_, F.lit(7)),
            F.lit('.example.net/d"><b>big</b>\ndeal</a>'),
        ),
    ).otherwise(F.lit(""))
    img_anchor = F.when(
        F.pmod(id_, F.lit(19)) == 0,
        F.concat(
            F.lit('<a href="https://c'), F.pmod(id_, F.lit(5)),
            F.lit('.example.net/i"><img src="x.png"/></a>'),
        ),
    ).otherwise(F.lit(""))
    links = F.concat(
        absolute, root_rel, dir_rel, proto_rel, fragment, noise, upper_tag,
        wrapped, img_anchor,
    )
    html = F.concat(
        F.col("html").cast("string"), F.lit("<nav>"), links, F.lit("</nav>")
    ).cast("binary")
    return df.withColumn("html", html)


def generate_article_pages(spark: SparkSession, n_rows: int) -> DataFrame:
    """Article-page fixture (functions/webtext.py::main_content gate):
    link-dense nav and footer (dropped by density), a too-short block, a
    script subtree (removed wholesale), and 1-3 content paragraphs — all
    closed-form in the id so the oracle can replay the expected
    main_text string exactly."""
    df = spark.range(n_rows)
    id_ = F.col("id")
    p1 = F.concat(
        F.lit("<p>Article "), id_,
        F.lit(" &amp; friends paragraph one with enough characters to keep around.</p>"),
    )
    p2 = F.when(
        F.pmod(id_, F.lit(3)) != 0,
        F.concat(
            F.lit("<p>Second paragraph of article "), id_,
            F.lit(' links to <a href="/ref">reference '), F.pmod(id_, F.lit(5)),
            F.lit("</a> inline and stays.</p>"),
        ),
    ).otherwise(F.lit(""))
    p3 = F.when(
        F.pmod(id_, F.lit(4)) == 0,
        F.concat(
            F.lit("<p>Closing thoughts for article "), id_,
            F.lit(" wrap up the discussion nicely here.</p>"),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit(
            '<html><body><nav><a href="/">Home page</a> '
            '<a href="/about">About the site</a> '
            '<a href="/contact">Contact and careers</a></nav>'
        ),
        p1,
        F.lit("<div>tiny</div>"),
        F.lit('<script>var x = "not content with many characters";</script>'),
        p2,
        p3,
        F.lit(
            '<footer><a href="/tos">Terms of service</a> '
            '<a href="/privacy">Privacy and cookies</a></footer></body></html>'
        ),
    )
    return df.select(id_.alias("doc_id"), html.cast("binary").alias("html"))


def generate_robots(spark: SparkSession, n_hosts: int) -> DataFrame:
    """robots.txt fixture: (host, body binary) — one body per host, every
    line a pure function of the host id (operators/robots.py gates).

    Exercises: comments, blank lines inside a group, mixed-case field
    names and agent names, multi-agent group headers, empty-path rules
    (dropped), and unknown fields (ignored).
    """
    df = spark.range(n_hosts)
    id_ = F.col("id")
    host = F.concat(F.lit("d"), id_, F.lit(".example.org"))
    star_extra = F.when(
        F.pmod(id_, F.lit(5)) == 0, F.lit("Allow: /p/\n")
    ).otherwise(F.lit(""))
    bot_group = F.when(
        F.pmod(id_, F.lit(2)) == 0,
        F.concat(
            F.lit("\nUser-Agent: GPTBot\nUser-agent: ccbot\nDisallow: /\n"),
            F.when(
                F.pmod(id_, F.lit(3)) == 0, F.lit("Allow: /p/\n")
            ).otherwise(F.lit("")),
        ),
    ).otherwise(F.lit(""))
    # the RFC 9309 exemption idiom: a group whose only rule is an empty
    # Disallow (= allow everything for that agent) — must NOT vanish in
    # parsing, or the agent would fall back to the '*' group
    exempt_group = F.when(
        F.pmod(id_, F.lit(11)) == 0,
        F.lit("\nUser-agent: ExemptBot\nDisallow:\n"),
    ).otherwise(F.lit(""))
    tail_noise = F.when(
        F.pmod(id_, F.lit(7)) == 0,
        F.lit("DISALLOW:\nCrawl-delay: 5\nSitemap: https://x/s.xml\n"),
    ).otherwise(F.lit(""))
    body = F.concat(
        F.lit("# robots fixture\nUser-agent: *\nDisallow: /private/\n"),
        F.lit("\n"),  # blank line inside the group must not split it
        F.lit("Allow: /private/ok\n"),
        star_extra,
        bot_group,
        exempt_group,
        tail_noise,
    )
    # every 4th host serves CRLF line endings (RFC 9309's grammar is
    # CRLF; the parser must handle both)
    body = F.when(
        F.pmod(id_, F.lit(4)) == 1, F.regexp_replace(body, "\n", "\r\n")
    ).otherwise(body)
    return df.select(host.alias("host"), body.cast("binary").alias("body"))


def generate_frontier_urls(spark: SparkSession, n_rows: int, n_hosts: int) -> DataFrame:
    """Crawl-frontier url fixture for the robots permission gate: urls
    cycling over the ``generate_robots`` hosts and four path shapes that
    hit every longest-match branch."""
    df = spark.range(n_rows)
    id_ = F.col("id")
    host = F.concat(F.lit("d"), F.pmod(id_, F.lit(n_hosts)), F.lit(".example.org"))
    path = (
        F.when(F.pmod(id_, F.lit(4)) == 0, F.lit("/private/ok"))
        .when(F.pmod(id_, F.lit(4)) == 1, F.lit("/private/secret"))
        .when(
            F.pmod(id_, F.lit(4)) == 2,
            F.concat(F.lit("/p/"), F.pmod(id_, F.lit(9))),
        )
        .otherwise(F.lit("/q"))
    )
    return df.select(
        id_.alias("url_id"),
        F.concat(F.lit("https://"), host, path).alias("url"),
    )


def generate_crawl_snapshot(
    spark: SparkSession, start: int, end: int, bump_mod: int | None = None
) -> DataFrame:
    """Crawl-snapshot fixture (operators/recrawl.py gates): (url, fp) for
    ids in [start, end).  ``fp`` is a mod-based content fingerprint the
    oracle can replay; ``bump_mod`` perturbs every id-th fingerprint (the
    "content changed" rows of a newer snapshot); every 50th row carries a
    NULL fingerprint (fetch succeeded, hashing skipped) to exercise the
    null-safe compare."""
    df = spark.range(start, end)
    id_ = F.col("id")
    base = F.pmod(id_ * F.lit(7919), F.lit(10007))
    fp = base
    if bump_mod is not None:
        fp = F.when(F.pmod(id_, F.lit(bump_mod)) == 0, base + 1).otherwise(base)
    fp = F.when(F.pmod(id_, F.lit(50)) == 0, F.lit(None).cast("long")).otherwise(
        fp.cast("long")
    )
    url = F.concat(
        F.lit("https://d"), F.pmod(id_, F.lit(40)), F.lit(".example.org/p/"), id_
    )
    return df.select(url.alias("url"), fp.alias("fp"))


def generate_encoded_pages(spark: SparkSession, n_rows: int) -> DataFrame:
    """Legacy-encoding html fixture (sources/decoders.py::decode_html_text
    gate): seven byte shapes by ``doc_id % 7`` — declared UTF-8, declared
    ISO-8859-1 (0xE9 é), declared windows-1252 (0x93/0x94 curly quotes),
    UTF-8 BOM with no meta, bare ASCII with no meta, the latin1 alias with
    a 0x80 byte (WHATWG folds to cp1252: Euro sign), and declared UTF-8
    containing an invalid 0xFF byte (must become U+FFFD, not drop the
    row)."""
    df = spark.range(n_rows)
    id_ = F.col("id")
    idb = id_.cast("string").cast("binary")
    kind = F.pmod(id_, F.lit(7))
    html = (
        F.when(kind == 0, F.concat(
            F.lit(b'<meta charset="utf-8"><p>caf\xc3\xa9 '), idb))
        .when(kind == 1, F.concat(
            F.lit(b'<meta charset="iso-8859-1"><p>caf\xe9 '), idb))
        .when(kind == 2, F.concat(
            F.lit(b'<meta charset="windows-1252"><p>\x93q\x94 '), idb))
        .when(kind == 3, F.concat(F.lit(b"\xef\xbb\xbf<p>bom "), idb))
        .when(kind == 4, F.concat(F.lit(b"<p>plain "), idb))
        .when(kind == 5, F.concat(
            F.lit(b'<meta charset="Latin1"><p>\x80 price '), idb))
        .otherwise(F.concat(
            F.lit(b'<meta charset="utf-8"><p>x\xffy '), idb))
    )
    return df.select(id_.alias("doc_id"), html.alias("html"))


def generate_prioritized_frontier(
    spark: SparkSession, n_rows: int, n_hosts: int
) -> DataFrame:
    """Frontier-with-priority fixture (operators/recrawl.py::
    schedule_fetches gate): (url_id, url, priority) with priorities that
    collide within a host (the deterministic url_id tie-break must
    decide)."""
    df = spark.range(n_rows)
    id_ = F.col("id")
    host = F.concat(F.lit("d"), F.pmod(id_, F.lit(n_hosts)), F.lit(".example.org"))
    return df.select(
        id_.alias("url_id"),
        F.concat(F.lit("https://"), host, F.lit("/p/"), id_).alias("url"),
        F.pmod(id_ * F.lit(7919), F.lit(101)).cast("long").alias("priority"),
    )


def generate_crawl_delays(spark: SparkSession, n_hosts: int) -> DataFrame:
    """Per-host Crawl-delay dim for ``schedule_fetches``: even host ids
    only (odd hosts must fall back to the default delay), delay cycling
    1..4 seconds."""
    df = spark.range(n_hosts).where(F.pmod(F.col("id"), F.lit(2)) == 0)
    id_ = F.col("id")
    return df.select(
        F.concat(F.lit("d"), id_, F.lit(".example.org")).alias("host"),
        (F.pmod(id_, F.lit(4)) + 1).cast("long").alias("crawl_delay_s"),
    )


def generate_fetch_headers(spark: SparkSession, n_rows: int) -> DataFrame:
    """Fetched-page cache-header fixture (operators/recrawl.py::
    refetch_decision gate): seven header shapes by ``id % 7`` covering
    fresh / stale-with-validator / no-store / no-cache / header-less /
    huge-max-age / validator-only rows, with fetch ages spread over 48
    hours so the same max-age lands on both sides of the freshness
    boundary."""
    df = spark.range(n_rows)
    id_ = F.col("id")
    kind = F.pmod(id_, F.lit(7))
    fetched = F.timestamp_add(
        "HOUR",
        F.pmod(id_, F.lit(48)).cast("long"),
        F.lit("2026-06-01 00:00:00").cast("timestamp"),
    )
    cache_control = (
        F.when(kind == 0, F.lit("public, max-age=86400"))
        .when(kind == 1, F.lit("max-age=60"))
        .when(kind == 2, F.lit("no-store, max-age=86400"))
        .when(kind == 3, F.lit("no-cache"))
        .when(kind == 5, F.lit("max-age=999999999"))
        .when(kind == 6, F.lit("private"))
    )
    etag = F.when(
        kind.isin(1, 6), F.concat(F.lit('"e'), id_, F.lit('"'))
    )
    last_modified = F.when(kind == 3, F.lit("Mon, 01 Jun 2026 00:00:00 GMT"))
    return df.select(
        F.concat(F.lit("https://d"), F.pmod(id_, F.lit(40)),
                 F.lit(".example.org/p/"), id_).alias("url"),
        fetched.alias("fetched_at"),
        cache_control.alias("cache_control"),
        etag.alias("etag"),
        last_modified.alias("last_modified"),
    )


def generate_sitemaps(spark: SparkSession, n_hosts: int) -> DataFrame:
    """Sitemap XML fixture: (host, body binary), one file per host
    (operators/sitemaps.py gates).

    Every 4th host serves a ``<sitemapindex>`` (two children, the first
    with a date-only lastmod); the rest serve a ``<urlset>`` whose three
    entries cycle the optional fields — a full W3C timestamp on the first,
    a mixed-case changefreq inside UPPERCASE tags on the second (tag names
    are case-insensitive), a priority on the third — plus a loc-less entry
    that must be dropped.  ``<loc>`` values carry the spec-legal leading /
    trailing whitespace on the first entry of each kind.
    """
    df = spark.range(n_hosts)
    id_ = F.col("id")
    base = F.concat(F.lit("https://d"), id_, F.lit(".example.org"))
    minute = F.lpad(F.pmod(id_, F.lit(60)).cast("string"), 2, "0")
    cf = (
        F.when(F.pmod(id_, F.lit(3)) == 0, F.lit("DAILY"))
        .when(F.pmod(id_, F.lit(3)) == 1, F.lit("Weekly"))
        .otherwise(F.lit("monthly"))
    )
    index_body = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?><sitemapindex>'),
        F.lit("<sitemap><loc>\n  "), base, F.lit("/s1.xml \n</loc>"),
        F.lit("<lastmod>2026-01-10</lastmod></sitemap>"),
        F.lit("<sitemap><loc>"), base, F.lit("/s2.xml</loc></sitemap>"),
        F.lit("</sitemapindex>"),
    )
    urlset_body = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?><urlset>'),
        F.lit("<url><loc>\n  "), base, F.lit("/p/0 \n</loc>"),
        F.lit("<lastmod>2026-03-15T04:"), minute, F.lit(":06Z</lastmod></url>"),
        F.lit("<URL><LOC>"), base, F.lit("/p/1</LOC><CHANGEFREQ>"), cf,
        F.lit("</CHANGEFREQ></URL>"),
        F.lit("<url><loc>"), base, F.lit("/p/2</loc><priority>0."),
        F.pmod(id_, F.lit(9)) + 1, F.lit("</priority></url>"),
        F.lit("<url><lastmod>2026-01-01</lastmod></url>"),
        F.lit("</urlset>"),
    )
    body = F.when(F.pmod(id_, F.lit(4)) == 0, index_body).otherwise(urlset_body)
    host = F.concat(F.lit("d"), id_, F.lit(".example.org"))
    return df.select(host.alias("host"), body.cast("binary").alias("body"))


def generate_binary_blobs(spark: SparkSession, n_rows: int) -> DataFrame:
    """Mixed-content binary fixture (functions/magic.py gate): each row
    carries a real file-signature prefix (built with ``unhex`` from the
    public magic-byte table) followed by a deterministic payload, cycling
    through ten content kinds by ``blob_id % 10``."""
    df = spark.range(n_rows)
    id_ = F.col("id")
    payload = F.lpad(F.hex(F.pmod(id_ * F.lit(2654435761), F.lit(4294967296))), 8, "0")
    kind = F.pmod(id_, F.lit(10))
    hex_blob = (
        F.when(kind == 0, F.concat(F.lit("89504E470D0A1A0A"), payload))
        .when(kind == 1, F.concat(F.lit("FFD8FFE0"), payload))
        .when(kind == 2, F.concat(F.lit("474946383961"), payload))
        .when(kind == 3, F.concat(F.lit("255044462D312E37"), payload))
        .when(kind == 4, F.concat(F.lit("1F8B08"), payload))
        .when(kind == 5, F.concat(F.lit("504B0304"), payload))
        .when(kind == 6, F.concat(F.lit("424D"), payload))
        .when(kind == 7, F.concat(F.lit("52494646"), payload, F.lit("57415645")))
        .when(kind == 8, F.concat(F.lit("000000186674797069736F6D"), payload))
    )
    html_blob = F.concat(F.lit("<!DOCTYPE html><p>"), id_).cast("binary")
    blob = F.when(kind == 9, html_blob).otherwise(F.unhex(hex_blob))
    return df.select(id_.alias("blob_id"), blob.alias("blob"))


def generate_fetch_log(spark: SparkSession, n_rows: int) -> DataFrame:
    """Fetch-log fixture (operators/redirects.py gate): (url, status,
    location) with closed-form redirect chains — relative and absolute
    Location values, chains that leave the log, a genuine 2-cycle every
    20 ids (ids 5<->6 mod 20), and plain 200 rows.  Kind precedence is a
    single CASE both engines replay."""
    df = spark.range(n_rows)
    id_ = F.col("id")
    m20 = F.pmod(id_, F.lit(20))
    m7 = F.pmod(id_, F.lit(7))
    kind = (
        F.when(m20 == 5, F.lit("cyc_a"))
        .when(m20 == 6, F.lit("cyc_b"))
        .when(m7 == 0, F.lit("rel"))
        .when(m7 == 1, F.lit("abs"))
        .when(m7 == 2, F.lit("dangle"))
        .when(m7 == 3, F.lit("failed"))
        .otherwise(F.lit("ok"))
    )
    status = (
        F.when(kind == "ok", F.lit(200))
        # a failed fetch: NULL status WITH a parseable Location — must
        # terminate 'ok', never be walked as a redirect
        .when(kind == "failed", F.lit(None))
        .when(kind == "abs", F.lit(302))
        .otherwise(F.lit(301))
    ).cast("int")
    location = (
        F.when(kind.isin("rel", "cyc_a", "failed"), F.concat(F.lit("/p/"), id_ + 1))
        .when(kind == "cyc_b", F.concat(F.lit("/p/"), id_ - 1))
        .when(kind == "abs", F.concat(F.lit("https://h.io/p/"), id_ + 2))
        .when(kind == "dangle", F.lit("https://gone.example/x"))
    )
    return df.select(
        F.concat(F.lit("https://h.io/p/"), id_).alias("url"),
        status.alias("status"),
        location.alias("location"),
    )


def generate_meta_pages(spark: SparkSession, n_rows: int) -> DataFrame:
    """Pages-with-head-metadata fixture (functions/pagemeta.py gate):
    deterministic <head> content cycling through both attribute orders,
    mixed case, OpenGraph tags, charset forms, meta robots directives,
    and rows with tags absent."""
    df = spark.range(n_rows)
    id_ = F.col("id")
    desc = F.when(
        F.pmod(id_, F.lit(3)) == 0,
        F.concat(F.lit('<meta name="description" content="desc '), id_, F.lit('">')),
    ).when(
        F.pmod(id_, F.lit(3)) == 1,
        F.concat(F.lit('<META content="rev '), id_, F.lit('" NAME="description">')),
    ).otherwise(F.lit(""))
    canon = F.when(
        F.pmod(id_, F.lit(4)) == 0,
        F.concat(F.lit('<link rel="canonical" href="https://c.io/p/'), F.pmod(id_, F.lit(100)), F.lit('">')),
    ).when(
        F.pmod(id_, F.lit(4)) == 1,
        F.concat(F.lit("<LINK HREF='https://c.io/q/"), F.pmod(id_, F.lit(100)), F.lit("' REL='canonical'>")),
    ).otherwise(F.lit(""))
    og = F.when(
        F.pmod(id_, F.lit(5)) == 0,
        F.concat(F.lit('<meta property="og:title" content="og '), id_, F.lit('">')),
    ).otherwise(F.lit(""))
    charset = F.when(
        F.pmod(id_, F.lit(6)) == 0, F.lit('<meta charset="UTF-8">')
    ).when(
        F.pmod(id_, F.lit(6)) == 1,
        F.lit('<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">'),
    ).otherwise(F.lit(""))
    robots = F.when(
        F.pmod(id_, F.lit(7)) == 0, F.lit('<meta name="robots" content="noindex, nofollow">')
    ).when(
        F.pmod(id_, F.lit(7)) == 1, F.lit("<meta name='robots' content='NOFOLLOW'>")
    ).otherwise(F.lit(""))
    lang = F.when(
        F.pmod(id_, F.lit(2)) == 0,
        F.concat(F.lit('<html lang="'),
                 F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                              (F.pmod(id_, F.lit(3)) + 1).cast("int")),
                 F.lit('">')),
    ).otherwise(F.lit("<html>"))
    html = F.concat(
        lang, F.lit("<head>"), desc, canon, og, charset, robots,
        F.lit("</head><body>b"), id_, F.lit("</body></html>"),
    )
    return df.select(id_.alias("doc_id"), html.cast("binary").alias("html"))
