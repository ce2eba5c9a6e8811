"""URL canonicalization + canonical-URL dedup for web-corpus pipelines.

A Common-Crawl-style corpus (the BASELINE.json input shape carries a
``url`` column) sees the same page under many spellings: scheme/host case,
default ports, ``www.`` prefixes, fragments, tracking parameters, query
order, trailing slashes.  Canonicalizing before any content-level dedup
removes the cheapest duplicate class at scan cost — pure JVM column
expressions, no UDF, no shuffle — and gives content dedup a stable join
key.

Rules (the common subset of the public WARC/crawler conventions):

- scheme and host lowercase; ``www.`` prefix dropped
- default ports stripped (``http:80``, ``https:443``); others kept
- fragment dropped
- tracking params dropped (``utm_*``, ``gclid``, ``fbclid``, ``ref``),
  remaining query params sorted bytewise; empty query dropped
- trailing slashes trimmed from the path; empty path becomes ``/``

Every rule is restatable in ANSI-ish SQL (regexp in the Java∩RE2 subset
this repo already uses for PII), which is what lets the gates verify the
whole pipeline value-exactly against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# params dropped during canonicalization: anchored key, with or without a
# value ("?ref" must collapse the same as "?ref=feed")
TRACKING_PARAM_RE = "^(utm_[^=&]*|gclid|fbclid|ref)(=|$)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s)-style URL as one JVM
    expression tree (regexp extracts + array ops — scan-fused, no UDF)."""
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, "^([^/?]*)", 1)
    pathq = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, "^([^:]*)", 1)), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qjoined = F.array_join(params, "&")
    q_part = F.when(
        qjoined != "", F.concat(F.lit("?"), qjoined)
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, path, q_part)


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    return df.withColumn(out_col, canonicalize_url(F.col(url_col)))


def url_dedup_survivors(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per canonical URL: the minimum-id keeper plus the duplicate
    count — the scan-level dedup a crawl pipeline runs before content
    dedup.  One partial-aggregated groupBy shuffle on the canonical key;
    hot canonical URLs (a viral page crawled millions of times) are a
    single aggregate key, not a join, so skew costs a combiner pass, never
    a hot join partition."""
    return (
        with_canonical_url(df, url_col)
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).cast("long").alias("n_variants"),
        )
    )


def path_template(path: Column) -> Column:
    """Generalize a URL path to its route TEMPLATE: per-segment, UUIDs →
    ``{uuid}``, hex ids (≥8 chars) → ``{hex}``, digit runs → ``{n}``,
    digit-embedded slugs (``item-42``) keep their text with the run
    templated.  ``/users/42/orders/a1b2c3d4e5`` → ``/users/{n}/orders/
    {hex}``.

    The grouping key access-log analytics actually want — per-URL
    cardinality is unbounded (every id mints a new URL), per-template it
    is the route table.  Query strings and fragments are dropped first
    (parameters by definition); then a per-SEGMENT transform applies the
    rules with ANCHORED matches (uuid before hex before digits: a UUID
    is also hex, a hex id also contains digits).  Segment-wise rather
    than lookaround-delimited on purpose: Java regex lookbehind has no
    RE2 equivalent, and the consuming form mis-handles adjacent id
    segments — the split/transform/join shape is cross-engine by
    construction and stays scan-fused (JVM higher-order functions).
    """
    uuid_re = (
        "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        "-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
    )
    p = F.regexp_replace(path, r"[?#].*$", "")
    seg = lambda s: (  # noqa: E731
        F.when(s.rlike(uuid_re), F.lit("{uuid}"))
        .when(
            s.rlike("^[0-9a-fA-F]{8,}$") & s.rlike("[0-9]"), F.lit("{hex}")
        )
        .otherwise(F.regexp_replace(s, "[0-9]+", "{n}"))
    )
    return F.array_join(F.transform(F.split(p, "/"), seg), "/")


def path_template_counts(
    df: DataFrame, path_col: str = "path"
) -> DataFrame:
    """Route-table report: ``(template, n BIGINT, distinct_paths BIGINT)``
    — one partial-aggregated groupBy on the templated key; cardinality
    collapses from |URLs| to |routes|."""
    t = path_template(F.col(path_col))
    return df.groupBy(t.alias("template")).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(path_col).alias("distinct_paths"),
    )
