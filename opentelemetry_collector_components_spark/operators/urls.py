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


# two-level public suffixes this snapshot recognizes: the common ccTLD
# second-level registries.  A HEURISTIC, not the full Mozilla PSL (that
# list is ~10k rules and revs weekly); callers needing exact PSL
# semantics pass their own list.  Single source for Spark + oracle.
TWO_LEVEL_SUFFIXES = [
    "ac.jp", "ac.uk", "co.id", "co.in", "co.jp", "co.kr", "co.nz",
    "co.th", "co.uk", "co.za", "com.ar", "com.au", "com.br", "com.cn",
    "com.co", "com.eg", "com.hk", "com.mx", "com.my", "com.ng",
    "com.pe", "com.ph", "com.pk", "com.sa", "com.sg", "com.tr",
    "com.tw", "com.ua", "com.ve", "com.vn", "edu.au", "go.jp",
    "gov.au", "gov.br", "gov.cn", "gov.uk", "me.uk", "ne.jp",
    "net.au", "net.br", "net.cn", "net.in", "net.uk", "or.jp",
    "or.kr", "org.au", "org.br", "org.cn", "org.in", "org.uk",
    "sch.uk",
]

_IPV4_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def registered_domain(
    host: Column, two_level_suffixes: list[str] | None = None
) -> Column:
    """eTLD+1: the registrable domain of a host — what webgraph and
    per-site aggregations should group by ('a.cdn.example.co.uk' and
    'www.example.co.uk' are the same SITE, 'x.github.io' and
    'y.github.io' are not the same host operator... which is exactly
    the judgment the suffix list encodes).

    Rule: lowercase, strip any ``:port``; IPv4 literals and
    single-label hosts pass through unchanged; if the last two labels
    form a known two-level suffix take the last THREE labels, else the
    last TWO.  Pure JVM split/slice/array_join — scan-fused, and
    restated verbatim by the oracle SQL.
    """
    sfx = two_level_suffixes if two_level_suffixes is not None else TWO_LEVEL_SUFFIXES
    h = F.split(F.lower(host), ":")[0]
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    take = F.when(last2.isin(sfx) & (n >= 3), F.lit(3)).otherwise(F.lit(2))
    reg = F.array_join(F.slice(labels, n - take + 1, take), ".")
    return F.when(h.rlike(_IPV4_RE) | (n < 2), h).otherwise(reg)


def with_idn_host(
    df: DataFrame,
    host_col: str = "host",
    out_col: str = "host_unicode",
) -> DataFrame:
    """Attach the Unicode form of an IDN hostname column: lowercase, every
    ``xn--`` label Punycode-decoded (RFC 3492, ``functions/punycode.py``),
    malformed labels kept verbatim.  Arrow-batched scalar pandas UDF —
    embarrassingly parallel, no shuffle; ASCII-only corpora pay one
    vectorized pass and no per-row branching beyond the startswith scan."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..functions.punycode import idn_decode_host

    # no type annotations: `from __future__ import annotations` stringifies
    # them and pyspark's typehint inspection can't eval the local alias
    @pandas_udf("string")
    def _decode(s):
        return pd.Series(
            [None if h is None else idn_decode_host(h) for h in s]
        )

    return df.withColumn(out_col, _decode(F.col(host_col)))
