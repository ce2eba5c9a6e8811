"""robots.txt parsing and crawl-permission filtering.

A Common-Crawl-style pipeline (BASELINE.json input_hint) starts from
fetched pages, and the fetcher's gatekeeper is robots.txt: which paths of
which hosts may a given agent crawl?  Re-crawl scheduling, frontier
construction, and compliance audits all need the decision replayed at
corpus scale — "of the 10^12 urls we hold, which does the site's current
robots.txt still permit?".  The reference collector plays the analogous
admission role for telemetry (ratelimitprocessor, `streaming/admission.py`
here); this module is the web-corpus counterpart.

Semantics implemented (REP as specified in RFC 9309, the subset real
crawlers enforce):

- records are groups: one or more consecutive ``User-agent:`` lines
  followed by ``Allow:`` / ``Disallow:`` rules — every rule belongs to
  EVERY agent named in its group's header run;
- field names are case-insensitive; ``#`` starts a comment; blank lines
  are ignored (they do NOT terminate a group — RFC 9309 §2.2);
- an agent picks the MOST SPECIFIC matching group: its own name if any
  group names it, else the ``*`` group, else everything is allowed
  (agent-name match is the exact product token, case-insensitive — the
  RFC's substring product matching is deliberately out of scope);
- within the selected group the LONGEST-path-prefix rule decides;
  equal-length allow beats disallow (RFC 9309 §2.2.2);
- an empty rule path matches nothing (``Disallow:`` = allow all);
- ``*`` / ``$`` wildcards inside rule paths are NOT interpreted —
  documented literal-prefix subset (the RFC makes wildcard support
  optional).

Scale shape: parsing is map-only (split + posexplode + two windows
partitioned by host — robots bodies are tiny, groups are per-host
sequential by nature).  The permission join aggregates the rules to ONE
row per host (array of (path, allow) structs for the agent's selected
group) and equi-joins the corpus on host; the longest-match argmax then
runs as per-row array expressions — no per-url shuffle, no UDF.  At
10^12 urls the only shuffle is the host equi-join, and the rules side is
bounded by |hosts|, not |urls|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


_RECOGNIZED = ("user-agent", "allow", "disallow", "crawl-delay")


def _grouped_fields(
    df: DataFrame, host_col: str, body_col: str
) -> DataFrame:
    """Shared group machinery: split bodies into recognized (host,
    line_no, _key, _value, group_id) rows.  A ``Crawl-delay`` line is a
    group member (it breaks a ``User-agent`` header run exactly as a
    rule line would), so rule parsing and delay parsing see the SAME
    group boundaries."""
    _trim = lambda c: F.trim(c, F.lit(" \t\r"))  # noqa: E731
    host = F.col(host_col)
    lines = F.split(F.col(body_col).cast("string"), "\r?\n")
    raw = (
        df.select(host.alias("host"), F.posexplode(lines).alias("line_no", "_raw"))
        .withColumn("_line", _trim(F.split_part(F.col("_raw"), F.lit("#"), F.lit(1))))
        .where(F.col("_line") != "")
    )
    key = F.lower(_trim(F.split_part(F.col("_line"), F.lit(":"), F.lit(1))))
    # the value is everything after the FIRST ':' (paths may themselves
    # contain ':'), trimmed
    value = _trim(F.expr("substring(_line, instr(_line, ':') + 1)"))
    typed = (
        raw.withColumn("_key", key)
        .withColumn("_value", value)
        .where(F.col("_key").isin(*_RECOGNIZED))
        .where(F.col("_line").contains(":"))
    )
    # group boundary: a user-agent line NOT directly preceded (among
    # recognized lines) by another user-agent line starts a new group
    w = Window.partitionBy("host").orderBy("line_no")
    is_agent = F.col("_key") == "user-agent"
    starts = is_agent & ~F.coalesce(F.lag(is_agent).over(w), F.lit(False))
    return typed.withColumn(
        "group_id",
        F.sum(starts.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).where(F.col("group_id") > 0)  # lines before any User-agent: invalid


def _group_agents(grouped: DataFrame) -> DataFrame:
    return (
        grouped.where(F.col("_key") == "user-agent")
        .select("host", "group_id", F.lower(F.col("_value")).alias("agent"))
        .distinct()
    )


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Parse robots.txt bodies into one row per (host, agent, rule).

    Returns (host, group_id BIGINT, agent STRING lowercase, rule
    'allow'|'disallow', path STRING non-empty, path_len INT).  Unknown
    fields (Sitemap, Crawl-delay, ...), comments, blank lines, and
    empty-path rules are dropped — EXCEPT that a group whose rules are
    all empty-path (the ``Disallow:`` = allow-everything idiom) still
    yields one row per agent with NULL rule/path/path_len, so
    ``robots_allowed`` can tell "the agent has a group with no rules"
    (allow all) apart from "the agent has no group" (fall back to
    ``*``).  Lines are split CRLF-or-LF (RFC 9309's grammar is CRLF;
    real servers ship both) and trimmed of spaces and tabs.
    ``body_col`` may be binary or string.
    """
    grouped = _grouped_fields(df, host_col, body_col)
    agents = _group_agents(grouped)
    rules = grouped.where(
        F.col("_key").isin("allow", "disallow") & (F.col("_value") != "")
    ).select(
        "host",
        "group_id",
        F.col("_key").alias("rule"),
        F.col("_value").alias("path"),
        F.length("_value").alias("path_len"),
    )
    # LEFT join: a group with zero non-empty rules must survive as one
    # (agent, NULL rule) row — dropping it would invert the allow-all
    # group ``User-agent: X / Disallow:`` into the '*' group's disallows
    # for agent X (RFC 9309 most-specific-group).
    return agents.join(rules, ["host", "group_id"], "left").select(
        "host", "group_id", "agent", "rule", "path", "path_len"
    )


def parse_crawl_delays(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    agent: str | None = None,
) -> DataFrame:
    """Per-(host, agent) ``Crawl-delay`` seconds from robots.txt bodies.

    The RFC 9309 extension most crawlers honor: a delay line belongs to
    its group and applies to every agent the group names.  Returns
    (host, agent STRING lowercase, crawl_delay_s DOUBLE); non-numeric
    values are dropped, multiple delays in one group keep the MINIMUM
    (conservative politeness).  With ``agent`` set, resolves the RFC
    most-specific-group rule and returns the ``(host, crawl_delay_s)``
    dim that ``operators.recrawl.schedule_fetches(crawl_delays=...)``
    broadcasts: the agent's own group wins when it has a delay, a host
    where the agent HAS a group without a delay yields NO row (that
    group's silence means unconstrained — the ``*`` delay must not leak
    in, mirroring ``robots_allowed``'s empty-group handling), and only
    hosts with no group for the agent fall back to ``*``.

    Scale shape: same map-only parse + per-host windows as
    ``parse_robots``; output is bounded by |hosts| x |agents|.
    """
    grouped = _grouped_fields(df, host_col, body_col)
    agents = _group_agents(grouped)
    delays = grouped.where(
        (F.col("_key") == "crawl-delay")
        & F.col("_value").rlike(r"^[0-9]+(\.[0-9]+)?$")
    ).select("host", "group_id", F.col("_value").cast("double").alias("_delay"))
    per_agent = (
        agents.join(delays, ["host", "group_id"])
        .groupBy("host", "agent")
        .agg(F.min("_delay").alias("crawl_delay_s"))
    )
    if agent is None:
        return per_agent
    agent = agent.lower()
    own = per_agent.where(F.col("agent") == agent)
    # hosts where the agent has ANY group (delay or not): '*' must not
    # apply there even when the own group specifies no delay
    own_hosts = agents.where(F.col("agent") == agent).select("host").distinct()
    star_only = per_agent.where(F.col("agent") == "*").join(
        own_hosts, "host", "left_anti"
    )
    return own.unionByName(star_only).select("host", "crawl_delay_s")


def url_path(url: Column) -> Column:
    """Path-and-after of a URL ('/' when absent) — what robots rules
    match against."""
    path = F.regexp_extract(url, r"(?i)^[a-z][a-z0-9+.-]*://[^/]+(/.*)?$", 1)
    return F.when(path == "", F.lit("/")).otherwise(path)


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
) -> DataFrame:
    """Attach the robots verdict to every url row.

    ``rules`` is ``parse_robots`` output.  Adds ``matched_rule``
    ('allow' | 'disallow' | NULL when no rule matched) and ``allowed``
    BOOLEAN (no rules for the host, no matching rule, or longest match —
    ties to allow — is an Allow).  The agent's own group wins over the
    ``*`` group when both exist (RFC 9309 most-specific-match).
    """
    from ..operators.webgraph import host_of

    agent = agent.lower()
    mine = F.filter("_sections", lambda s: s["agent"] == F.lit(agent))
    star = F.filter("_sections", lambda s: s["agent"] == F.lit("*"))
    per_host = (
        rules.where(F.col("agent").isin(agent, "*"))
        .groupBy("host")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("agent"), F.col("rule"), F.col("path"), F.col("path_len")
                )
            ).alias("_sections")
        )
        .select(
            F.col("host").alias("_robots_host"),
            F.when(F.size(mine) > 0, mine).otherwise(star).alias("_rules"),
        )
    )
    joined = urls.join(
        per_host, host_of(F.col(url_col)) == per_host._robots_host, "left"
    ).drop("_robots_host")
    # staged: an inline url_path() here would sit INSIDE the filter
    # lambda below and re-run its regex once per RULE rather than once
    # per url (higher-order-function bodies re-evaluate outer
    # subexpressions per element; r6 — measured ~rule-count x on the
    # 4M-url filter shape)
    joined = joined.withColumn("_path", url_path(F.col(url_col)))
    path = F.col("_path")
    # NULL-path structs mark empty groups (allow-all): they select the
    # group above but can never match a url
    matches = F.filter(
        "_rules", lambda r: r["path"].isNotNull() & path.startswith(r["path"])
    )
    # lexicographic struct max: longest path wins, equal length prefers
    # allow (allow_pri 1 > 0) — RFC 9309 tie rule
    best = F.array_max(
        F.transform(
            matches,
            lambda r: F.struct(
                r["path_len"].alias("plen"),
                (r["rule"] == "allow").cast("int").alias("allow_pri"),
                r["rule"].alias("rule"),
            ),
        )
    )
    return (
        joined.withColumn("matched_rule", best["rule"])
        .withColumn(
            "allowed",
            F.coalesce(F.col("matched_rule") == "allow", F.lit(True)),
        )
        .drop("_rules", "_path")
    )
