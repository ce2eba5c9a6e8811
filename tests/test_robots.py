"""robots.txt parsing and permission semantics: RFC 9309 group rules,
longest-match with allow tie-break, agent-section selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.robots import (
    parse_robots,
    robots_allowed,
    url_path,
)


def _robots(spark, rows):
    return spark.createDataFrame(rows, "host string, body string")


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


BODY = """# comment line
User-agent: *
Disallow: /private/

Allow: /private/ok
User-Agent: GoodBot
User-agent: OtherBot
Disallow: /
Allow: /api/
Crawl-delay: 10
Sitemap: https://h.io/sitemap.xml
Disallow:
"""


def test_parse_groups_agents_and_dropped_lines(spark):
    out = parse_robots(_robots(spark, [("h.io", BODY)]))
    rows = {(r.group_id, r.agent, r.rule, r.path) for r in out.collect()}
    assert rows == {
        # blank line and comment do not split group 1
        (1, "*", "disallow", "/private/"),
        (1, "*", "allow", "/private/ok"),
        # two consecutive User-agent lines share group 2; agent lowercased
        (2, "goodbot", "disallow", "/"),
        (2, "goodbot", "allow", "/api/"),
        (2, "otherbot", "disallow", "/"),
        (2, "otherbot", "allow", "/api/"),
        # Crawl-delay/Sitemap (unknown) and empty Disallow: dropped
    }
    assert {r.path_len for r in out.collect()} == {9, 11, 1, 5}


def test_parse_rules_before_any_agent_dropped_and_colon_values(spark):
    body = "Disallow: /orphan\nUser-agent: *\nDisallow: /x:y/z\n"
    rows = [(r.agent, r.rule, r.path) for r in parse_robots(_robots(spark, [("h.io", body)])).collect()]
    # the pre-group rule is invalid; the path keeps its inner colon
    assert rows == [("*", "disallow", "/x:y/z")]


def test_allowed_longest_match_and_tie_prefers_allow(spark):
    body = "User-agent: *\nDisallow: /a/\nAllow: /a/b\nDisallow: /a/b\n"
    rules = parse_robots(_robots(spark, [("h.io", body)]))
    out = {
        url_str: (r.matched_rule, r.allowed)
        for url_str, r in (
            (r.url, r)
            for r in robots_allowed(
                _urls(spark, [
                    "https://h.io/a/x",      # /a/ disallow
                    "https://h.io/a/b/c",    # /a/b tie -> allow wins
                    "https://h.io/other",    # no match -> allowed
                    "https://nowhere.net/p", # no rules for host -> allowed
                ]),
                rules,
                "anybot",
            ).collect()
        )
    }
    assert out["https://h.io/a/x"] == ("disallow", False)
    assert out["https://h.io/a/b/c"] == ("allow", True)
    assert out["https://h.io/other"] == (None, True)
    assert out["https://nowhere.net/p"] == (None, True)


def test_specific_agent_group_excludes_star_rules(spark):
    body = (
        "User-agent: *\nDisallow: /\n"
        "User-agent: NiceBot\nDisallow: /only-this/\n"
    )
    rules = parse_robots(_robots(spark, [("h.io", body)]))
    # NiceBot uses ONLY its own group: / is not disallowed for it
    nice = robots_allowed(_urls(spark, ["https://h.io/free"]), rules, "NICEBOT").collect()[0]
    assert nice.allowed and nice.matched_rule is None
    other = robots_allowed(_urls(spark, ["https://h.io/free"]), rules, "rudebot").collect()[0]
    assert not other.allowed and other.matched_rule == "disallow"


def test_url_path_defaults_to_root_and_keeps_query(spark):
    df = spark.range(1).select(
        url_path(F.lit("https://h.io")).alias("a"),
        url_path(F.lit("https://h.io/p?q=1")).alias("b"),
    )
    row = df.collect()[0]
    assert row.a == "/" and row.b == "/p?q=1"


def test_no_python_in_plans(spark):
    rules = parse_robots(
        _robots(spark, [("h.io", "User-agent: *\nDisallow: /x\n")])
    )
    out = robots_allowed(_urls(spark, ["https://h.io/x"]), rules, "b")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_crlf_bodies_parse_identically(spark):
    # RFC 9309's grammar is CRLF lines; real servers ship both endings
    lf = parse_robots(_robots(spark, [("h.io", BODY)])).collect()
    crlf = parse_robots(
        _robots(spark, [("h.io", BODY.replace("\n", "\r\n"))])
    ).collect()
    key = lambda r: (r.group_id, r.agent, r.rule, r.path, r.path_len)  # noqa: E731
    assert sorted(map(key, crlf)) == sorted(map(key, lf))


def test_empty_group_preserved_allows_all_for_exempted_agent(spark):
    # the common exemption idiom: GoodBot's group has only an empty
    # Disallow (= allow everything); it must NOT fall back to the '*'
    # group's disallow-all
    body = "User-agent: GoodBot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    rules = parse_robots(_robots(spark, [("h.io", body)]))
    parsed = {(r.agent, r.rule, r.path) for r in rules.collect()}
    assert parsed == {("goodbot", None, None), ("*", "disallow", "/")}
    urls = _urls(spark, ["https://h.io/anything"])
    good = robots_allowed(urls, rules, "GoodBot").collect()[0]
    assert good.allowed is True and good.matched_rule is None
    other = robots_allowed(urls, rules, "OtherBot").collect()[0]
    assert other.allowed is False and other.matched_rule == "disallow"


def test_crawl_delays_group_attribution_and_agent_resolution(spark):
    from opentelemetry_collector_components_spark.operators.robots import (
        parse_crawl_delays,
    )

    body = (
        "User-agent: FastBot\nCrawl-delay: 1\nDisallow: /x\n\n"
        "User-agent: A\nUser-agent: B\nCrawl-delay: 10\nCrawl-delay: 2.5\n"
        "User-agent: *\nCrawl-delay: nope\nCrawl-delay: 7\n"
    )
    df = _robots(spark, [("h.io", body)])
    got = {(r.host, r.agent): r.crawl_delay_s
           for r in parse_crawl_delays(df).collect()}
    assert got == {
        ("h.io", "fastbot"): 1.0,
        # both agents of the shared group get the MIN of its delays
        ("h.io", "a"): 2.5,
        ("h.io", "b"): 2.5,
        # non-numeric value dropped, numeric one kept
        ("h.io", "*"): 7.0,
    }
    # most-specific resolution: own group beats '*', unknown agent
    # falls back to '*' — the (host, crawl_delay_s) dim schedule_fetches
    # broadcasts
    mine = {r.host: r.crawl_delay_s
            for r in parse_crawl_delays(df, agent="FastBot").collect()}
    assert mine == {"h.io": 1.0}
    other = {r.host: r.crawl_delay_s
             for r in parse_crawl_delays(df, agent="unknown").collect()}
    assert other == {"h.io": 7.0}


def test_crawl_delay_line_breaks_agent_header_run(spark):
    from opentelemetry_collector_components_spark.operators.robots import (
        parse_crawl_delays,
    )

    # a Crawl-delay BETWEEN User-agent lines ends the header run exactly
    # as a rule line would: B starts a new group and does not get A's delay
    body = "User-agent: A\nCrawl-delay: 3\nUser-agent: B\nDisallow: /x\n"
    got = {(r.agent): r.crawl_delay_s
           for r in parse_crawl_delays(_robots(spark, [("h.io", body)])).collect()}
    assert got == {"a": 3.0}
    rules = parse_robots(_robots(spark, [("h.io", body)]))
    parsed = {(r.agent, r.rule, r.path) for r in rules.collect()}
    assert parsed == {("a", None, None), ("b", "disallow", "/x")}


def test_crawl_delay_own_group_without_delay_blocks_star(spark):
    from opentelemetry_collector_components_spark.operators.robots import (
        parse_crawl_delays,
    )

    # FastBot's most-specific group is its own (no Crawl-delay), so the
    # '*' group's 30s delay must NOT leak in — same empty-group rule as
    # robots_allowed; an agent with no group at all still falls back
    body = (
        "User-agent: FastBot\nDisallow:\n\n"
        "User-agent: *\nCrawl-delay: 30\nDisallow: /\n"
    )
    df = _robots(spark, [("h.io", body)])
    assert parse_crawl_delays(df, agent="FastBot").count() == 0
    got = {r.host: r.crawl_delay_s
           for r in parse_crawl_delays(df, agent="otherbot").collect()}
    assert got == {"h.io": 30.0}
