"""Web-graph href resolution branches and dictionary topic tagging:
hand-checked URLs per RFC 3986 branch, argmax/tie/no-match labeling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.textmine import (
    assign_topics,
    keyword_topic_counts,
)
from opentelemetry_collector_components_spark.operators.webgraph import (
    extract_links,
    host_link_edges,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_resolution_branches(spark):
    html = (
        '<a href="https://x.org/abs">A</a>'
        "<a href='/root'>B</a>"
        '<a href="rel/sub">C</a>'
        '<a href="//cdn.net/lib">D</a>'
        '<a href="https://y.org/page#frag">E</a>'
        '<a href="">F</a>'
        '<a href="#top">G</a>'
    )
    out = extract_links(_pages(spark, [("https://base.com/dir/page", html)]))
    got = sorted(r.link for r in out.collect())
    assert got == [
        "https://base.com/dir/rel/sub",  # directory-relative
        "https://base.com/root",  # root-relative
        "https://cdn.net/lib",  # protocol-relative keeps base scheme
        "https://x.org/abs",  # absolute kept as-is
        "https://y.org/page",  # fragment stripped
    ]


def test_non_web_schemes_dropped_not_resolved_relative(spark):
    # scheme-only hrefs are absolute per RFC 3986 — mailto:/javascript:/
    # tel:/data: must vanish, never resolve directory-relative into
    # garbage edges like https://base.com/dir/mailto:bob@x.com
    html = (
        '<a href="mailto:bob@x.com">M</a>'
        '<a href="javascript:void(0)">J</a>'
        '<a href="tel:+15551234">T</a>'
        '<a href="data:text/plain,hi">D</a>'
        '<a href="ftp://files.example.com/f">F</a>'
        '<a href="https://keep.org/ok">K</a>'
    )
    out = extract_links(_pages(spark, [("https://base.com/dir/page", html)]))
    assert [r.link for r in out.collect()] == ["https://keep.org/ok"]


def test_case_insensitive_tags_schemes_and_hosts(spark):
    # HTML tag/attr names and URL scheme/host are case-insensitive;
    # host normalization is lowercase, path case is preserved
    html = (
        '<A HREF="https://up.org/Keep">U</A>'
        "<a HREF='HTTPS://Other.COM/Path'>S</a>"
        '<a href="/Rel">R</a>'
    )
    out = extract_links(_pages(spark, [("HTTPS://Base.COM/Dir/page", html)]))
    got = sorted(r.link for r in out.collect())
    assert got == [
        "HTTPS://Other.COM/Path",  # absolute kept verbatim
        "https://base.com/Rel",  # base scheme+host lowercased, path kept
        "https://up.org/Keep",
    ]
    edges = {
        (r.src_host, r.dst_host)
        for r in host_link_edges(
            _pages(spark, [("HTTPS://Base.COM/Dir/page", html)])
        ).collect()
    }
    assert edges == {("base.com", "up.org"), ("base.com", "other.com")}


def test_resolution_rootless_base_and_binary_html(spark):
    # base url with no path: directory is "/"; html arrives as binary.
    df = spark.createDataFrame(
        [("https://h.io", bytearray(b'<a href="a/b">x</a>'))],
        "url string, html binary",
    )
    out = extract_links(df).collect()
    assert [r.link for r in out] == ["https://h.io/a/b"]


def test_host_edges_drop_self_loops_and_count(spark):
    rows = [
        ("https://a.com/1", '<a href="https://b.com/x">1</a><a href="/y">2</a>'),
        ("https://a.com/2", '<a href="https://b.com/z">3</a>'),
    ]
    out = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_link_edges(_pages(spark, rows)).collect()
    }
    assert out == {("a.com", "b.com"): 2}  # self-loop /y dropped
    kept = host_link_edges(_pages(spark, rows), drop_self_loops=False)
    got = {(r.src_host, r.dst_host): r.n_links for r in kept.collect()}
    assert got == {("a.com", "b.com"): 2, ("a.com", "a.com"): 1}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


TOPICS = {"db": ["table", "join"], "perf": ["fast", "scan"]}


def test_topic_counts_word_bounded_case_insensitive(spark):
    rows = [
        (1, "Table JOIN table"),  # db: 3 (case-insensitive)
        (2, "tables are stable"),  # no whole-word match -> no row
        (3, "fast scan of a table"),  # perf: 2, db: 1
    ]
    out = keyword_topic_counts(_docs(spark, rows), TOPICS)
    got = {(r.doc_id, r.topic): r.n_matches for r in out.collect()}
    assert got == {(1, "db"): 3, (3, "perf"): 2, (3, "db"): 1}


def test_topic_assign_argmax_ties_and_no_match(spark):
    rows = [
        (1, "fast fast table"),  # perf 2 > db 1
        (2, "fast table"),  # tie 1-1 -> lexicographically first: db
        (3, "nothing here"),  # no match -> NULL topic, 0
    ]
    out = {r.doc_id: (r.topic, r.n_matches) for r in assign_topics(_docs(spark, rows), TOPICS).collect()}
    assert out == {1: ("perf", 2), 2: ("db", 1), 3: (None, 0)}
    with pytest.raises(ValueError):
        assign_topics(_docs(spark, rows), {})
    with pytest.raises(ValueError):
        assign_topics(_docs(spark, rows), {"t": []})


def test_topic_keywords_regex_escaped(spark):
    # a keyword containing regex metacharacters is matched literally
    out = keyword_topic_counts(
        _docs(spark, [(1, "c++ rocks , c-- not")]), {"lang": ["c++"]}
    ).collect()
    assert [(r.topic, r.n_matches) for r in out] == [("lang", 1)]


def test_anchor_text_extraction_collapses_whitespace_and_nulls_empty(spark):
    html = (
        '<a href="https://x.org/a">Visit   the\n  docs </a>'
        '<a href="https://x.org/b"></a>'
        '<a href="https://x.org/c"><img src="i.png"></a>'
        '<a href="mailto:b@x">mail</a>'
    )
    from opentelemetry_collector_components_spark.operators.webgraph import (
        extract_anchor_texts,
    )

    out = extract_anchor_texts(_pages(spark, [("https://base.com/", html)]))
    rows = {r.link: r.anchor_text for r in out.collect()}
    # whitespace runs collapse to one space and ends trim
    assert rows["https://x.org/a"] == "Visit the docs"
    # empty text -> NULL, link still counted
    assert "https://x.org/b" in rows and rows["https://x.org/b"] is None
    # image-wrapped anchor: link kept, stripped text is empty -> NULL;
    # non-web schemes are dropped entirely
    assert "https://x.org/c" in rows and rows["https://x.org/c"] is None
    assert len(rows) == 3


def test_anchor_wrapped_children_and_unclosed_tags(spark):
    html = (
        '<a href="https://x.org/w"><b>big</b>\n<i>deal</i></a>'  # tag-strip
        '<a href="https://x.org/u">unclosed'  # never closed: no match,
        '<a href="https://x.org/v">fine</a>'  # but must NOT swallow this one
    )
    from opentelemetry_collector_components_spark.operators.webgraph import (
        extract_anchor_texts,
    )

    out = extract_anchor_texts(_pages(spark, [("https://base.com/", html)]))
    rows = {r.link: r.anchor_text for r in out.collect()}
    assert rows == {"https://x.org/w": "big deal", "https://x.org/v": "fine"}


def test_anchor_text_counts_cross_host_filter(spark):
    html_a = (
        '<a href="https://t.org/doc">great page</a>'
        '<a href="/local">home</a>'  # same-host nav: dropped
    )
    html_b = '<a href="https://t.org/doc">great page</a>'
    from opentelemetry_collector_components_spark.operators.webgraph import (
        anchor_text_counts,
    )

    df = _pages(
        spark,
        [("https://a.com/p", html_a), ("https://b.com/q", html_b)],
    )
    got = [(r.link, r.anchor_text, r.n_refs) for r in anchor_text_counts(df).collect()]
    assert got == [("https://t.org/doc", "great page", 2)]


def test_top_anchor_texts_rank_and_tiebreak(spark):
    # target gets 2x "beta", 2x "alpha", 1x "gamma" from distinct hosts:
    # rank 1 goes to alpha (count tie -> text asc), gamma is cut at k=2
    rows = []
    for i, text in enumerate(["alpha", "alpha", "beta", "beta", "gamma"]):
        rows.append(
            (f"https://s{i}.com/p", f'<a href="https://t.org/d">{text}</a>')
        )
    from opentelemetry_collector_components_spark.operators.webgraph import (
        top_anchor_texts,
    )

    got = [
        (r.anchor_text, r.n_refs, r.rank)
        for r in top_anchor_texts(_pages(spark, rows), k=2)
        .orderBy("rank")
        .collect()
    ]
    assert got == [("alpha", 2, 1), ("beta", 2, 2)]


def test_host_degree_features_hand_graph(spark):
    from opentelemetry_collector_components_spark.operators.webgraph import (
        host_degree_features,
    )

    edges = spark.createDataFrame(
        [
            ("a", "b", 3), ("b", "a", 1),   # reciprocal pair
            ("a", "c", 2),                   # one-way
            ("d", "a", 5),                   # c,d never sources/targets both
        ],
        "src_host string, dst_host string, n_links long",
    )
    got = {r.host: r for r in host_degree_features(edges).collect()}
    a = got["a"]
    assert (a.out_hosts, a.out_links, a.in_hosts, a.in_links,
            a.reciprocal_hosts) == (2, 5, 2, 6, 1)
    b = got["b"]
    assert (b.out_hosts, b.in_hosts, b.reciprocal_hosts) == (1, 1, 1)
    # pure source and pure sink get zeroed opposite sides
    assert (got["d"].in_hosts, got["d"].out_hosts) == (0, 1)
    assert (got["c"].out_hosts, got["c"].in_hosts,
            got["c"].reciprocal_hosts) == (0, 1, 0)
