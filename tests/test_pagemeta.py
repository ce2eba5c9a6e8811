"""Head-metadata extraction: attribute-order/case variants, http-equiv
charset, meta robots token parsing, absent-tag NULLs."""

from __future__ import annotations

from opentelemetry_collector_components_spark.functions.pagemeta import (
    page_metadata,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, html string")


def test_variants_and_defaults(spark):
    rows = [
        (1, '<html lang="en-US"><head>'
            '<meta name="description" content="hello world">'
            '<link rel="canonical" href="https://c.io/a">'
            '<meta property="og:title" content="The Title">'
            '<meta charset=utf-8>'
            '<meta name="robots" content="NOINDEX , nofollow">'
            '</head></html>'),
        # reversed attribute order + http-equiv charset + upper tags
        (2, '<HTML><HEAD>'
            '<META CONTENT="rev desc" NAME="description">'
            "<LINK HREF='https://c.io/b' REL='canonical'>"
            '<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">'
            '</HEAD></HTML>'),
        (3, "<html><body>no head metadata</body></html>"),
    ]
    out = {r.doc_id: r for r in page_metadata(_pages(spark, rows)).collect()}
    r1 = out[1]
    assert r1.meta_description == "hello world"
    assert r1.canonical == "https://c.io/a"
    assert r1.og_title == "The Title"
    assert r1.charset == "utf-8"
    assert r1.html_lang == "en-US"
    assert r1.noindex is True and r1.nofollow is True
    r2 = out[2]
    assert r2.meta_description == "rev desc"
    assert r2.canonical == "https://c.io/b"
    assert r2.charset == "iso-8859-1"
    assert r2.noindex is False and r2.nofollow is False
    r3 = out[3]
    assert r3.meta_description is None and r3.canonical is None
    assert r3.og_title is None and r3.charset is None and r3.html_lang is None
    assert r3.noindex is False and r3.nofollow is False


def test_plan_python_free(spark):
    df = page_metadata(_pages(spark, [(1, "<html>")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
