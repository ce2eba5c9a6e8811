"""Main-content extraction: density/length filtering, script removal,
inline-anchor stripping, block counting."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.functions.webtext import (
    main_content,
)


def _extract(spark, html, **kw):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(
        main_content(F.col("html"), **kw).alias("mc")
    ).select("mc.*").collect()[0]


def test_nav_footer_dropped_article_kept(spark):
    html = (
        "<html><body>"
        '<nav><a href="/">Home page here</a> <a href="/a">About this site</a></nav>'
        "<p>This paragraph is long enough to survive the length filter.</p>"
        "<div>tiny</div>"
        '<footer><a href="/t">Terms of service</a> <a href="/p">Privacy policy</a></footer>'
        "</body></html>"
    )
    out = _extract(spark, html)
    assert out.main_text == (
        "This paragraph is long enough to survive the length filter."
    )
    assert out.n_kept == 1 and out.n_blocks == 4
    assert out.content_chars == len(out.main_text)


def test_script_removed_and_inline_anchor_stripped(spark):
    html = (
        "<p>Linked words like <a href='/r'>this one</a> stay inline in the text.</p>"
        "<script>var boilerplate = 'very long string of not-content here';</script>"
    )
    out = _extract(spark, html)
    assert out.main_text == "Linked words like this one stay inline in the text."
    assert out.n_blocks == 1


def test_link_density_threshold_is_integer_exact(spark):
    # text 30 chars, link text 10 chars -> 1000 <= 33*30=990 is False: drop;
    # at max_link_pct=34 (1020) it survives
    body = "<p>" + "x" * 19 + " <a href='/l'>" + "y" * 10 + "</a></p>"
    assert _extract(spark, body).n_kept == 0
    assert _extract(spark, body, max_link_pct=34).n_kept == 1


def test_min_chars_parameter(spark):
    html = "<p>twelve chars.</p>"
    assert _extract(spark, html).n_kept == 0
    out = _extract(spark, html, min_chars=5)
    assert out.n_kept == 1 and out.main_text == "twelve chars."


def test_plan_python_free(spark):
    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = (
        df.select(main_content(F.col("html")).alias("mc"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unclosed_script_dropped_not_kept_as_content(spark):
    # truncated fetch body: <script> never closed — the dangling JS must
    # not leak into main_text as a long link-free block
    html = (
        "<p>Real text paragraph long enough to keep for sure.</p>"
        "<script>var nav = {a: 1, b: 2}; lots of junk that never closes"
    )
    out = _extract(spark, html)
    assert out.main_text == "Real text paragraph long enough to keep for sure."
    assert out.n_kept == 1


def test_block_wrapping_anchor_counts_as_link_text(spark):
    # card-grid shape: the anchor wraps a block-level child, so its text
    # lands in a block with no <a> tag — the cross-block anchor state
    # must still mark it link-dense and drop it
    html = (
        '<a href="/x"><div>Thirty plus characters of product card text here</div></a>'
        "<p>A genuine paragraph with plenty of ordinary prose text.</p>"
    )
    out = _extract(spark, html)
    assert out.main_text == (
        "A genuine paragraph with plenty of ordinary prose text."
    )


def test_anchor_spanning_multiple_blocks(spark):
    # <a> wrapping TWO divs: both middle blocks are inside the anchor
    # (state carried across sentinel-free blocks)
    html = (
        '<a href="/x"><div>First product card description block text</div>'
        "<div>Second product card description block text</div></a>"
        "<p>Actual article prose that should be the only survivor here.</p>"
    )
    out = _extract(spark, html)
    assert out.main_text == (
        "Actual article prose that should be the only survivor here."
    )


def test_add_main_content_dataframe_form_matches_column_form(spark):
    from opentelemetry_collector_components_spark.functions.webtext import (
        add_main_content,
    )
    from opentelemetry_collector_components_spark.sources.pages import (
        generate_article_pages,
    )

    pages = generate_article_pages(spark, 40)
    staged = add_main_content(pages).select(
        "doc_id", "main_text", "n_blocks", "n_kept", "content_chars"
    )
    mc = main_content(F.col("html").cast("string"))
    inline = pages.select(
        "doc_id",
        mc["main_text"].alias("main_text"),
        mc["n_blocks"].alias("n_blocks"),
        mc["n_kept"].alias("n_kept"),
        mc["content_chars"].alias("content_chars"),
    )
    assert sorted(map(tuple, staged.collect())) == sorted(
        map(tuple, inline.collect())
    )
