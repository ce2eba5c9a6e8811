"""HTML -> Markdown linearization: marker correctness, tag-prefix hazard
regressions (<b> vs <body>, <p> vs <pre>, <li> vs <link>, <i> vs <img>),
entity order, whitespace normalization, SQL-twin parity, JVM-only plan."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from opentelemetry_collector_components_spark.functions.markdown import (
    html_to_markdown,
    html_to_markdown_sql,
)


def _md(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(html_to_markdown(F.col("html")).alias("md")).collect()[0].md


def test_structural_markers(spark):
    got = _md(
        spark,
        "<h1>T</h1><h3>Sub</h3><p>a <b>bb</b> <em>ii</em> <code>c</code></p>"
        '<ul><li>one</li><li><a href="u">t</a></li></ul><hr>'
        "<blockquote>q</blockquote>",
    )
    assert got == (
        "# T\n\n### Sub\n\na **bb** *ii* `c`\n\n- one\n- [t](u)\n\n---\n\n> q"
    )


def test_tag_prefix_hazards(spark):
    # <body> must not read as <b>, <pre> not as <p>, <link> not as <li>,
    # <img> not as <i> — each once cost a real output defect
    assert _md(spark, "<body>plain</body>") == "plain"
    assert _md(spark, "<pre>k</pre><p>x</p>") == "k\n\nx"
    assert _md(spark, '<link rel="x"><li>item</li>') == "- item"
    assert _md(spark, '<img src="s.png" alt="A"><i>it</i>') == "![A](s.png)*it*"
    assert _md(spark, '<img alt="A" src="s.png">') == "![A](s.png)"


def test_entities_and_script_strip(spark):
    got = _md(
        spark,
        "<script>x<y</script><p>&lt;tag&gt; &amp;&nbsp;&quot;q&quot; &#39;s&#39;</p>"
        "<!-- gone -->",
    )
    assert got == "<tag> & \"q\" 's'"


def test_table_cells(spark):
    got = _md(spark, "<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>")
    assert got == "| A | B\n\n| 1 | 2"


def test_whitespace_collapse(spark):
    got = _md(spark, "<div>  a  </div>\n\n\n\n<div>   b\t\tc </div>")
    assert got == "a\n\nb c"


def test_sql_twin_parity(spark):
    cases = [
        "<h2>Two</h2><strong>s</strong> and <em>e</em>",
        '<ul><li>x <a href="http://u/v?a=1&amp;b=2">y</a></li></ul>',
        "<blockquote>deep <b>bold</b></blockquote><hr><p>end</p>",
        "",
    ]
    df = spark.createDataFrame([(h,) for h in cases], "html string")
    got = [r.md for r in df.select(html_to_markdown(F.col("html")).alias("md")).collect()]
    con = duckdb.connect()
    sql = "SELECT " + html_to_markdown_sql("html") + " AS md FROM (SELECT ? AS html)"
    for h, g in zip(cases, got):
        assert g == con.execute(sql, [h]).fetchone()[0]


def test_jvm_only_plan(spark):
    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = (
        df.select(html_to_markdown(F.col("html")).alias("md"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
