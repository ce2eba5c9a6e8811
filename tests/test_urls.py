"""URL canonicalization rules + canonical-URL dedup."""

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.urls import (
    canonicalize_url,
    url_dedup_survivors,
    with_canonical_url,
)

CASES = [
    # (input, canonical)
    ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
     "https://example.com/a/b?a=1&b=2"),
    ("https://example.com/a/b?a=1&b=2", "https://example.com/a/b?a=1&b=2"),
    ("http://Example.com:8080/", "http://example.com:8080/"),
    ("http://example.com:80", "http://example.com/"),
    ("https://www.example.com/a//", "https://example.com/a"),
    ("ftp://Files.Example.com:21/x", "ftp://files.example.com:21/x"),
    ("https://example.com/?gclid=1&fbclid=2&ref=aa", "https://example.com/"),
    ("https://example.com/p?z=1&utm_campaign=x&m=0", "https://example.com/p?m=0&z=1"),
]


def test_canonicalization_rules(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in CASES]


def test_canonicalize_is_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    once = with_canonical_url(df).select(F.col("canonical_url").alias("url"))
    twice = [r["c"] for r in once.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert twice == [want for _, want in CASES]


def test_dedup_survivors_min_id(spark):
    rows = [
        (0, "https://a.com/x"),
        (1, "HTTPS://WWW.A.com:443/x/"),
        (2, "https://a.com/x?utm_source=s"),
        (3, "https://b.com/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["canonical_url"]: (r["keeper_id"], r["n_variants"])
        for r in url_dedup_survivors(df).collect()
    }
    assert got == {"https://a.com/x": (0, 3), "https://b.com/y": (3, 1)}


def test_no_python_udf_in_plan(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    plan = (
        with_canonical_url(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_valueless_tracking_params_drop(spark):
    """Review r4: '?ref' must collapse like '?ref=feed'."""
    df = spark.createDataFrame(
        [("https://a.com/x?ref",), ("https://a.com/x?gclid",),
         ("https://a.com/x?refx=keep",)],
        "url string",
    )
    got = [r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == ["https://a.com/x", "https://a.com/x", "https://a.com/x?refx=keep"]


# ---------------------------------------------------------------------------
# path template mining
# ---------------------------------------------------------------------------
def test_path_template_generalization(spark):
    from opentelemetry_collector_components_spark.operators.urls import (
        path_template,
    )

    cases = [
        ("/users/42/orders/777", "/users/{n}/orders/{n}"),
        ("/item-42/view", "/item-{n}/view"),
        ("/docs/a1b2c3d4e5f6", "/docs/{hex}"),
        # all-letter "hex-looking" segment is a word, not an id
        ("/docs/abcdefabcdef", "/docs/abcdefabcdef"),
        # short hex stays (could be a word like "cafe")
        ("/docs/cafe1", "/docs/cafe{n}"),
        (
            "/u/12345678-abcd-4f00-9e11-0123456789ab/profile",
            "/u/{uuid}/profile",
        ),
        ("/search?q=42#frag", "/search"),
        ("/a/1/2/3", "/a/{n}/{n}/{n}"),  # adjacent id segments all template
        ("/static/css/app.css", "/static/css/app.css"),
    ]
    df = spark.createDataFrame([(p,) for p, _ in cases], "p string")
    got = [r.t for r in df.select(path_template(F.col("p")).alias("t")).collect()]
    assert got == [want for _, want in cases]


def test_path_template_counts_collapse_cardinality(spark):
    from opentelemetry_collector_components_spark.operators.urls import (
        path_template_counts,
    )

    df = spark.createDataFrame(
        [(f"/users/{i}/orders/{i * 7}",) for i in range(200)]
        + [("/health",)] * 5,
        "path string",
    )
    got = {r.template: (r.n, r.distinct_paths) for r in path_template_counts(df).collect()}
    assert got == {
        "/users/{n}/orders/{n}": (200, 200),
        "/health": (5, 1),
    }
    plan = path_template_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
