"""M0: deterministic pages generator invariants."""

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.sources.pages import PAGES_COLUMNS, generate_pages
from opentelemetry_collector_components_spark.sources.dims import generate_domain_dim

N = 2000


def test_schema(spark):
    df = generate_pages(spark, N)
    assert [c for c in df.columns if c != "doc_id"] == PAGES_COLUMNS
    types = dict(df.dtypes)
    assert types["url"] == "string"
    assert types["warc_ts"] == "timestamp"
    assert types["html"] == "binary"
    assert types["text"] == "string"
    assert types["lang"] == "string"


def test_deterministic(spark):
    a = generate_pages(spark, N, partitions=2).orderBy("doc_id").collect()
    b = generate_pages(spark, N, partitions=7).orderBy("doc_id").collect()
    assert a == b  # pure function of row id, independent of partitioning


def test_skew_and_langs(spark):
    df = generate_pages(spark, 20000)
    hot = df.filter(F.col("url").like("https://hot%")).count()
    assert 0.15 < hot / 20000 < 0.25  # ~20% on 3 hot domains
    langs = {r["lang"] for r in df.select("lang").distinct().collect()}
    assert langs == {"en", "de", "fr", "es", "ja"}
    domains = df.select(F.parse_url("url", F.lit("HOST")).alias("d")).distinct().count()
    assert domains == 50


def test_malformed_rate(spark):
    df = generate_pages(spark, 20000)
    bad = df.filter(~F.col("text").rlike("level=")).count()
    assert 0.005 < bad / 20000 < 0.02  # fixed ~1%


def test_domain_dim(spark):
    dim = generate_domain_dim(spark)
    rows = dim.collect()
    assert len(rows) == 45  # 50 domains minus 5 intentionally missing
    assert len({r["domain"] for r in rows}) == 45
    assert {r["geo"] for r in rows} <= {"us", "eu", "apac"}


def test_dim_sync_changes_actions(spark):
    """entityanalyticsreceiver sync semantics: full publishes everything;
    incremental publishes only added/modified/deleted."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.sources.dims import dim_sync_changes

    prev = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "attr", "n"]
    )
    curr = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40)], ["id", "attr", "n"]
    )
    inc = {r["id"]: r["action"] for r in dim_sync_changes(prev, curr, "id", ["attr", "n"]).collect()}
    assert inc == {2: "modified", 3: "deleted", 4: "added"}  # 1 unchanged -> omitted
    full = dim_sync_changes(prev, curr, "id", ["attr", "n"], full=True)
    assert full.count() == 3 and full.filter(F.col("action") == "full").count() == 3
