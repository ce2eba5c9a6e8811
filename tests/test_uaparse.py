"""User-agent parsing (E1 uaparser slot): family/version inference +
set-only-if-unset semantics (enrichments/span.go:447-470)."""

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.functions.uaparse import (
    enrich_user_agent,
    parse_user_agent,
)


def test_parse_families(spark):
    rows = [
        (0, "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36"),
        (1, "Mozilla/5.0 (Windows NT 10.0; rv:109.0) Gecko/20100101 Firefox/118.0.1"),
        (2, "Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm)"),
        (3, "Wget/1.21.2"),
        (4, None),
        (5, "Mozilla/4.0 (compatible; MSIE 8.0; Windows NT 6.1)"),
    ]
    df = spark.createDataFrame(rows, "id long, ua string")
    out = {
        r["id"]: (r["p"]["name"], r["p"]["version"])
        for r in df.select("id", parse_user_agent("ua").alias("p")).collect()
    }
    assert out[0] == ("Chrome", "119.0.0.0")
    assert out[1] == ("Firefox", "118.0.1")
    assert out[2] == ("bingbot", "2.0")
    assert out[3] == ("Wget", "1.21.2")
    assert out[4] == ("Other", "")
    assert out[5] == ("IE", "8.0")


def test_enrich_only_if_unset(spark):
    rows = [
        (0, "curl/8.4.0", None, None),
        (1, "curl/8.4.0", "PresetName", "9.9"),  # existing values win
    ]
    df = spark.createDataFrame(
        rows, "id long, user_agent_original string, user_agent_name string, user_agent_version string"
    )
    out = {r["id"]: (r["user_agent_name"], r["user_agent_version"])
           for r in enrich_user_agent(df).collect()}
    assert out[0] == ("curl", "8.4.0")
    assert out[1] == ("PresetName", "9.9")
