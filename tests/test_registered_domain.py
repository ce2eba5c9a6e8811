"""Registered-domain (eTLD+1) extraction: rule branches, custom suffix
lists, JVM-only plan."""

from __future__ import annotations

from pyspark.sql import functions as F


def _run(spark, hosts, **kw):
    from opentelemetry_collector_components_spark.operators.urls import (
        registered_domain,
    )

    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return [
        r.r for r in df.select(registered_domain(F.col("host"), **kw).alias("r")).collect()
    ]


def test_rule_branches(spark):
    got = _run(spark, [
        "www.example.com",          # plain TLD: last two labels
        "a.b.deep.example.CO.UK",   # two-level suffix: last three, folded
        "EXAMPLE.COM:8080",         # port stripped, case folded
        "site.com.au",              # exactly three labels with 2-level sfx
        "example.org",              # already registrable
        "192.168.7.1",              # IPv4 passes through
        "localhost",                # single label passes through
        "x.github.io",              # io is a plain TLD in this snapshot
    ])
    assert got == [
        "example.com", "example.co.uk", "example.com", "site.com.au",
        "example.org", "192.168.7.1", "localhost", "github.io",
    ]


def test_custom_suffix_list(spark):
    # caller supplies PSL-style rules: github.io as a suffix makes each
    # user site its own registrable domain
    got = _run(spark, ["x.github.io", "a.b.github.io"],
               two_level_suffixes=["github.io"])
    assert got == ["x.github.io", "b.github.io"]
    # empty list disables three-label takes entirely
    assert _run(spark, ["example.co.uk"], two_level_suffixes=[]) == ["co.uk"]


def test_registered_domain_plan_is_jvm_only(spark):
    from opentelemetry_collector_components_spark.operators.urls import (
        registered_domain,
    )

    df = spark.createDataFrame([("a.example.com",)], "host string")
    plan = (
        df.select(registered_domain(F.col("host")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
