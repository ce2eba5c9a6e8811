"""JSON schema profiling: path extraction to bounded depth, coarse type
classes, depth truncation, novelty flagging, JVM-only plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_paths_types_and_depth_truncation(spark):
    from opentelemetry_collector_components_spark.operators.jsonprofile import (
        json_key_paths,
    )

    j = '{"k": 1, "s": "x", "o": {"v": 2, "deep": {"q": 3}}, "a": [1], "n": null}'
    df = spark.createDataFrame([(j,)], "js string")
    got = {(r.path, r.jtype) for r in json_key_paths(df, "js").collect()}
    assert got == {
        ("k", "scalar"), ("s", "scalar"), ("o", "object"), ("a", "array"),
        ("n", "null"), ("o.v", "scalar"),
        # depth 2 stops here: deep profiles as object, q is invisible
        ("o.deep", "object"),
    }
    deeper = {r.path for r in json_key_paths(df, "js", max_depth=3).collect()}
    assert "o.deep.q" in deeper
    with pytest.raises(ValueError):
        json_key_paths(df, "js", max_depth=0)


def test_brace_shaped_strings_stay_scalar(spark):
    from opentelemetry_collector_components_spark.operators.jsonprofile import (
        json_key_paths,
    )

    # log-message content that LOOKS like JSON structure must classify
    # as scalar (the variant parse attests STRING) and must NOT be
    # descended into — no fabricated child paths from message text
    j = ('{"msg": "[GC pause] 12ms", '
         '"note": "{\\"a\\": 1}", '
         '"o": {"v": 2}}')
    df = spark.createDataFrame([(j,)], "js string")
    got = {(r.path, r.jtype) for r in json_key_paths(df, "js").collect()}
    assert got == {
        ("msg", "scalar"), ("note", "scalar"),
        ("o", "object"), ("o.v", "scalar"),
    }


def test_profile_counts_and_novelty(spark):
    from opentelemetry_collector_components_spark.operators.jsonprofile import (
        json_schema_profile,
        schema_novelty,
    )

    rows = [
        (1, '{"a": 1}'), (1, '{"a": 2}'),
        (2, '{"a": 3, "b": {"c": 4}}'),
        (3, '{"b": {"c": 5}}'),
    ]
    df = spark.createDataFrame(rows, "day int, js string")
    prof = json_schema_profile(df, "js", group_cols=["day"])
    out = {(r.day, r.path): (r.n, r.is_new)
           for r in schema_novelty(prof, "day").collect()}
    assert out[(1, "a")] == (2, True)       # first day of 'a'
    assert out[(2, "a")] == (1, False)      # seen before
    assert out[(2, "b")] == (1, True)       # new key, flagged on arrival
    assert out[(2, "b.c")] == (1, True)
    assert out[(3, "b.c")] == (1, False)


def test_jsonprofile_plan_is_jvm_only(spark):
    from opentelemetry_collector_components_spark.operators.jsonprofile import (
        json_schema_profile,
    )

    df = spark.createDataFrame([(1, '{"a": 1}')], "day int, js string")
    plan = (
        json_schema_profile(df, "js", group_cols=["day"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "EvalPython" not in plan
