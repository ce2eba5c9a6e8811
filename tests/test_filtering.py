"""OTTL-lite condition compiler + filterprocessor drop semantics."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.filtering import (
    compile_condition,
    filter_records,
)


def _df(spark):
    rows = [
        (1, "GET", 200, {"http.route": "/healthz", "env": "prod"}, {"svc": "a"}),
        (2, "POST", 500, {"http.route": "/api/users"}, {"svc": "b"}),
        (3, "GET", 301, {}, {"svc": "a"}),
        (4, "PUT", 200, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "id long, method string, status long, "
        "attributes map<string,string>, resource map<string,string>",
    )


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_basic_comparisons_and_boolean_ops(spark):
    df = _df(spark)
    assert _ids(filter_records(df, ['method == "GET"'])) == [2, 4]
    assert _ids(filter_records(df, ["status >= 300 and status < 400"])) == [1, 2, 4]
    assert _ids(filter_records(df, ['method == "GET" or status == 500'])) == [4]
    assert _ids(filter_records(df, ['not (method == "GET")'])) == [1, 3]


def test_map_paths_and_null_keeps(spark):
    df = _df(spark)
    # rows 2-4 have no env attribute: condition is null there -> kept
    assert _ids(filter_records(df, ['attributes["env"] == "prod"'])) == [2, 3, 4]
    assert _ids(filter_records(df, ['resource.attributes["svc"] == "a"'])) == [2, 4]
    assert _ids(
        filter_records(df, ['attributes["http.route"] == "/healthz"'])
    ) == [2, 3, 4]


def test_ismatch_and_literals(spark):
    df = _df(spark)
    assert _ids(
        filter_records(df, ['IsMatch(attributes["http.route"], "^/health")'])
    ) == [2, 3, 4]
    assert _ids(filter_records(df, ["status == 200"])) == [2, 3]
    assert _ids(filter_records(df, [])) == [1, 2, 3, 4]
    # multiple conditions are OR'd
    assert _ids(filter_records(df, ['method == "PUT"', "status == 500"])) == [1, 3]


def test_parse_errors():
    for bad in ["status ===", "Unknown(1)", 'attributes["x" == 1', "a &&& b", ""]:
        with pytest.raises(ValueError):
            compile_condition(bad)


def test_predicate_pushdown_to_scan(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = filter_records(ev, ['event_type == "error"'])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "error" in plan
    n_err = ev.where(F.col("event_type") == "error").count()
    assert out.count() == ev.count() - n_err
