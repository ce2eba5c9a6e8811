"""attributesprocessor action semantics over map columns."""

import hashlib

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.attributes import (
    apply_attribute_actions,
)


def _df(spark, maps):
    rows = [(i, m) for i, m in enumerate(maps)]
    return spark.createDataFrame(rows, "id long, attributes map<string,string>")


def _run(spark, maps, actions):
    out = apply_attribute_actions(_df(spark, maps), actions).orderBy("id").collect()
    return [dict(r["attributes"]) for r in out]


def test_insert_update_upsert_delete(spark):
    maps = [{"a": "1"}, {"a": "1", "b": "2"}]
    got = _run(
        spark,
        maps,
        [
            {"action": "insert", "key": "b", "value": "new"},   # only row 0
            {"action": "update", "key": "a", "value": "9"},     # both
            {"action": "update", "key": "zz", "value": "x"},    # no-op
            {"action": "upsert", "key": "c", "value": "3"},     # both
            {"action": "delete", "key": "a"},
        ],
    )
    assert got == [{"b": "new", "c": "3"}, {"b": "2", "c": "3"}]


def test_from_attribute_and_absent_source_noop(spark):
    got = _run(
        spark,
        [{"src": "v"}, {}],
        [
            {"action": "upsert", "key": "dst", "from_attribute": "src"},
            {"action": "insert", "key": "dst2", "from_attribute": "missing"},
        ],
    )
    assert got == [{"src": "v", "dst": "v"}, {}]


def test_hash_and_convert(spark):
    got = _run(
        spark,
        [{"uid": "alice", "n": "12.9", "d": "5", "bad": "xyz"}],
        [
            {"action": "hash", "key": "uid"},
            {"action": "convert", "key": "n", "converted_type": "int"},
            {"action": "convert", "key": "d", "converted_type": "double"},
            {"action": "convert", "key": "bad", "converted_type": "int"},  # no-op
        ],
    )[0]
    assert got["uid"] == hashlib.sha256(b"alice").hexdigest()
    assert got["n"] == "12"
    assert got["d"] == "5.0"
    assert got["bad"] == "xyz"


def test_extract_named_groups(spark):
    actions = [
        {
            "action": "extract",
            "key": "path",
            "pattern": r"^/api/(?<version>v\d+)/(?<resource>\w+)$",
        }
    ]
    got = _run(
        spark,
        [{"path": "/api/v2/users"}, {"path": "/healthz"}, {}],
        actions,
    )
    assert got[0] == {"path": "/api/v2/users", "version": "v2", "resource": "users"}
    assert got[1] == {"path": "/healthz"}  # no match -> nothing set
    assert got[2] == {}


def test_action_order_and_errors(spark):
    # later actions see earlier output: upsert then hash hashes the new value
    got = _run(
        spark,
        [{}],
        [
            {"action": "upsert", "key": "t", "value": "x"},
            {"action": "hash", "key": "t"},
        ],
    )[0]
    assert got["t"] == hashlib.sha256(b"x").hexdigest()
    with pytest.raises(ValueError):
        _run(spark, [{}], [{"action": "explode", "key": "t"}])
    with pytest.raises(ValueError):
        _run(spark, [{}], [{"action": "extract", "key": "t", "pattern": "no groups"}])
    with pytest.raises(ValueError):
        _run(spark, [{}], [{"action": "convert", "key": "t", "converted_type": "bool"}])


def test_null_map_treated_as_empty(spark):
    df = spark.createDataFrame([(1, None)], "id long, attributes map<string,string>")
    out = apply_attribute_actions(
        df, [{"action": "upsert", "key": "k", "value": "v"}]
    ).first()
    assert dict(out["attributes"]) == {"k": "v"}


def test_review_regressions(spark):
    """Lookbehinds pass through the regex translation; int convert is
    exact above 2^53."""
    got = _run(
        spark,
        [{"p": "a/b", "big": "9007199254740993"}],
        [
            # negative lookbehind: only match a name NOT preceded by '/'
            {"action": "extract", "key": "p",
             "pattern": r"^(?<!x)(?<head>\w+)/"},
            {"action": "convert", "key": "big", "converted_type": "int"},
        ],
    )[0]
    assert got["head"] == "a"
    assert got["big"] == "9007199254740993"  # double path would be ...992
