"""Debezium CDC: envelope decode leniency, last-writer-wins apply with
tie-break on lsn, delete tombstones, key recovery from before-images."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.sources.debezium import (
    apply_debezium,
    decode_debezium,
)

DDL = "id: bigint, v: string"


def _env(op, ts, lsn, before=None, after=None):
    return json.dumps(
        {
            "before": before,
            "after": after,
            "source": {"db": "d", "table": "t", "lsn": lsn},
            "op": op,
            "ts_ms": ts,
        }
    )


def _apply(spark, bodies):
    df = spark.createDataFrame([(b,) for b in bodies], "body string")
    return apply_debezium(decode_debezium(df, DDL), ["id"])


def test_last_writer_wins_and_lsn_tiebreak(spark):
    rows = _apply(
        spark,
        [
            _env("c", 100, 1, after={"id": 1, "v": "a"}),
            _env("u", 200, 3, before={"id": 1, "v": "a"}, after={"id": 1, "v": "b"}),
            # same ts as the update but LOWER lsn: must lose
            _env("u", 200, 2, before={"id": 1, "v": "a"}, after={"id": 1, "v": "z"}),
        ],
    ).collect()
    assert [(r.id, r.v) for r in rows] == [(1, "b")]


def test_delete_tombstones_with_key_from_before(spark):
    rows = _apply(
        spark,
        [
            _env("c", 100, 1, after={"id": 1, "v": "a"}),
            _env("d", 200, 2, before={"id": 1, "v": "a"}),  # after is null
            _env("c", 100, 1, after={"id": 2, "v": "x"}),
        ],
    ).collect()
    assert [(r.id, r.v) for r in rows] == [(2, "x")]


def test_malformed_and_unknown_op_are_invalid(spark):
    df = spark.createDataFrame(
        [("not json",), (_env("q", 1, 1, after={"id": 1, "v": "a"}),)],
        "body string",
    )
    dec = decode_debezium(df, DDL)
    assert dec.where("valid").count() == 0
    # invalid rows never reach the applied table
    assert apply_debezium(dec, ["id"]).count() == 0


def test_validation_and_jvm_plan(spark):
    df = spark.createDataFrame([(_env("c", 1, 1, after={"id": 1, "v": "a"}),)], "body string")
    with pytest.raises(ValueError, match="key_fields"):
        apply_debezium(decode_debezium(df, DDL), [])
    plan = (
        apply_debezium(decode_debezium(df, DDL), ["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_missing_op_is_false_not_null(spark):
    df = spark.createDataFrame(
        [('{"after": {"id": 1, "v": "a"}, "ts_ms": 5}',)], "body string"
    )
    dec = decode_debezium(df, DDL)
    # the reject audit must SEE this row: valid is false, never NULL
    assert dec.where("NOT valid").count() == 1
