"""As-of join semantics: both implementations, tie handling, left-join."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.asof import (
    asof_join_range,
    asof_join_union,
)


@pytest.fixture(scope="module")
def tables(spark):
    events = spark.createDataFrame(
        [
            (1, "u1", 100),
            (2, "u1", 150),   # between versions
            (3, "u1", 200),   # exactly at version 2's instant (tie)
            (4, "u1", 50),    # before any version
            (5, "u2", 500),   # key with no versions at all
        ],
        "event_id long, user_id string, ts long",
    ).select("event_id", "user_id", F.timestamp_seconds("ts").alias("ts"))
    dims = spark.createDataFrame(
        [("u1", 100, "a"), ("u1", 200, "b")],
        "user_id string, dim_ts long, tier string",
    ).select("user_id", F.timestamp_seconds("dim_ts").alias("dim_ts"), "tier")
    return events, dims


EXPECTED = {1: "a", 2: "a", 3: "b", 4: None, 5: None}


@pytest.mark.parametrize("impl", [asof_join_range, asof_join_union])
def test_asof_semantics(spark, tables, impl):
    events, dims = tables
    got = {
        r["event_id"]: r["tier"]
        for r in impl(events, dims, ["user_id"], ts_col="ts").collect()
    }
    assert got == EXPECTED


def test_both_forms_agree_on_random_data(spark):
    ev = spark.range(500).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("u"), F.pmod("id", F.lit(7))).alias("user_id"),
        F.timestamp_seconds(F.pmod(F.col("id") * 131, F.lit(10000))).alias("ts"),
    )
    dims = spark.range(40).select(
        F.concat(F.lit("u"), F.pmod("id", F.lit(7))).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 251 % 10000).alias("dim_ts"),
        F.concat(F.lit("v"), F.col("id")).alias("tier"),
    ).groupBy("user_id", "dim_ts").agg(F.min("tier").alias("tier"))
    a = sorted(
        (r["event_id"], r["tier"])
        for r in asof_join_range(ev, dims, ["user_id"], ts_col="ts").collect()
    )
    b = sorted(
        (r["event_id"], r["tier"])
        for r in asof_join_union(ev, dims, ["user_id"], ts_col="ts").collect()
    )
    assert a == b


def test_no_python_in_plan(spark, tables):
    events, dims = tables
    for impl in (asof_join_range, asof_join_union):
        plan = (
            impl(events, dims, ["user_id"], ts_col="ts")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan


def test_null_attribute_version_propagates(spark):
    """Review r4: a version that legitimately sets an attribute to NULL
    must yield NULL (not a stale older value) in BOTH forms, and versions
    stay atomic across multiple attributes."""
    events = spark.createDataFrame(
        [(1, "u1", 250)], "event_id long, user_id string, ts long"
    ).select("event_id", "user_id", F.timestamp_seconds("ts").alias("ts"))
    dims = spark.createDataFrame(
        [("u1", 100, "a", "x"), ("u1", 200, None, "y")],
        "user_id string, dim_ts long, tier string, plan string",
    ).select(
        "user_id", F.timestamp_seconds("dim_ts").alias("dim_ts"), "tier", "plan"
    )
    for impl in (asof_join_range, asof_join_union):
        r = impl(events, dims, ["user_id"], ts_col="ts").collect()[0]
        assert (r["tier"], r["plan"]) == (None, "y"), impl.__name__


class TestScd2FromChanges:
    def _log(self, spark, rows):
        return spark.createDataFrame(
            rows, "entity_id string, ts timestamp, plan string, region string"
        )

    def test_compaction_intervals_and_current(self, spark):
        from datetime import datetime

        from opentelemetry_collector_components_spark.operators.asof import (
            scd2_from_changes,
        )

        t = lambda h: datetime(2026, 1, 1, h)
        rows = [
            ("u1", t(0), "a", "x"),
            ("u1", t(1), "a", "x"),   # unchanged -> compacted away
            ("u1", t(2), "b", "x"),   # plan change -> version 2
            ("u1", t(3), "b", None),  # region -> NULL is a real change
            ("u1", t(4), "b", None),  # unchanged (NULL == NULL null-safely)
            ("u2", t(0), "a", "y"),
        ]
        out = scd2_from_changes(self._log(spark, rows), ["entity_id"])
        got = sorted(
            (r.entity_id, r.version, r.plan, r.region,
             r.valid_from.hour, r.valid_to.hour if r.valid_to else None,
             r.is_current)
            for r in out.collect()
        )
        assert got == [
            ("u1", 1, "a", "x", 0, 2, False),
            ("u1", 2, "b", "x", 2, 3, False),
            ("u1", 3, "b", None, 3, None, True),
            ("u2", 1, "a", "y", 0, None, True),
        ]

    def test_roundtrip_with_asof_join_range(self, spark):
        # SCD2 output's [valid_from, valid_to) intervals are exactly what
        # asof_join_range reconstructs from the raw log: same answer
        from datetime import datetime

        from opentelemetry_collector_components_spark.operators.asof import (
            asof_join_range,
            scd2_from_changes,
        )

        t = lambda h: datetime(2026, 1, 1, h)
        log = self._log(spark, [
            ("u1", t(0), "a", "x"), ("u1", t(2), "b", "x"),
        ])
        hist = scd2_from_changes(log, ["entity_id"])
        events = spark.createDataFrame(
            [("u1", t(1)), ("u1", t(2)), ("u1", t(9))], "entity_id string, ts timestamp"
        )
        via_asof = asof_join_range(
            events, log, ["entity_id"], dim_ts_col="ts", attrs=["plan"]
        )
        via_hist = (
            events.alias("e")
            .join(
                hist.alias("h"),
                (F.col("e.entity_id") == F.col("h.entity_id"))
                & (F.col("e.ts") >= F.col("h.valid_from"))
                & (F.col("h.valid_to").isNull() | (F.col("e.ts") < F.col("h.valid_to"))),
                "left",
            )
            .select("e.entity_id", "e.ts", "h.plan")
        )
        assert sorted(map(tuple, via_asof.collect())) == sorted(
            map(tuple, via_hist.collect())
        )


# --- point-in-time feature join ---------------------------------------------
def test_pit_strict_excludes_label_instant(spark):
    import datetime as dt

    from opentelemetry_collector_components_spark.operators.asof import (
        point_in_time_features,
    )

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    labels = spark.createDataFrame(
        [(1, "u", t(10)), (2, "u", t(12))], "label_id long, k string, ts timestamp"
    )
    feats = spark.createDataFrame(
        [("u", t(9), 100), ("u", t(10), 200), ("u", t(11), 300)],
        "k string, fts timestamp, v long",
    )
    strict = point_in_time_features(
        labels, [("f", feats, "fts")], ["k"], strict=True
    ).collect()
    got = {r.label_id: r.f_v for r in strict}
    # the snapshot stamped AT the label instant is the classic half-leak
    assert got == {1: 100, 2: 300}
    loose = point_in_time_features(
        labels, [("f", feats, "fts")], ["k"], strict=False
    ).collect()
    assert {r.label_id: r.f_v for r in loose} == {1: 200, 2: 300}


def test_pit_two_tables_prefix_and_missing(spark):
    import datetime as dt

    from opentelemetry_collector_components_spark.operators.asof import (
        point_in_time_features,
    )

    t0 = dt.datetime(2024, 1, 1)
    labels = spark.createDataFrame(
        [(1, "u", t0), (2, "w", t0)], "label_id long, k string, ts timestamp"
    )
    a = spark.createDataFrame(
        [("u", dt.datetime(2023, 12, 31), 5)], "k string, fts timestamp, v long"
    )
    b = spark.createDataFrame(
        [("u", dt.datetime(2023, 12, 30), 7)], "k string, fts timestamp, v long"
    )
    out = point_in_time_features(
        labels, [("a", a, "fts"), ("b", b, "fts")], ["k"]
    ).collect()
    got = {r.label_id: (r.a_v, r.b_v) for r in out}
    assert got == {1: (5, 7), 2: (None, None)}  # no history -> NULLs
    import pytest as _pt
    with _pt.raises(ValueError, match="unique"):
        point_in_time_features(labels, [("a", a, "fts"), ("a", b, "fts")], ["k"])
    with _pt.raises(ValueError, match="non-empty"):
        point_in_time_features(labels, [], ["k"])
