"""M4b: lsminterval merge semantics — golden fixtures mirroring
processor/lsmintervalprocessor/testdata/{sum_delta,sum_cumulative,
histogram_delta,...} behavior."""

from datetime import datetime

from opentelemetry_collector_components_spark.operators.merge import (
    merge_cumulative,
    merge_delta_histogram,
    merge_delta_sum,
    merge_summary,
    overflow_remap,
)


def ts(s):
    return datetime.fromisoformat(s)


def test_delta_sum(spark):
    df = spark.createDataFrame(
        [("m1", ts("2026-01-01T00:00:01"), 1, 1.5),
         ("m1", ts("2026-01-01T00:00:02"), 2, 2.5),
         ("m2", ts("2026-01-01T00:00:03"), 3, 10.0)],
        ["metric", "ts", "seq", "value_double"],
    )
    out = {r["metric"]: r["value"] for r in merge_delta_sum(df, ["metric"]).collect()}
    assert out == {"m1": 4.0, "m2": 10.0}


def test_cumulative_newest_wins_out_of_order(spark):
    """Older timestamp arriving LATER is ignored (datapoints.go:65-79;
    reference fixture comment: 'This data point is out of order ... ignore it')."""
    df = spark.createDataFrame(
        [("m1", ts("2026-01-01T00:00:10"), 1, 100.0),   # newest ts, arrives first
         ("m1", ts("2026-01-01T00:00:05"), 2, 50.0)],   # older ts, arrives later
        ["metric", "ts", "seq", "value_double"],
    )
    out = merge_cumulative(df, ["metric"]).collect()[0]
    assert out["value"] == 100.0


def test_cumulative_tie_first_arrival_wins(spark):
    """Strict > in the reference keeps the EXISTING value on equal ts."""
    df = spark.createDataFrame(
        [("m1", ts("2026-01-01T00:00:10"), 1, 100.0),
         ("m1", ts("2026-01-01T00:00:10"), 2, 999.0)],
        ["metric", "ts", "seq", "value_double"],
    )
    out = merge_cumulative(df, ["metric"]).collect()[0]
    assert out["value"] == 100.0


def test_histogram_vector_add_same_bounds(spark):
    df = spark.createDataFrame(
        [("h1", ts("2026-01-01T00:00:01"), 1, [1.0, 5.0], [1, 2, 3], 6, 10.0, 0.5, 9.0),
         ("h1", ts("2026-01-01T00:00:02"), 2, [1.0, 5.0], [4, 0, 1], 5, 7.0, 0.2, 6.0)],
        ["metric", "ts", "seq", "bounds", "bucket_counts", "count", "sum", "min", "max"],
    )
    out = merge_delta_histogram(df, ["metric"]).collect()[0]
    assert out["bucket_counts"] == [5, 2, 4]
    assert out["count"] == 11 and out["sum"] == 17.0
    assert out["min"] == 0.2 and out["max"] == 9.0


def test_histogram_bounds_mismatch_resets_to_newest(spark):
    """add.go:72-76: differing bounds -> state reset to the newest datapoint."""
    df = spark.createDataFrame(
        [("h1", ts("2026-01-01T00:00:01"), 1, [1.0, 5.0], [1, 2, 3], 6, 10.0, 0.5, 9.0),
         ("h1", ts("2026-01-01T00:00:09"), 2, [2.0, 4.0, 8.0], [1, 1, 1, 1], 4, 8.0, 1.0, 7.0)],
        ["metric", "ts", "seq", "bounds", "bucket_counts", "count", "sum", "min", "max"],
    )
    out = merge_delta_histogram(df, ["metric"]).collect()[0]
    assert out["bounds"] == [2.0, 4.0, 8.0]
    assert out["bucket_counts"] == [1, 1, 1, 1]
    assert out["count"] == 4


def test_summary_replace_by_newest(spark):
    df = spark.createDataFrame(
        [("s1", ts("2026-01-01T00:00:01"), 1, 10, 100.0),
         ("s1", ts("2026-01-01T00:00:05"), 2, 20, 250.0)],
        ["metric", "ts", "seq", "count", "sum"],
    )
    out = merge_summary(df, ["metric"]).collect()[0]
    assert out["count"] == 20 and out["sum"] == 250.0


def test_overflow_remap(spark):
    """limits/tracker.go:40-98: first `limit` distinct ids admitted in
    arrival order; later ones -> _overflow."""
    rows = []
    for i, (attr_id, t) in enumerate(
        [("a", 1), ("b", 2), ("c", 3), ("a", 4), ("d", 5), ("b", 6)]
    ):
        rows.append(("m1", ts(f"2026-01-01T00:00:0{t}"), i, attr_id, 1.0))
    df = spark.createDataFrame(rows, ["metric", "ts", "seq", "attr_id", "value_double"])
    out = overflow_remap(df, ["metric"], "attr_id", limit=2)
    merged = {
        (r["attr_id_merged"]): r["value"]
        for r in merge_delta_sum(out, ["metric", "attr_id_merged"])
        .withColumnRenamed("attr_id_merged", "attr_id_merged")
        .collect()
    }
    # a,b admitted (first 2 distinct); c,d overflow
    assert merged == {"a": 2.0, "b": 2.0, "_overflow": 2.0}
    n_overflow_ids = out.filter("overflow").select("attr_id").distinct().count()
    assert n_overflow_ids == 2  # the _overflow_datapoints estimate input


def test_delta_histogram_bounds_revert_does_not_resurrect(spark):
    """bounds A -> B -> A: the fold resets at each bounds change, so only
    the datapoints after the LAST change merge (the early A datapoint must
    not come back even though it matches the winning bounds)."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.merge import (
        merge_delta_histogram,
    )

    a, b = [1.0], [9.0]
    rows = [
        ("m", 1, 1, a, [1, 1], 2, 1.0, 0.1, 0.9),
        ("m", 2, 2, b, [5, 5], 10, 5.0, 0.2, 4.0),
        ("m", 3, 3, a, [2, 2], 4, 2.0, 0.3, 1.5),
    ]
    df = spark.createDataFrame(
        rows,
        "metric string, ts long, seq long, bounds array<double>,"
        " bucket_counts array<long>, count long, sum double,"
        " min double, max double",
    )
    out = merge_delta_histogram(df, ["metric"]).collect()
    assert len(out) == 1
    m = out[0]
    assert m["bucket_counts"] == [2, 2] and m["count"] == 4 and m["sum"] == 2.0
    assert m["min"] == 0.3 and m["max"] == 1.5
