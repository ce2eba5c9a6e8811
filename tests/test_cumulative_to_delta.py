"""cumulativetodelta semantics: first-point drop, diffs, counter resets."""

from opentelemetry_collector_components_spark.operators.merge import (
    cumulative_to_delta,
)


def test_diff_reset_and_first_drop(spark):
    rows = [
        # series A: 10 -> 15 -> 3 (reset) -> 7
        ("A", 1, 10), ("A", 2, 15), ("A", 3, 3), ("A", 4, 7),
        # series B: single point -> fully dropped
        ("B", 1, 99),
        # series C: flat counter -> zero deltas
        ("C", 1, 5), ("C", 2, 5),
    ]
    df = spark.createDataFrame(rows, "k string, ts long, v long")
    out = cumulative_to_delta(df, ["k"], value_col="v", ts_col="ts")
    got = {(r["k"], r["ts"]): r["delta"] for r in out.collect()}
    assert got == {
        ("A", 2): 5, ("A", 3): 3, ("A", 4): 4,
        ("C", 2): 0,
    }


def test_tie_break_by_seq(spark):
    rows = [("A", 1, 0, 10), ("A", 1, 1, 12), ("A", 2, 2, 13)]
    df = spark.createDataFrame(rows, "k string, ts long, seq long, v long")
    out = cumulative_to_delta(df, ["k"], value_col="v", ts_col="ts", seq_col="seq")
    got = sorted((r["seq"], r["delta"]) for r in out.collect())
    assert got == [(1, 2), (2, 1)]
