"""Per-key admission quota (L1 ratelimitprocessor analog) unit tests."""

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.streaming.admission import per_key_quota


def test_per_key_quota_tag_and_error(spark):
    rows = [(k, i) for k in ("a", "b") for i in range(5)] + [("c", 0)]
    df = spark.createDataFrame(rows, ["key", "seq"])

    tagged = per_key_quota(df, ["key"], quota=3, order_col="seq", behavior="tag")
    per_key = {
        (r["key"], r["throttled"]): r["n"]
        for r in tagged.groupBy("key", "throttled").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_key[("a", False)] == 3 and per_key[("a", True)] == 2
    assert per_key[("b", False)] == 3 and per_key[("b", True)] == 2
    assert per_key[("c", False)] == 1 and ("c", True) not in per_key

    # admission is by order_col: the first `quota` seqs are admitted
    admitted = {
        r["seq"] for r in tagged.filter("key = 'a' and not throttled").collect()
    }
    assert admitted == {0, 1, 2}

    rejected_mode = per_key_quota(df, ["key"], quota=3, order_col="seq", behavior="error")
    assert rejected_mode.count() == 7  # 3 + 3 + 1
    assert "throttled" not in rejected_mode.columns
