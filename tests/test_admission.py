"""L1 analog: deterministic per-key admission quota."""

from opentelemetry_collector_components_spark.streaming.admission import per_key_quota


def test_per_key_quota_tag(spark):
    rows = [("a", i) for i in range(5)] + [("b", i) for i in range(2)]
    df = spark.createDataFrame(rows, ["k", "seq"])
    out = per_key_quota(df, ["k"], quota=3, order_col="seq")
    throttled = {(r["k"], r["seq"]) for r in out.filter("throttled").collect()}
    assert throttled == {("a", 3), ("a", 4)}


def test_per_key_quota_error_behavior(spark):
    rows = [("a", i) for i in range(5)]
    df = spark.createDataFrame(rows, ["k", "seq"])
    out = per_key_quota(df, ["k"], quota=2, order_col="seq", behavior="error")
    assert out.count() == 2
    assert "throttled" not in out.columns
