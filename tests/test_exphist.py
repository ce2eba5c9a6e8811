"""M4c: exponential-histogram merge fidelity (SURVEY.md §7.3 hard part).

Mirrors the reference's testdata/exphistogram_delta fixtures: merging two
histograms at different scales equals histogramming the concatenated values
at the coarser scale; zero-threshold widening; the 160-bucket cap."""

import pandas as pd

from opentelemetry_collector_components_spark.operators.exphist import (
    merge_exphist_group,
    merge_exp_histograms,
    values_to_exphist,
)


def _df(*hists, metric="m1"):
    rows = [{**h, "metric": metric} for h in hists]
    return pd.DataFrame(rows)


def test_same_scale_merge_equals_concat():
    a = values_to_exphist([1.5, 3.0, 12.0], scale=2)
    b = values_to_exphist([2.5, 0.7], scale=2)
    both = values_to_exphist([1.5, 3.0, 12.0, 2.5, 0.7], scale=2)
    merged = merge_exphist_group(_df(a, b))
    for k in ("scale", "pos_offset", "pos_counts", "count", "zero_count"):
        assert merged[k] == both[k], k
    assert abs(merged["sum"] - both["sum"]) < 1e-9
    assert merged["min"] == 0.7 and merged["max"] == 12.0


def test_scale_alignment_downscales_to_min():
    """expo/scale.go:65: align by downscaling the higher scale; result equals
    histogramming everything at the lower scale."""
    a = values_to_exphist([1.5, 3.0, 12.0, 100.0], scale=2)
    b = values_to_exphist([2.5, 0.7, 64.0], scale=0)
    both = values_to_exphist([1.5, 3.0, 12.0, 100.0, 2.5, 0.7, 64.0], scale=0)
    merged = merge_exphist_group(_df(a, b))
    assert merged["scale"] == 0
    assert merged["pos_offset"] == both["pos_offset"]
    assert merged["pos_counts"] == both["pos_counts"]


def test_negative_values():
    a = values_to_exphist([-1.5, -3.0, 2.0], scale=1)
    b = values_to_exphist([-2.5], scale=1)
    both = values_to_exphist([-1.5, -3.0, 2.0, -2.5], scale=1)
    merged = merge_exphist_group(_df(a, b))
    assert merged["neg_offset"] == both["neg_offset"]
    assert merged["neg_counts"] == both["neg_counts"]
    assert merged["pos_counts"] == both["pos_counts"]


def test_zero_threshold_widening():
    """expo/zero.go:35-88: max threshold wins; buckets fully below it are
    absorbed into zero_count."""
    a = values_to_exphist([0.001, 4.0], scale=0, zero_threshold=0.5)  # 0.001 in zero bucket
    b = values_to_exphist([0.3, 8.0], scale=0, zero_threshold=0.0)   # 0.3 in a real bucket
    merged = merge_exphist_group(_df(a, b))
    assert merged["zero_threshold"] >= 0.5
    # 0.001 and 0.3 both end up in the zero bucket (0.3's bucket (0.25,0.5] <= 0.5)
    assert merged["zero_count"] == 2
    assert sum(merged["pos_counts"]) == 2  # 4.0 and 8.0 survive


def test_bucket_cap_downscales():
    """add.go:120-133: span > 160 buckets forces downscale."""
    # scale 4: values from 2^0 to 2^20 span 20*16=320 buckets > 160
    vals = [2.0**e for e in range(0, 21)]
    a = values_to_exphist(vals, scale=4)
    merged = merge_exphist_group(_df(a))
    assert merged["scale"] < 4
    assert len(merged["pos_counts"]) <= 160
    assert merged["count"] == len(vals)
    assert sum(merged["pos_counts"]) == len(vals)


def test_merge_is_order_independent():
    hs = [
        values_to_exphist([1.5, 3.0], scale=3),
        values_to_exphist([700.0, 0.4], scale=1),
        values_to_exphist([22.0], scale=2),
    ]
    m1 = merge_exphist_group(_df(*hs))
    m2 = merge_exphist_group(_df(*reversed(hs)))
    assert m1 == m2


def test_spark_applyinpandas(spark):
    """End-to-end through the Spark UDAF surface."""
    a = values_to_exphist([1.5, 3.0, 12.0], scale=2)
    b = values_to_exphist([2.5, 0.7], scale=2)
    c = values_to_exphist([5.0], scale=0)
    pdf = pd.DataFrame([{**a, "metric": "m1"}, {**b, "metric": "m1"}, {**c, "metric": "m2"}])
    df = spark.createDataFrame(pdf)
    out = {r["metric"]: r for r in merge_exp_histograms(df, ["metric"]).collect()}
    both = values_to_exphist([1.5, 3.0, 12.0, 2.5, 0.7], scale=2)
    assert out["m1"]["pos_counts"] == both["pos_counts"]
    assert out["m1"]["count"] == 5
    assert out["m2"]["count"] == 1
    plan = merge_exp_histograms(df, ["metric"])._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan and "BatchEvalPython" not in plan


def test_skewed_hot_series_within_2x_of_uniform(spark):
    """One series holding ALL 10^6 datapoints must merge within ~2x of the
    same rows spread over 1000 series: the map-side local combine reduces
    each input partition to per-key partials before the shuffle, so a hot
    key never funnels a million raw rows into one reducer task."""
    import time

    from pyspark.sql import functions as F

    def dps(n):
        return spark.range(n).select(
            "id",
            F.lit(4).alias("scale"),
            F.lit(0).cast("long").alias("zero_count"),
            F.lit(0.0).alias("zero_threshold"),
            (F.col("id") % 50).cast("int").alias("pos_offset"),
            F.array(F.lit(1).cast("long")).alias("pos_counts"),
            F.lit(0).cast("int").alias("neg_offset"),
            F.array().cast("array<long>").alias("neg_counts"),
            F.lit(1).cast("long").alias("count"),
            F.lit(1.0).alias("sum"),
            F.lit(1.0).alias("min"),
            F.lit(2.0).alias("max"),
        )

    n = 1_000_000
    hot = dps(n).withColumn("series", F.lit("hot")).drop("id")
    uniform = dps(n).withColumn(
        "series", F.concat(F.lit("s"), (F.col("id") % 1000).cast("string"))
    ).drop("id")

    def run(df):
        t0 = time.monotonic()
        rows = merge_exp_histograms(df, ["series"]).collect()
        return time.monotonic() - t0, rows

    # warm up the python workers once so neither side pays startup cost
    run(dps(10_000).withColumn("series", F.lit("w")).drop("id"))
    t_uni, _ = run(uniform)
    t_hot, hot_rows = run(hot)
    assert len(hot_rows) == 1 and hot_rows[0]["count"] == n
    assert sum(hot_rows[0]["pos_counts"]) == n
    assert t_hot <= 2.0 * t_uni + 1.0, (t_hot, t_uni)
