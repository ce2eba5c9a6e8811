"""Hierarchical cardinality limits (A7 full) — golden parity with the
reference's sum_delta_overflow fixture (processor/lsmintervalprocessor/
testdata/sum_delta_overflow/{input,output}.yaml, limits all = 1, transcribed
below) plus chained-tracker behavior."""

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.limits import (
    OVERFLOW_DATAPOINT_METRIC_NAME,
    OVERFLOW_METRIC_NAME,
    harvest_overflow_metrics,
    hierarchical_overflow_limits,
    resource_scope_overflow_estimates,
)

COLS = ["seq", "resource_id", "scope_id", "metric_name", "dp_id", "value", "ts"]


def _sum_delta_fixture(spark):
    # input.yaml: one resource/scope; sum.1 dps (aaa=bbb@7: 333),
    # (aaa=bbb@8: 222), (aaa=ccc@8: 143); sum.2 dp (aaa=bbb@9: 444)
    rows = [
        (1, "r1", "s1", "delta.monotonic.sum.1", "aaa=bbb", 333.0, 7000000),
        (2, "r1", "s1", "delta.monotonic.sum.1", "aaa=bbb", 222.0, 8000000),
        (3, "r1", "s1", "delta.monotonic.sum.1", "aaa=ccc", 143.0, 8000000),
        (4, "r1", "s1", "delta.monotonic.sum.2", "aaa=bbb", 444.0, 9000000),
    ]
    return spark.createDataFrame(rows, COLS)


def test_sum_delta_overflow_golden(spark):
    ann = hierarchical_overflow_limits(
        _sum_delta_fixture(spark),
        res_limit=1, scope_limit=1, metric_limit=1, dp_limit=1,
    )
    # merged kept data: sum.1 aaa=bbb delta-summed to 555 at latest ts;
    # overflowed metric sum.2 and overflowed dp aaa=ccc are DROPPED (their
    # values appear nowhere in output.yaml)
    kept = (
        ann.filter(~F.col("metric_overflowed") & ~F.col("dp_overflowed"))
        .groupBy("res_eff", "scope_eff", "metric_name", "dp_id")
        .agg(F.sum("value").alias("value"), F.max("ts").alias("ts"))
        .collect()
    )
    assert len(kept) == 1
    r = kept[0]
    assert (r["res_eff"], r["scope_eff"]) == ("r1", "s1")
    assert r["metric_name"] == "delta.monotonic.sum.1" and r["dp_id"] == "aaa=bbb"
    assert r["value"] == 555.0 and r["ts"] == 8000000

    harvest = {
        (h["metric_name"], h["for_metric"]): h["value"]
        for h in harvest_overflow_metrics(ann).collect()
    }
    assert harvest[(OVERFLOW_METRIC_NAME, None)] == 1
    assert harvest[(OVERFLOW_DATAPOINT_METRIC_NAME, "delta.monotonic.sum.1")] == 1


def test_chained_trackers_route_through_overflow_parents(spark):
    # 3 resources, limit 1: r-a kept (earliest), r-b/r-c fold into _overflow.
    # Their scopes are then tracked under the OVERFLOW resource: scope limit 1
    # keeps only the first scope seen inside the bucket (s-b), s-c overflows.
    rows = [
        (1, "r-a", "s-a", "m", "d", 1.0, 0),
        (2, "r-b", "s-b", "m", "d", 1.0, 0),
        (3, "r-c", "s-c", "m", "d", 1.0, 0),
    ]
    df = spark.createDataFrame(rows, COLS)
    ann = hierarchical_overflow_limits(df, res_limit=1, scope_limit=1)
    eff = {
        r["resource_id"]: (r["res_eff"], r["scope_eff"]) for r in ann.collect()
    }
    assert eff["r-a"] == ("r-a", "s-a")
    assert eff["r-b"] == ("_overflow", "s-b")  # first scope inside the bucket
    assert eff["r-c"] == ("_overflow", "_overflow")  # second scope overflows

    est = {r["level"]: r["value"] for r in resource_scope_overflow_estimates(df and ann).collect()}
    assert est["resources"] == 2  # r-b, r-c distinct folded resources
    assert est["scopes"] == 1  # s-c under the overflow resource


def test_no_limit_passthrough(spark):
    df = _sum_delta_fixture(spark)
    ann = hierarchical_overflow_limits(df)
    assert ann.filter(
        (F.col("res_eff") != F.col("resource_id"))
        | F.col("metric_overflowed")
        | F.col("dp_overflowed")
    ).count() == 0
    assert harvest_overflow_metrics(ann).count() == 0


def test_first_n_is_seq_deterministic(spark):
    # identity seen BEFORE the limit is breached stays kept on later rows
    rows = [
        (1, "r", "s", "m1", "d1", 1.0, 0),
        (2, "r", "s", "m2", "d1", 1.0, 0),  # overflows (limit 1)
        (3, "r", "s", "m1", "d2", 1.0, 0),  # m1 still kept; d2 overflows dp limit
    ]
    df = spark.createDataFrame(rows, COLS)
    ann = hierarchical_overflow_limits(df, metric_limit=1, dp_limit=1)
    got = {(r["seq"]): (r["metric_overflowed"], r["dp_overflowed"]) for r in ann.collect()}
    assert got[1] == (False, False)
    assert got[2] == (True, False)  # dp not tracked inside overflowed metric
    assert got[3] == (False, True)


def test_exphistogram_delta_overflow_golden(spark):
    """testdata/exphistogram_delta_overflow (limits all = 1): the two
    aaa=bbb datapoints of test.1 merge through the exp-histogram kernel
    (count 153, zero 7, sum 1.0, pos [6,10,16,10,45]@2, neg [2,21,10,21,5]@6
    — output.yaml), aaa=ccc overflows the datapoint limit, test.2 overflows
    the metric limit.  Composes hierarchical_overflow_limits with
    merge_exp_histograms — chained trackers feeding the custom aggregate."""
    import pandas as pd

    from opentelemetry_collector_components_spark.operators.exphist import (
        merge_exp_histograms,
    )

    def dp(seq, metric, attrs, zero, cnt, s, po, pc, no, nc):
        return dict(
            seq=seq, resource_id="r", scope_id="s", metric_name=metric,
            dp_id=attrs, scale=4, zero_count=zero, zero_threshold=0.0,
            pos_offset=po, pos_counts=pc, neg_offset=no, neg_counts=nc,
            count=cnt, sum=s, min=None, max=None,
        )

    rows = [
        dp(1, "cumulative.exphistogram.test.1", "aaa=bbb", 5, 94, 2.5,
           2, [4, 7, 9, 6, 25], 6, [2, 13, 7, 12, 4]),
        dp(2, "cumulative.exphistogram.test.1", "aaa=bbb", 2, 59, -1.5,
           2, [2, 3, 7, 4, 20], 7, [8, 3, 9, 1]),
        dp(3, "cumulative.exphistogram.test.1", "aaa=ccc", 2, 57, 1.2,
           2, [1, 2, 9, 5, 22], 7, [5, 2, 7, 2]),
        dp(4, "cumulative.exphistogram.test.2", "aaa=bbb", 1, 10, 9.9,
           2, [1, 2, 3, 2, 2], 7, [1, 1]),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    ann = hierarchical_overflow_limits(
        df, res_limit=1, scope_limit=1, metric_limit=1, dp_limit=1
    )
    harvest = {
        (h["metric_name"], h["for_metric"]): h["value"]
        for h in harvest_overflow_metrics(ann).collect()
    }
    assert harvest[(OVERFLOW_METRIC_NAME, None)] == 1
    assert harvest[(OVERFLOW_DATAPOINT_METRIC_NAME,
                    "cumulative.exphistogram.test.1")] == 1

    kept = ann.filter("NOT metric_overflowed AND NOT dp_overflowed")
    merged = merge_exp_histograms(
        kept, ["res_eff", "scope_eff", "metric_name", "dp_id"]
    ).collect()
    assert len(merged) == 1
    m = merged[0]
    assert m["metric_name"] == "cumulative.exphistogram.test.1"
    assert m["dp_id"] == "aaa=bbb"
    assert m["count"] == 153 and m["zero_count"] == 7
    assert abs(m["sum"] - 1.0) < 1e-9
    assert m["pos_offset"] == 2 and m["pos_counts"] == [6, 10, 16, 10, 45]
    assert m["neg_offset"] == 6 and m["neg_counts"] == [2, 21, 10, 21, 5]


def test_sum_cumulative_overflow_golden(spark):
    """testdata/sum_cumulative_overflow (limits all = 1): sum.1 aaa=bbb
    replace-by-newest -> 222 @ 7000000; aaa=ccc overflows the dp limit,
    sum.2 overflows the metric limit (output.yaml: _overflow_metric=1,
    _overflow_datapoints=1, only the 222 dp survives)."""
    from opentelemetry_collector_components_spark.operators.merge import (
        merge_cumulative,
    )

    rows = [
        (1, "r1", "s1", "cumulative.monotonic.sum.1", "aaa=bbb", 333.0, 5000000),
        (2, "r1", "s1", "cumulative.monotonic.sum.1", "aaa=bbb", 222.0, 7000000),
        (3, "r1", "s1", "cumulative.monotonic.sum.1", "aaa=ccc", 143.0, 8000000),
        (4, "r1", "s1", "cumulative.monotonic.sum.2", "aaa=bbb", 444.0, 8000000),
    ]
    ann = hierarchical_overflow_limits(
        spark.createDataFrame(rows, COLS),
        res_limit=1, scope_limit=1, metric_limit=1, dp_limit=1,
    )
    kept = ann.filter(~F.col("metric_overflowed") & ~F.col("dp_overflowed"))
    merged = merge_cumulative(
        kept.withColumnRenamed("value", "value_double"),
        ["res_eff", "scope_eff", "metric_name", "dp_id"],
    ).collect()
    assert len(merged) == 1
    assert merged[0]["value"] == 222.0 and merged[0]["ts"] == 7000000

    harvest = {
        (h["metric_name"], h["for_metric"]): h["value"]
        for h in harvest_overflow_metrics(ann).collect()
    }
    assert harvest[(OVERFLOW_METRIC_NAME, None)] == 1
    assert harvest[(OVERFLOW_DATAPOINT_METRIC_NAME,
                    "cumulative.monotonic.sum.1")] == 1


def _hist_overflow_fixture(spark, prefix):
    cols = ("seq long, resource_id string, scope_id string, metric_name string,"
            " dp_id string, ts long, bounds array<double>,"
            " bucket_counts array<long>, count long, sum double")
    b = [0.01, 0.1, 1.0, 10.0, 100.0]
    rows = [
        (1, "r1", "s1", f"{prefix}.histogram.test.1", "aaa=bbb", 5000000,
         b, [9, 4, 7, 9, 6, 25], 60, 2670.0),
        (2, "r1", "s1", f"{prefix}.histogram.test.1", "aaa=bbb", 7000000,
         b, [5, 2, 3, 7, 4, 20], 41, 2110.0),
        (3, "r1", "s1", f"{prefix}.histogram.test.1", "aaa=ccc", 8000000,
         b, [4, 2, 3, 6, 3, 18], 36, 2010.23),
        (4, "r1", "s1", f"{prefix}.histogram.test.2", "aaa=bbb", 8000000,
         b, [11, 9, 12, 17, 8, 34], 91, 3600.0),
    ]
    return spark.createDataFrame(rows, cols)


def _assert_overflow_harvest(ann, metric1):
    harvest = {
        (h["metric_name"], h["for_metric"]): h["value"]
        for h in harvest_overflow_metrics(ann).collect()
    }
    assert harvest[(OVERFLOW_METRIC_NAME, None)] == 1
    assert harvest[(OVERFLOW_DATAPOINT_METRIC_NAME, metric1)] == 1


def test_histogram_delta_overflow_golden(spark):
    """testdata/histogram_delta_overflow (limits all = 1): the two aaa=bbb
    dps of test.1 vector-add to buckets [14,6,10,16,10,45], count 101,
    sum 4780 @ ts 7000000; aaa=ccc overflows the dp limit, test.2 the
    metric limit (output.yaml)."""
    from opentelemetry_collector_components_spark.operators.merge import (
        merge_delta_histogram,
    )

    df = _hist_overflow_fixture(spark, "delta")
    ann = hierarchical_overflow_limits(
        df, res_limit=1, scope_limit=1, metric_limit=1, dp_limit=1
    )
    kept = ann.filter(~F.col("metric_overflowed") & ~F.col("dp_overflowed"))
    merged = merge_delta_histogram(
        kept.withColumn("min", F.lit(None).cast("double"))
        .withColumn("max", F.lit(None).cast("double")),
        ["res_eff", "scope_eff", "metric_name", "dp_id"],
    ).collect()
    assert len(merged) == 1
    m = merged[0]
    assert m["bucket_counts"] == [14, 6, 10, 16, 10, 45]
    assert m["count"] == 101 and m["sum"] == 4780.0
    _assert_overflow_harvest(ann, "delta.histogram.test.1")


def test_histogram_cumulative_overflow_golden(spark):
    """testdata/histogram_cumulative_overflow (limits all = 1): test.1
    aaa=bbb replace-by-newest -> the ts-7000000 dp wholesale (buckets
    [5,2,3,7,4,20], count 41, sum 2110); aaa=ccc dp-overflows, test.2
    metric-overflows (output.yaml)."""
    from opentelemetry_collector_components_spark.operators.merge import (
        merge_cumulative_struct,
    )

    df = _hist_overflow_fixture(spark, "cumulative")
    ann = hierarchical_overflow_limits(
        df, res_limit=1, scope_limit=1, metric_limit=1, dp_limit=1
    )
    kept = ann.filter(~F.col("metric_overflowed") & ~F.col("dp_overflowed"))
    merged = merge_cumulative_struct(
        kept, ["res_eff", "scope_eff", "metric_name", "dp_id"],
        ["bounds", "bucket_counts", "count", "sum"],
    ).collect()
    assert len(merged) == 1
    m = merged[0]
    assert m["bucket_counts"] == [5, 2, 3, 7, 4, 20]
    assert m["count"] == 41 and m["sum"] == 2110.0 and m["ts"] == 7000000
    _assert_overflow_harvest(ann, "cumulative.histogram.test.1")


def test_merger_all_overflow_golden(spark):
    """testdata/merger/all_overflow (limits all = 1): second resource
    folds into the overflow-resource bucket; inside it scope.1 is kept,
    scope.2 folds into the overflow-scope bucket; inside THAT bucket
    sum.1's first dp (777) is kept, its second dp overflows the dp limit,
    sum.2 overflows the metric limit and its dps are NOT dp-tracked
    (output.yaml: _overflow_metric=1, _overflow_datapoints=1, values
    999 / 999 / 777 survive)."""
    rows = [
        (1, "res1", "scope.1", "delta.monotonic.sum.1", "dp", 999.0, 8000000),
        (2, "res2", "scope.1", "delta.monotonic.sum.1", "dp", 999.0, 8000000),
        (3, "res2", "scope.2", "delta.monotonic.sum.1", "dp", 777.0, 8000000),
        (4, "res2", "scope.2", "delta.monotonic.sum.1", "dp2", 482.0, 8500000),
        (5, "res2", "scope.2", "delta.monotonic.sum.2", "dp", 782.0, 9000000),
        (6, "res2", "scope.2", "delta.monotonic.sum.2", "dp2", 842.0, 9500000),
    ]
    ann = hierarchical_overflow_limits(
        spark.createDataFrame(rows, COLS),
        res_limit=1, scope_limit=1, metric_limit=1, dp_limit=1,
    )
    got = {r["seq"]: r for r in ann.collect()}
    assert (got[1]["res_eff"], got[1]["scope_eff"]) == ("res1", "scope.1")
    # res2 folds; scope.1 is the first scope inside the overflow bucket
    assert (got[2]["res_eff"], got[2]["scope_eff"]) == ("_overflow", "scope.1")
    assert got[3]["res_eff"] == "_overflow" and got[3]["scope_eff"] == "_overflow"
    kept = {
        r["seq"]: r["value"]
        for r in ann.filter(
            "NOT metric_overflowed AND NOT dp_overflowed"
        ).collect()
    }
    assert kept == {1: 999.0, 2: 999.0, 3: 777.0}
    harvest = {
        (h["metric_name"], h["for_metric"]): h["value"]
        for h in harvest_overflow_metrics(ann).collect()
    }
    assert harvest[(OVERFLOW_METRIC_NAME, None)] == 1
    assert harvest[(OVERFLOW_DATAPOINT_METRIC_NAME,
                    "delta.monotonic.sum.1")] == 1
    # sum.2's dps are not dp-tracked once the metric overflowed
    assert (OVERFLOW_DATAPOINT_METRIC_NAME, "delta.monotonic.sum.2") not in harvest


def test_null_identity_is_ranked_not_dropped(spark):
    """A NULL identity value is a legal tracked identity: it must compete
    for (and can win) a first-N slot, not silently route to overflow
    (regression: an equi-join re-derivation of the kept flag never
    matches NULL and under-fills the parent's limit)."""
    from opentelemetry_collector_components_spark.operators.limits import (
        hierarchical_overflow_limits,
    )

    rows = [
        # res r1: scopes None (seq 1), s1 (seq 2), s2 (seq 3); limit 2
        (1, "r1", None, "m", "d"),
        (2, "r1", "s1", "m", "d"),
        (3, "r1", "s2", "m", "d"),
    ]
    df = spark.createDataFrame(
        rows, "seq long, resource_id string, scope_id string, metric_name string, dp_id string"
    )
    ann = hierarchical_overflow_limits(df, scope_limit=2)
    got = {r["scope_id"]: r["scope_eff"] for r in ann.collect()}
    assert got[None] is None        # NULL scope arrived first -> kept
    assert got["s1"] == "s1"        # second -> kept
    assert got["s2"] == "_overflow"  # third -> over the limit of 2
