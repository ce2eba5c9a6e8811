"""E9/M6: salted repartition + two-phase skew-proof aggregation."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.parse import parse_pages
from opentelemetry_collector_components_spark.operators.partition import (
    salted_repartition,
    two_phase_agg,
)
from opentelemetry_collector_components_spark.sources.pages import generate_pages


def test_two_phase_equals_direct(spark):
    parsed = parse_pages(generate_pages(spark, 20000))
    direct = {
        (r["domain"],): (r["docs"], r["dur"])
        for r in parsed.groupBy("domain")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("dur_us").alias("dur"))
        .collect()
    }
    two = {
        (r["domain"],): (r["docs"], r["dur"])
        for r in two_phase_agg(
            parsed,
            keys=["domain"],
            partial_aggs={"docs": F.count(F.lit(1)), "dur": F.sum("dur_us")},
            final_aggs={"docs": F.sum("docs"), "dur": F.sum("dur")},
            salt_key="url",
            n_salts=8,
        ).collect()
    }
    assert two == direct


def test_salted_repartition_preserves_rows_and_spreads(spark):
    pages = generate_pages(spark, 20000)
    out = salted_repartition(pages, "url", n_salts=16, n_partitions=16)
    assert out.count() == 20000
    assert "_salt" not in out.columns
    # hot domain rows spread over many partitions (not 1)
    hot = out.filter(F.col("url").like("https://hot0%")).select(
        F.spark_partition_id().alias("p")
    )
    nparts = hot.distinct().count()
    assert nparts >= 8


def test_two_phase_top_n_equals_plain_window(spark):
    """Exactness under group skew: two-phase first-N == single-window
    first-N for every group, including one group holding ~90% of rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.partition import (
        two_phase_top_n,
    )

    df = spark.range(20000).select(
        F.when(F.col("id") < 18000, "hot").otherwise(F.concat(F.lit("g"), F.col("id") % 5)).alias("grp"),
        (F.xxhash64("id")).alias("ord"),
        F.col("id"),
    ).repartition(16)
    got = two_phase_top_n(df, ["grp"], ["ord", "id"], 7)
    w = Window.partitionBy("grp").orderBy("ord", "id")
    want = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 7)
        .drop("_rn")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_sample_exact_quota_counts(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.sampling import (
        sample_exact_quota,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, "rare").otherwise("common").alias("source"),
    )
    out = sample_exact_quota(df, {"rare": 30, "common": 50}, seed=1)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"rare": 30, "common": 50}
    # quota above group size -> whole group; determinism across calls
    again = sample_exact_quota(df, {"rare": 30, "common": 50}, seed=1)
    assert out.exceptAll(again).count() == 0
    big = sample_exact_quota(df, {"rare": 500}, seed=1, default_quota=0)
    assert big.count() == 100


def test_frequent_items_verified_exact_under_small_k(spark):
    """MG candidates with aggressive decrements still yield the EXACT
    heavy-hitter set: 10k rows, zipf-ish ids, k small enough that every
    partition prunes its counter dict many times."""
    from opentelemetry_collector_components_spark.operators.partition import (
        frequent_items_verified,
    )

    # id % 7 == 0 -> item 'hot' (~14%), else one of 997 cold items
    df = (
        spark.range(10000)
        .repartition(8)  # spread the hot item across every partition
        .select(
            F.when(F.col("id") % 7 == 0, F.lit(-1))
            .otherwise(F.col("id") % 997)
            .alias("item")
        )
    )
    out = {r["item"]: r["cnt"] for r in frequent_items_verified(df, "item", k=12).collect()}
    truth = {
        r["item"]: r["cnt"]
        for r in df.groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * 12 > 10000)
        .collect()
    }
    assert out == truth and -1 in out

    with pytest.raises(ValueError):
        frequent_items_verified(df, "item", k=1)


def test_frequent_items_null_group_exact(spark):
    """NULL is a group under SQL GROUP BY semantics: a frequent NULL item
    is reported with its exact count (the sketch's dropna must not lose
    it), and an infrequent NULL stays absent."""
    from opentelemetry_collector_components_spark.operators.partition import (
        frequent_items_verified,
    )

    # ~33% NULL (1667 of 5000 > n/k = 1250), spread across partitions
    df = (
        spark.range(5000)
        .repartition(8)
        .select(
            F.when(F.col("id") % 3 == 0, F.lit(None).cast("long"))
            .otherwise(F.col("id") % 400)
            .alias("item")
        )
    )
    out = {r["item"]: r["cnt"] for r in frequent_items_verified(df, "item", k=4).collect()}
    assert out == {None: 1667}

    # NULL below threshold: only 1 null row -> absent
    df2 = spark.range(1000).select(
        F.when(F.col("id") == 0, F.lit(None).cast("long"))
        .otherwise(F.col("id") % 3)
        .alias("item")
    )
    out2 = {r["item"]: r["cnt"] for r in frequent_items_verified(df2, "item", k=4).collect()}
    assert None not in out2 and set(out2) == {0, 1, 2}


# ---------------------------------------------------------------------------
# rendezvous (HRW) sharding
# ---------------------------------------------------------------------------
def test_rendezvous_balance_and_determinism(spark):
    from opentelemetry_collector_components_spark.operators.partition import (
        rendezvous_assign,
    )

    df = spark.range(5000).select(F.col("id"))
    shards = [f"s{i}" for i in range(5)]
    out = df.select("id", rendezvous_assign(F.col("id"), shards).alias("sh"))
    counts = {r.sh: r["count"] for r in out.groupBy("sh").count().collect()}
    assert set(counts) == set(shards)
    for c in counts.values():
        assert abs(c - 1000) < 150  # near-uniform
    again = df.select("id", rendezvous_assign(F.col("id"), shards).alias("sh"))
    assert out.collect() == again.collect()


def test_rendezvous_minimal_movement_on_resize(spark):
    from opentelemetry_collector_components_spark.operators.partition import (
        rendezvous_assign,
    )

    df = spark.range(4000).select(F.col("id"))
    small = [f"s{i}" for i in range(4)]
    big = small + ["s4"]
    a = {r.id: r.sh for r in df.select("id", rendezvous_assign(F.col("id"), small).alias("sh")).collect()}
    b = {r.id: r.sh for r in df.select("id", rendezvous_assign(F.col("id"), big).alias("sh")).collect()}
    moved = {k for k in a if a[k] != b[k]}
    # every moved key moved TO the new shard; nothing shuffled laterally
    assert all(b[k] == "s4" for k in moved)
    # and roughly 1/5 of keys moved
    assert abs(len(moved) - 800) < 150

    import pytest as _pytest

    with _pytest.raises(ValueError):
        rendezvous_assign(F.col("id"), [])
    with _pytest.raises(ValueError):
        rendezvous_assign(F.col("id"), ["a", "a"])


def test_rendezvous_plan_is_jvm_only(spark):
    from opentelemetry_collector_components_spark.operators.partition import (
        rendezvous_assign,
    )

    df = spark.range(10)
    plan = (
        df.select(rendezvous_assign(F.col("id"), ["a", "b"]).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
