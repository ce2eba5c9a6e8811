"""M3: routing — data-stream rules + cardinality buckets (router.go analogs)."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.route import (
    cardinality_decisions,
    normalize_dataset,
    with_cardinality_route,
)


def test_normalize_dataset(spark):
    df = spark.createDataFrame([("My Service/v2!",)], ["s"])
    assert df.select(normalize_dataset(F.col("s")).alias("n")).collect()[0]["n"] == "my_service_v2_"


@pytest.fixture()
def tenants(spark):
    """FIXTURES.md §3: tenants 0-3 -> <=2 distinct conn_ids, 4-7 -> <=50,
    8-11 -> >50."""
    df = spark.range(12 * 200).select(
        F.concat(F.lit("t"), F.pmod("id", F.lit(12))).alias("tenant"),
        F.col("id").alias("i"),
    )
    tnum = F.pmod(F.col("i"), F.lit(12))
    card = (
        F.when(tnum < 4, F.pmod(F.col("i"), F.lit(2)))
        .when(tnum < 8, F.pmod(F.col("i"), F.lit(40)))
        .otherwise(F.col("i"))
    )
    return df.select("tenant", F.concat(F.lit("c"), card).alias("conn_id"))


def test_cardinality_buckets(spark, tenants):
    dec = cardinality_decisions(tenants, ["tenant"], "conn_id", [2, 50], exact=True)
    routes = {r["tenant"]: r["route"] for r in dec.collect()}
    for t in range(12):
        expected = "0_2" if t < 4 else ("2_50" if t < 8 else "50_inf")
        assert routes[f"t{t}"] == expected, (t, routes[f"t{t}"])


def test_route_join_and_default(spark, tenants):
    extra = spark.createDataFrame([("t_unseen", "c1")], ["tenant", "conn_id"])
    dec = cardinality_decisions(tenants, ["tenant"], "conn_id", [2, 50], exact=True)
    routed = with_cardinality_route(
        tenants.unionByName(extra), ["tenant"], "conn_id", [2, 50], decisions=dec
    )
    # unseen tenant (no decision) -> default (router.go:299-330)
    row = routed.filter("tenant = 't_unseen'").collect()[0]
    assert row["route"] == "default"
    assert routed.filter("route = 'default'").count() == 1


def test_thresholds_must_ascend(spark, tenants):
    with pytest.raises(ValueError, match="ascending"):
        cardinality_decisions(tenants, ["tenant"], "conn_id", [50, 2])


def test_normalize_service_name_exact_charset(spark):
    """data_stream.go:197-205: lowercase + the exact 14-char set -> '_';
    other characters (unicode, underscore, digits) pass through."""
    from opentelemetry_collector_components_spark.operators.route import (
        normalize_service_name,
    )

    rows = [
        ('My Service/v2.1',),  # space, slash, dot
        ('A\\B*C?D"E<F>G|H',),
        ('x,y#z:w-q',),
        ('keep_under_score9',),
        ('Ünïcode',),          # unicode untouched (unlike [^a-z0-9])
    ]
    df = spark.createDataFrame(rows, ["s"])
    got = [r["n"] for r in df.select(normalize_service_name(df.s).alias("n")).collect()]
    assert got == [
        "my_service_v2_1",
        "a_b_c_d_e_f_g_h",
        "x_y_z_w_q",
        "keep_under_score9",
        "ünïcode",
    ]


def test_ecs_host_resolution_and_label_sanitize(spark):
    """ecs_translation.go:240-265 + 546-552 edge cases."""
    from opentelemetry_collector_components_spark.operators.enrich import (
        ecs_resolve_host,
        sanitize_label_key,
    )

    cols = ("service_name string, host_name string, host_hostname string,"
            " k8s_node_name string, k8s_pod_name string, k8s_pod_uid string,"
            " k8s_namespace string")
    rows = [
        ("", "", "hh", "node1", "pod1", "", ""),   # node overrides hostname
        ("s", "", "hh", "", "pod1", "", ""),       # pod w/o node clears it
        ("s", "", "hh", "", "", "", ""),           # host_name <- hostname
        ("s", "hn", "hh", "", "", "", ""),         # explicit host_name kept
    ]
    out = ecs_resolve_host(spark.createDataFrame(rows, cols)).collect()
    got = [(r["service_name"], r["host_name"], r["host_hostname"]) for r in out]
    assert got == [
        ("unknown", "node1", "node1"),
        ("s", None, None),
        ("s", "hh", "hh"),
        ("s", "hn", "hh"),
    ]
    lab = spark.createDataFrame([('a.b*c"d_e',)], ["k"]).select(
        sanitize_label_key(F.col("k")).alias("s")
    ).collect()[0]["s"]
    assert lab == "a_b_c_d_e"


def test_decision_lag_uses_prior_batch(spark):
    """router.go:172-192,334-361: the decision cache lags — batch N routes
    on cardinality observed through batch N-1.  A key whose cardinality
    explodes IN the current batch still follows its old (low) decision;
    a brand-new key takes the default route."""
    from opentelemetry_collector_components_spark.operators.route import (
        cardinality_decisions,
        with_cardinality_route,
    )

    prior = spark.createDataFrame(
        [("a", f"m{i % 2}") for i in range(10)], ["tenant", "metric"]
    )
    current = spark.createDataFrame(
        # tenant a: 8 distinct metrics NOW, but decision says low-card
        [("a", f"m{i}") for i in range(8)] + [("new", "m0")],
        ["tenant", "metric"],
    )
    dec = cardinality_decisions(prior, ["tenant"], "metric", [4], exact=True)
    routed = with_cardinality_route(
        current, ["tenant"], "metric", [4], decisions=dec
    )
    got = {r["tenant"]: r["route"] for r in routed.select("tenant", "route").distinct().collect()}
    assert got["a"] == "0_4"        # lagged: prior batch saw only 2
    assert got["new"] == "default"  # never observed -> default
