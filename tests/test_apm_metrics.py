"""APM metric synthesis (A11): definitions from elasticapmconnector
config.go:235-545 re-verified on the deterministic spans fixture."""

import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.apm_metrics import (
    enrich_spans,
    event_success,
    exp_bucket_index,
    service_summary,
    span_destination,
    transaction_duration_exphist,
    transaction_duration_summary,
)
from opentelemetry_collector_components_spark.sources.spans import generate_spans


@pytest.fixture(scope="module")
def spans(spark):
    return enrich_spans(generate_spans(spark, 6000)).cache()


def test_enrich_root_and_adjusted(spans):
    roots = spans.filter("transaction_root").count()
    assert roots == 2000  # 1/3 of 6000
    # sampled spans weight 2x (sample_rate 0.5 -> adjusted 2.0)
    w = {r["sample_rate"]: r["ac"] for r in spans.groupBy("sample_rate").agg(F.max("adjusted_count").alias("ac")).collect()}
    assert w[0.5] == 2.0 and w[1.0] == 1.0
    # missing agent_name defaulted
    assert spans.filter("agent_name = 'unknown'").count() > 0
    assert spans.filter("agent_name is null").count() == 0


def test_service_summary_weighting(spark, spans):
    out = service_summary(spans, "60m")
    total = out.agg(F.round(F.sum("docs"), 3)).collect()[0][0]
    expected = spans.agg(F.round(F.sum("adjusted_count"), 3)).collect()[0][0]
    assert total == expected  # weighted doc count conserved


def test_duration_summary_matches_manual(spark, spans):
    out = transaction_duration_summary(spans, "60m")
    row = out.orderBy("window_start", "service", "name").limit(1).collect()[0]
    tx = spans.filter("transaction_root")
    manual = (
        tx.filter(
            (F.date_trunc("hour", "start_ts") == row["window_start"])
            & (F.col("service") == row["service"])
            & (F.col("name") == row["name"])
        )
        .agg(
            F.round(F.sum("adjusted_count"), 6).alias("c"),
            F.round(F.sum(F.col("duration_us") * F.col("adjusted_count")), 4).alias("s"),
        )
        .collect()[0]
    )
    assert row["count"] == manual["c"] and row["sum_us"] == manual["s"]


def test_exp_bucket_index_math(spark):
    # bucket i covers (2^(i*2^-s), 2^((i+1)*2^-s)] at scale s
    df = spark.createDataFrame([(4.0,), (5.0,), (1024.0,)], ["v"])
    idx = df.select(exp_bucket_index(F.col("v"), 0).alias("i")).collect()
    assert [r["i"] for r in idx] == [1, 2, 9]  # 4 -> (2,4], 5 -> (4,8], 1024 -> (512,1024]


def test_exphist_counts_conserved(spark, spans):
    out = transaction_duration_exphist(spans, "60m")
    row = out.limit(1).collect()[0]
    assert abs(sum(row["pos_counts"]) - row["count"]) < 1e-6
    assert len(row["pos_counts"]) >= 1
    # dense array aligns with offset..max
    assert row["pos_counts"][0] > 0 and row["pos_counts"][-1] > 0
    total = out.agg(F.round(F.sum("count"), 3)).collect()[0][0]
    expected = spans.filter("transaction_root and duration_us > 0").agg(
        F.round(F.sum("adjusted_count"), 3)
    ).collect()[0][0]
    assert total == expected


def test_event_success_excludes_unknown(spark, spans):
    out = event_success(spans, "60m")
    totals = out.agg(
        F.round(F.sum("success_count"), 3).alias("s"),
        F.round(F.sum("failure_count"), 3).alias("f"),
        F.round(F.sum("total_count"), 3).alias("t"),
    ).collect()[0]
    assert abs(totals["s"] + totals["f"] - totals["t"]) < 1e-6
    known = spans.filter("transaction_root and outcome in ('success','failure')").agg(
        F.round(F.sum("adjusted_count"), 3)
    ).collect()[0][0]
    assert totals["t"] == known


def test_span_destination_composite(spark, spans):
    out = span_destination(spans, "60m")
    # composite spans contribute composite_count, not 1
    manual_cnt = spans.filter("not transaction_root and destination is not null").agg(
        F.round(
            F.sum(
                F.when(F.col("composite_count").isNotNull(), F.col("composite_count") * F.col("adjusted_count")).otherwise(
                    F.col("adjusted_count")
                )
            ),
            3,
        )
    ).collect()[0][0]
    total = out.agg(F.round(F.sum("count"), 3)).collect()[0][0]
    assert total == manual_cnt


def test_transaction_semantics_cascades(spark):
    """span.go:476-546 edge cases: explicit type wins; messaging before
    rpc/http; rpc grpc-status beats http bucket; empty grpc falls to span
    status; non-standard http code verbatim; outcome Ok beats http>=500."""
    from opentelemetry_collector_components_spark.operators.apm_metrics import (
        enrich_transaction_semantics,
    )

    cols = "type_value string, messaging_system string, rpc_system string, grpc_status string, http_status_code int, span_status string"
    rows = [
        ("custom", "kafka", None, None, None, "Unset"),   # explicit wins
        (None, "kafka", "grpc", "OK", 200, "Unset"),      # messaging before rpc/http
        (None, None, "grpc", "OK", 503, "Unset"),         # rpc beats http bucket; 503 -> failure
        (None, None, "grpc", "", None, "Error"),          # empty grpc -> status
        (None, None, None, None, 605, "Unset"),           # non-standard code verbatim
        (None, None, None, None, 503, "Ok"),              # Ok beats http>=500
        (None, None, None, None, 503, "Unset"),           # http>=500 -> failure
        (None, None, None, None, None, "Unset"),          # all defaults
    ]
    out = enrich_transaction_semantics(spark.createDataFrame(rows, cols)).collect()
    got = [(r["transaction_type"], r["transaction_result"], r["span_outcome"]) for r in out]
    assert got == [
        ("custom", "Success", "success"),
        ("messaging", "OK", "success"),
        ("request", "OK", "failure"),
        ("request", "Error", "failure"),
        ("request", "HTTP 605", "failure"),
        ("request", "HTTP 5xx", "success"),
        ("request", "HTTP 5xx", "failure"),
        ("unknown", "Success", "success"),
    ]


def test_dropped_span_stats_expansion(spark):
    """traces.go:538-581: each DSS entry becomes one zero-duration synthetic
    child span carrying composite sum/count and the parent's sample rate."""
    from opentelemetry_collector_components_spark.operators.apm_metrics import (
        expand_dropped_span_stats,
    )
    from opentelemetry_collector_components_spark.sources.spans import generate_spans

    spans = generate_spans(spark, 60)
    synth = expand_dropped_span_stats(spans).collect()
    carriers = spans.filter(
        "dropped_spans_stats IS NOT NULL AND size(dropped_spans_stats) > 0"
    ).collect()
    assert len(synth) == 2 * len(carriers) and len(carriers) > 0
    by_parent = {c["span_id"]: c for c in carriers}
    for s in synth:
        parent = by_parent[s["parent_span_id"]]
        assert s["start_ts"] == s["end_ts"] == parent["start_ts"]  # zero duration
        assert s["sample_rate"] == parent["sample_rate"]           # weight inherited
        assert s["composite_count"] is not None and s["composite_sum_us"] is not None
        assert s["span_id"].startswith(parent["span_id"] + "-dss-")
        assert s["dropped_spans_stats"] is None                    # no recursion


def test_tvalue_codec_roundtrip(spark):
    """traces.go:908-931: p=1 -> '0'; p=0.5 -> '8' (2^55 trimmed); p<=0 or
    >1 -> ''; decode(encode(p)) ~= p within the 2^-56 grid."""
    from opentelemetry_collector_components_spark.operators.apm_metrics import (
        probability_to_tvalue,
        tvalue_to_probability,
    )

    ps = [1.0, 0.5, 0.25, 0.1, 0.9999, 0.001, 0.0, -0.5, 1.5]
    df = spark.createDataFrame([(p,) for p in ps], ["p"])
    out = df.select(
        "p",
        probability_to_tvalue(F.col("p")).alias("t"),
        tvalue_to_probability(probability_to_tvalue(F.col("p"))).alias("back"),
    ).collect()
    by_p = {r["p"]: r for r in out}
    assert by_p[1.0]["t"] == "0" and by_p[1.0]["back"] == 1.0
    assert by_p[0.5]["t"] == "8"
    assert by_p[0.25]["t"] == "c"
    assert by_p[0.0]["t"] == "" and by_p[0.0]["back"] is None
    assert by_p[1.5]["t"] == ""
    for p in (0.5, 0.25, 0.1, 0.9999, 0.001):
        assert abs(by_p[p]["back"] - p) < 2**-50


def test_attach_metadata_preserves_unreplaced_body_keys(spark):
    """A pre-existing body entry under a mapped NAME must survive on rows
    whose metadata lacks the corresponding source key — the reference only
    PutStr's keys present in metadata (elasticmetadataprocessor
    processor.go:75-85) and never deletes other body entries."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_components_spark.operators.enrich import (
        attach_metadata_to_body,
    )

    rows = [
        # metadata has the source key -> overwrite body entry
        (1, {"tenant_id": "old"}, {"x-tenant": "t42"}),
        # metadata LACKS the source key -> body entry must be preserved
        (2, {"tenant_id": "keepme", "other": "v"}, {"unrelated": "z"}),
        # null body stays null
        (3, None, {"x-tenant": "t1"}),
    ]
    df = spark.createDataFrame(
        rows, "id INT, body MAP<STRING,STRING>, metadata MAP<STRING,STRING>"
    )
    out = {
        r["id"]: r["body"]
        for r in attach_metadata_to_body(df, {"x-tenant": "tenant_id"}).collect()
    }
    assert out[1] == {"tenant_id": "t42"}
    assert out[2] == {"tenant_id": "keepme", "other": "v"}
    assert out[3] is None


def test_span_event_outcome_unknown_passthrough(spark):
    """Intake-set event.outcome == 'unknown' must survive the cascade
    (span.go setEventOutcome early-return)."""
    from opentelemetry_collector_components_spark.operators.apm_metrics import (
        enrich_transaction_semantics,
    )
    from opentelemetry_collector_components_spark.sources.spans import generate_spans

    sp = enrich_transaction_semantics(generate_spans(spark, 200))
    got = {r["outcome"]: set() for r in sp.select("outcome").distinct().collect()}
    for r in sp.select("outcome", "span_outcome").collect():
        got[r["outcome"]].add(r["span_outcome"])
    assert got["unknown"] == {"unknown"}
    # non-unknown intake outcomes still go through the status cascade
    assert "success" in got["success"] or "failure" in got["success"]
