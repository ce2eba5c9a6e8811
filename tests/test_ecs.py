"""ECS translation tables (E6 full) — rename classes, truncation, label-key
sanitization, existing-label suffix handling, host.ip derivation
(ecs_translation.go:1-552, client_address.go:29-45)."""

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.ecs import (
    ECS_KEYWORD_MAX_LENGTH,
    ECS_LOG_PRESERVED,
    ECS_METRIC_PRESERVED,
    ECS_RESOURCE_PRESERVED,
    ECS_RESOURCE_PRESERVED_TRUNCATED,
    ECS_SPAN_PRESERVED,
    remap_log_attrs_to_ecs,
    remap_metric_attrs_to_ecs,
    remap_resource_attrs_to_ecs,
    remap_span_attrs_to_ecs,
    set_host_ip,
)


def _attrs_df(spark, attrs, col="attributes"):
    return spark.createDataFrame([(1, attrs)], f"id INT, {col} MAP<STRING,STRING>")


def test_span_mode_preserves_and_moves(spark):
    out = remap_span_attrs_to_ecs(
        _attrs_df(spark, {
            "http.request.method": "GET",
            "db.system": "mysql",
            "session.id": "s1",
            "my.custom*attr\"x": "val",
        })
    ).first()["attributes"]
    assert out["http.request.method"] == "GET"
    assert out["db.system"] == "mysql"
    assert out["session.id"] == "s1"
    assert out["labels.my_custom_attr_x"] == "val"
    assert len(out) == 4


def test_truncation_rules(spark):
    long = "x" * 2000
    # moved values always truncate
    moved = remap_span_attrs_to_ecs(_attrs_df(spark, {"custom": long})).first()["attributes"]
    assert len(moved["labels.custom"]) == ECS_KEYWORD_MAX_LENGTH
    # resource preserved-verbatim keys do NOT truncate; preserved-truncated do
    res = remap_resource_attrs_to_ecs(
        _attrs_df(spark, {"user_agent.original": long, "host.name": long},
                  col="resource_attributes")
    ).first()["resource_attributes"]
    assert len(res["user_agent.original"]) == 2000
    assert len(res["host.name"]) == ECS_KEYWORD_MAX_LENGTH


def test_resource_default_service_name(spark):
    res = remap_resource_attrs_to_ecs(
        _attrs_df(spark, {"host.name": "h"}, col="resource_attributes")
    ).first()["resource_attributes"]
    assert res["service.name"] == "unknown"
    # present name is untouched
    res2 = remap_resource_attrs_to_ecs(
        _attrs_df(spark, {"service.name": "svc"}, col="resource_attributes")
    ).first()["resource_attributes"]
    assert res2["service.name"] == "svc"


def test_existing_label_suffix_sanitize_modes(spark):
    df = _attrs_df(spark, {"labels.a.b": "v"}, col="resource_attributes")
    intake = remap_resource_attrs_to_ecs(df, sanitize_existing_labels=True).first()
    assert "labels.a_b" in intake["resource_attributes"]
    otel = remap_resource_attrs_to_ecs(df, sanitize_existing_labels=False).first()
    assert "labels.labels_a_b" in otel["resource_attributes"]


def test_numeric_attrs_move_to_numeric_labels(spark):
    df = spark.createDataFrame(
        [(1, {"event.outcome": "success"}, {"retry.count": 3.0, "server.port": 443.0})],
        "id INT, attributes MAP<STRING,STRING>, nattrs MAP<STRING,DOUBLE>",
    )
    out = remap_span_attrs_to_ecs(df, numeric_attrs_col="nattrs").first()
    assert out["nattrs"]["numeric_labels.retry_count"] == 3.0
    assert out["nattrs"]["server.port"] == 443.0  # span-preserved key stays


def test_log_and_metric_modes(spark):
    lg = remap_log_attrs_to_ecs(
        _attrs_df(spark, {"event.name": "n", "whatever": "v"})
    ).first()["attributes"]
    assert lg["event.name"] == "n" and lg["labels.whatever"] == "v"
    mt = remap_metric_attrs_to_ecs(
        _attrs_df(spark, {"system.process.state": "R", "user.name": "x" * 2000,
                          "foo.bar": "v"})
    ).first()["attributes"]
    assert mt["system.process.state"] == "R"
    assert len(mt["user.name"]) == ECS_KEYWORD_MAX_LENGTH  # preserved-truncated
    assert mt["labels.foo_bar"] == "v"


def test_set_host_ip_rules(spark):
    df = spark.createDataFrame(
        [
            (1, "1.2.3.4", {"a": "b"}),          # missing -> set
            (2, "1.2.3.4", {"host.ip": ""}),     # empty -> set
            (3, "1.2.3.4", {"host.ip": "9.9.9.9"}),  # present -> keep
            (4, "", {"a": "b"}),                  # empty client addr -> skip
            (5, None, {"a": "b"}),                # no client addr -> skip
        ],
        "id INT, ca STRING, resource_attributes MAP<STRING,STRING>",
    )
    out = {r["id"]: r["resource_attributes"] for r in set_host_ip(df, "ca").collect()}
    assert out[1]["host.ip"] == "1.2.3.4"
    assert out[2]["host.ip"] == "1.2.3.4"
    assert out[3]["host.ip"] == "9.9.9.9"
    assert "host.ip" not in out[4] and "host.ip" not in out[5]


def test_preserved_tables_are_disjoint_and_sane(spark):
    assert not set(ECS_RESOURCE_PRESERVED) & set(ECS_RESOURCE_PRESERVED_TRUNCATED)
    for table in (ECS_SPAN_PRESERVED, ECS_LOG_PRESERVED, ECS_METRIC_PRESERVED,
                  ECS_RESOURCE_PRESERVED, ECS_RESOURCE_PRESERVED_TRUNCATED):
        assert len(table) == len(set(table))


def test_all_jvm_side(spark):
    plan = remap_span_attrs_to_ecs(
        _attrs_df(spark, {"a": "b"})
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_label_key_collision_last_wins(spark):
    """Two attribute keys sanitizing to the same labels.* key must not
    throw DUPLICATED_MAP_KEY; the last entry wins (the reference's PutStr
    overwrite)."""
    from opentelemetry_collector_components_spark.operators.ecs import (
        translate_attrs_to_ecs_labels,
    )

    from pyspark.sql import functions as F

    # map_from_arrays pins entry order (a python dict would round-trip
    # through a java HashMap and lose it)
    df = spark.range(1).select(
        F.map_from_arrays(
            F.array(F.lit("foo.bar"), F.lit("foo*bar")),
            F.array(F.lit("a"), F.lit("b")),
        ).alias("attrs")
    )
    out = translate_attrs_to_ecs_labels(df, "attrs", preserved=[]).first().attrs
    assert list(out.keys()) == ["labels.foo_bar"]
    assert out["labels.foo_bar"] == "b"


def test_label_translate_empty_map(spark):
    from opentelemetry_collector_components_spark.operators.ecs import (
        translate_attrs_to_ecs_labels,
    )

    df = spark.createDataFrame([({},)], "attrs map<string,string>")
    assert translate_attrs_to_ecs_labels(df, "attrs", preserved=[]).first().attrs == {}
