"""Semconv span-attribute capture set (E1 full, span.go:152-295)."""

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.semconv import (
    capture_span_semconv,
    grpc_code_name,
)


def _cap(spark, attrs):
    df = spark.createDataFrame([(1, attrs)], "id INT, attributes MAP<STRING,STRING>")
    return capture_span_semconv(df).first()


def test_guarded_deprecation_priorities(spark):
    # server.address wins over deprecated net.peer.name/peer.hostname
    r = _cap(spark, {"server.address": "sa", "net.peer.name": "npn", "peer.hostname": "ph"})
    assert r["server_address"] == "sa"
    r2 = _cap(spark, {"net.peer.name": "npn", "peer.hostname": "ph"})
    assert r2["server_address"] == "npn"
    # user_agent.original wins over deprecated http.user_agent
    r3 = _cap(spark, {"user_agent.original": "new", "http.user_agent": "old"})
    assert r3["user_agent_original"] == "new"
    assert _cap(spark, {"http.user_agent": "old"})["user_agent_original"] == "old"
    # server.port guard
    r4 = _cap(spark, {"server.port": "443", "net.peer.port": "80"})
    assert r4["server_port"] == 443


def test_grpc_code_names(spark):
    df = spark.range(20).select(grpc_code_name(F.col("id")).alias("n"))
    names = [r["n"] for r in df.collect()]
    assert names[0] == "OK" and names[1] == "Canceled"
    assert names[3] == "InvalidArgument" and names[16] == "Unauthenticated"
    assert names[17] == "Code(17)" and names[19] == "Code(19)"
    r = _cap(spark, {"rpc.grpc.status_code": "5"})
    assert r["grpc_status"] == "NotFound" and r["is_rpc"] is True
    # string form via rpc.response.status_code
    assert _cap(spark, {"rpc.response.status_code": "ERR"})["grpc_status"] == "ERR"


def test_db_capture_and_sql_fallback(spark):
    r = _cap(spark, {"db.type": "mysql", "db.instance": "main"})
    assert r["db_system"] == "mysql" and r["db_name"] == "main" and r["is_db"] is True
    # sql.query implies db_system='sql' only when no explicit system
    assert _cap(spark, {"sql.query": "SELECT 1"})["db_system"] == "sql"
    assert _cap(spark, {"sql.query": "SELECT 1", "db.system": "pg"})["db_system"] == "pg"


def test_messaging_and_flags(spark):
    r = _cap(spark, {"message_bus.destination": "q1", "messaging.temp_destination": "true"})
    assert r["messaging_destination_name"] == "q1"
    assert r["messaging_destination_temp"] is True
    assert r["is_messaging"] is True and r["is_http"] is False
    r2 = _cap(spark, {"http.flavor": "1.1"})
    assert r2["is_http"] is True and r2["is_messaging"] is False
    r3 = _cap(spark, {"gen_ai.provider.name": "prov"})
    assert r3["gen_ai_system"] == "prov" and r3["is_genai"] is True


def test_url_and_misc_variants(spark):
    r = _cap(spark, {"http.url": "http://h/x", "url.port": "8080",
                     "peer.service": "ps", "type": "custom",
                     "transaction.type": "request", "rpc.method": "M"})
    assert r["url_full"] == "http://h/x" and r["url_port"] == 8080
    assert r["peer_service"] == "ps"
    assert r["type_value"] == "custom" and r["transaction_type"] == "request"
    assert r["rpc_service"] == "M"  # rpc.method lands in rpcService (span.go:256)


def test_all_jvm_side(spark):
    df = spark.createDataFrame([(1, {"a": "b"})], "id INT, attributes MAP<STRING,STRING>")
    plan = capture_span_semconv(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
