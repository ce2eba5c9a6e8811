"""Grok pattern compiler: %{SYNTAX:field:type} -> combined regex -> JVM
regexp_extract struct; RE2-safe library, cycle/cast/duplicate validation."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.functions.grok import (
    GROK_PATTERNS,
    grok_compile,
    grok_extract,
)


def test_compile_binds_fields_in_order_with_types():
    rx, fields = grok_compile(
        r"ts=%{TIMESTAMP_ISO8601:ts}(?: level=%{LOGLEVEL:level})? "
        r"dur=%{NONNEGINT:dur:int} score=%{BASE10NUM:score:float}"
    )
    assert [(f, t) for f, _, t in fields] == [
        ("ts", "string"),
        ("level", "string"),
        ("dur", "long"),
        ("score", "double"),
    ]
    m = re.match(rx, "ts=2024-01-01T00:00:01Z level=WARN dur=42 score=0.5")
    assert [m.group(i) for _, i, _ in fields] == [
        "2024-01-01T00:00:01Z",
        "WARN",
        "42",
        "0.5",
    ]
    # optional group missing -> None
    m2 = re.match(rx, "ts=2024-01-01 00:00:01 dur=7 score=3")
    assert m2.group(fields[1][1]) is None


def test_user_capture_groups_shift_indexes_correctly():
    rx, fields = grok_compile(r"(a|b)=%{INT:v:int}")
    assert fields == [("v", 2, "long")]
    assert re.match(rx, "b=-3").group(2) == "-3"


def test_library_patterns_expand_recursively():
    # NUMBER -> BASE10NUM, IPORHOST -> IPV4|HOSTNAME, EMAIL -> HOSTNAME
    rx, _ = grok_compile(r"%{NUMBER:n} %{IPORHOST:h} %{EMAILADDRESS:e}")
    assert re.match(rx, "3.14 10.0.0.1 a.b@c.example.org")
    # IPV4 octet bounds are enforced (256 is not an IPV4)
    rx4, f4 = grok_compile(r"ip=%{IPV4:ip}")
    assert re.search(rx4, "ip=255.255.255.255")
    assert not re.search(rx4, "ip=256.1.1.1")


def test_validation_errors():
    with pytest.raises(ValueError, match="unknown grok pattern"):
        grok_compile("%{NOPE:x}")
    with pytest.raises(ValueError, match="unsupported grok cast"):
        grok_compile("%{INT:x:str}")
    with pytest.raises(ValueError, match="duplicate grok field"):
        grok_compile("%{INT:x} %{INT:x}")
    with pytest.raises(ValueError, match="cycle"):
        grok_compile("%{A:x}", {"A": "%{B}", "B": "%{A}"})
    with pytest.raises(ValueError, match="may not bind fields"):
        grok_compile("%{A:x}", {"A": "%{INT:inner}"})


def test_every_library_pattern_compiles_re2_safe():
    # each entry must expand to a regex Python re accepts, with no
    # backreferences or lookaround (the RE2-safety contract)
    for name in GROK_PATTERNS:
        rx, _ = grok_compile(f"%{{{name}:x}}")
        re.compile(rx)
        assert "(?=" not in rx and "(?!" not in rx and "(?<" not in rx
        assert not re.search(r"\\[1-9]", rx), name


def test_extract_struct_types_nulls_and_plan(spark):
    df = spark.createDataFrame(
        [
            ("ts=2024-01-01T08:00:00Z level=ERROR dur=120",),
            ("ts=2024-01-02 09:30:00 dur=5",),
            ("not a log line at all",),
        ],
        "line string",
    )
    pat = r"ts=%{TIMESTAMP_ISO8601:ts}(?: level=%{LOGLEVEL:level})? dur=%{NONNEGINT:dur:int}"
    out = df.select(grok_extract(F.col("line"), pat).alias("g")).select("g.*")
    assert dict(out.dtypes) == {"ts": "string", "level": "string", "dur": "bigint"}
    rows = out.collect()
    assert rows[0].ts == "2024-01-01T08:00:00Z" and rows[0].dur == 120
    assert rows[1].level is None and rows[1].dur == 5
    assert rows[2].ts is None and rows[2].dur is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    with pytest.raises(ValueError, match="binds no fields"):
        grok_extract(F.col("line"), "%{INT} only unbound")


def test_pandas_single_pass_matches_jvm_path(spark):
    from opentelemetry_collector_components_spark.functions.grok import (
        grok_extract_pandas,
    )

    pat = (
        r"ts=%{TIMESTAMP_ISO8601:ts}(?: level=%{LOGLEVEL:level})? "
        r"dur=%{NONNEGINT:dur:int} score=%{BASE10NUM:score:float}"
    )
    df = spark.createDataFrame(
        [
            ("ts=2024-01-01T08:00:00Z level=ERROR dur=120 score=0.25",),
            ("ts=2024-01-02 09:30:00 dur=5 score=3",),
            ("garbage",),
        ],
        "line string",
    )
    jvm = df.select(grok_extract(F.col("line"), pat).alias("g")).select("g.*")
    arrow_udf = grok_extract_pandas(pat)
    arrow = df.select(arrow_udf(F.col("line")).alias("g")).select("g.*")
    assert jvm.dtypes == arrow.dtypes
    key = lambda t: tuple((v is None, v) for v in t)
    assert sorted(map(tuple, jvm.collect()), key=key) == sorted(
        map(tuple, arrow.collect()), key=key
    )
    plan = arrow._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
