"""Punycode / IDN: RFC 3492 sample vectors, stdlib cross-check, Spark UDF."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.functions.punycode import (
    idn_decode_host,
    idn_encode_host,
    punycode_decode,
    punycode_encode,
)

# RFC 3492 §7.1 sample strings (A Arabic, B Chinese, L Japanese mixed-case
# handled lowercase-only here) + common-knowledge city labels
VECTORS = [
    ("münchen", "mnchen-3ya"),
    ("köln", "kln-sna"),
    ("россия", "h1alffa9f"),
    ("日本語", "wgv71a119e"),  # RFC 3492 §7.1 (L), lowercase form
    ("café", "caf-dma"),
    ("bücher", "bcher-kva"),
    ("", ""),
    ("abc", "abc-"),
]


@pytest.mark.parametrize("plain,puny", VECTORS)
def test_rfc_vectors_roundtrip(plain, puny):
    assert punycode_encode(plain) == puny
    assert punycode_decode(puny) == plain


def test_stdlib_crosscheck():
    words = ["münchen", "ärger", "ñandú", "þorn", "中文网", "ελλάδα", "עברית"]
    for w in words:
        enc = punycode_encode(w)
        assert enc == w.encode("punycode").decode("ascii")
        assert punycode_decode(enc) == w


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        punycode_decode("kln-sn!")  # illegal digit
    with pytest.raises(ValueError):
        punycode_decode("kln-s")  # truncated integer
    with pytest.raises(ValueError):
        punycode_decode("ü-abc")  # non-basic before delimiter


def test_idn_host_helpers():
    assert idn_decode_host("XN--MNCHEN-3YA.Example.COM") == "münchen.example.com"
    assert idn_encode_host("MÜNCHEN.example.com") == "xn--mnchen-3ya.example.com"
    # malformed labels survive verbatim
    assert idn_decode_host("xn--!!!.example.com") == "xn--!!!.example.com"
    assert idn_decode_host("plain.example.com") == "plain.example.com"


def test_spark_with_idn_host(spark):
    from opentelemetry_collector_components_spark.operators.urls import with_idn_host

    df = spark.createDataFrame(
        [
            ("xn--mnchen-3ya.example.com",),
            ("xn--wgv71a119e.example.org",),
            ("plain.example.net",),
            (None,),
        ],
        ["host"],
    )
    got = {r["host"]: r["host_unicode"] for r in with_idn_host(df).collect()}
    assert got["xn--mnchen-3ya.example.com"] == "münchen.example.com"
    assert got["xn--wgv71a119e.example.org"] == "日本語.example.org"
    assert got["plain.example.net"] == "plain.example.net"
    assert got[None] is None
    plan = with_idn_host(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_surrogate_code_points_rejected_and_kept_verbatim():
    # 'ib9b' decodes to a lone surrogate under a naive decoder; ours must
    # raise so the host helper keeps the label verbatim (Arrow/UTF-8 would
    # reject the string and kill the task otherwise)
    with pytest.raises(ValueError):
        punycode_decode("ib9b")
    assert idn_decode_host("xn--ib9b.example.com") == "xn--ib9b.example.com"
