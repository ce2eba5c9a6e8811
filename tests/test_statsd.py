"""StatsD decode + flush: grammar, per-type semantics, invalid rows."""

import pytest

from opentelemetry_collector_components_spark.sources.statsd import (
    decode_statsd,
    generate_statsd_lines,
    statsd_flush,
)


def _lines(spark, rows):
    return spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(rows)], "seq long, line string"
    )


def test_decode_grammar(spark):
    out = decode_statsd(
        _lines(
            spark,
            [
                "app.hits:3|c",
                "app.hits:1|c|@0.25",
                "mem.used:512|g|#env:prod,region:r1",
                "mem.used:+5|g",
                "mem.used:-2|g",
                "lat.view:655|ms|@0.5|#env:dev",
                "users.active:u42|s",
                "not a statsd line",
                "bad::|q",
            ],
        )
    ).toPandas()
    assert out["valid"].tolist() == [True] * 7 + [False, False]
    assert out["mtype"].tolist()[:7] == ["c", "c", "g", "g", "g", "ms", "s"]
    assert out["value"].tolist()[:3] == [3.0, 1.0, 512.0]
    assert out["value"][3] == 5.0 and out["value"][4] == -2.0
    assert out["is_delta"].tolist()[:5] == [False, False, False, True, True]
    assert out["sample_rate"][1] == 0.25 and out["sample_rate"][5] == 0.5
    assert out["sample_rate"][0] is None or out["sample_rate"].isna()[0]
    assert out["tags"][2] == {"env": "prod", "region": "r1"}
    assert out["tags"][5] == {"env": "dev"}
    assert out["value"].isna()[6]  # set value is not numeric
    assert out["name"].isna()[7] and out["name"].isna()[8]


def test_flush_counter_rate_correction_and_moments(spark):
    dec = decode_statsd(
        _lines(spark, ["c.a:3|c", "c.a:2|c|@0.5", "t.a:10|ms", "t.a:30|ms"])
    )
    out = (
        statsd_flush(dec, order_col="seq")
        .toPandas()
        .set_index("name")
        .to_dict("index")
    )
    assert out["c.a"]["flushed_milli"] == (3 + 2 / 0.5) * 1000
    assert out["t.a"]["flushed_milli"] == 40000
    assert out["t.a"]["lo_milli"] == 10000 and out["t.a"]["hi_milli"] == 30000
    assert out["t.a"]["n"] == 2


def test_flush_gauge_fold_and_set_distinct(spark):
    dec = decode_statsd(
        _lines(
            spark,
            [
                "g.a:+5|g",  # delta before any absolute: counts from 0
                "g.a:100|g",  # absolute resets
                "g.a:+7|g",
                "g.a:-2|g",
                "g.b:+3|g",  # never an absolute: folds from 0
                "s.a:u1|s",
                "s.a:u1|s",
                "s.a:u2|s",
            ],
        )
    )
    out = (
        statsd_flush(dec, order_col="seq")
        .toPandas()
        .set_index("name")
        .to_dict("index")
    )
    assert out["g.a"]["flushed_milli"] == 105000  # 100 + 7 - 2, pre-anchor +5 dropped
    assert out["g.b"]["flushed_milli"] == 3000
    assert out["s.a"]["flushed_milli"] == 2000 and out["s.a"]["n"] == 3


def test_flush_gauge_requires_order(spark):
    dec = decode_statsd(_lines(spark, ["g.a:1|g"]))
    with pytest.raises(ValueError):
        statsd_flush(dec)
    # no gauges -> order-free flush is fine
    assert statsd_flush(decode_statsd(_lines(spark, ["c.a:1|c"]))).count() == 1


def test_generator_surface(spark):
    from opentelemetry_collector_components_spark.queries import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    dec = decode_statsd(generate_statsd_lines(ev)).cache()
    n = ev.count()
    assert dec.count() == n
    bad = dec.where(~dec.valid).count()
    assert bad == dec.where((dec.seq % 97) == 0).count() and bad > 0
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    dec.unpersist()


def test_review_regression_empty_value_invalid(spark):
    out = decode_statsd(_lines(spark, ["app.hits:|c", "app.hits:3|c"])).toPandas()
    assert out["valid"].tolist() == [False, True]
