"""Behavioral bot detection: crafted clients hit exactly the intended
flags; exact-integer thresholds; no window in the plan."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.botdetect import (
    client_features,
    score_bots,
)

T0 = datetime(2024, 3, 1, 12, 0, 0)


def _logs(spark):
    rows = []

    def add(client, dt_s, path, status=200, agent="Mozilla/5.0"):
        rows.append((client, T0 + timedelta(seconds=dt_s), path, status, agent))

    # metronome: 2 requests every minute for 10 minutes, same path
    for i in range(20):
        add("metronome", i * 30, "/feed")
    # burst: 100 requests in 30 seconds, varied paths
    for i in range(100):
        add("burst", i * 0.3, f"/page/{i}")
    # human: 6 requests, irregular gaps, diverse paths
    for i, gap in enumerate([0, 47, 200, 1100, 1900, 3500]):
        add("human", gap, f"/article/{i}")
    # declared: 3 requests with a crawler UA + robots probe
    add("declared", 0, "/robots.txt", agent="SearchBot/2.1")
    add("declared", 90, "/a", agent="SearchBot/2.1")
    add("declared", 200, "/b", agent="SearchBot/2.1")
    # errorhammer: hammers one missing path
    for i in range(12):
        add("errorhammer", i * 400, "/gone", status=404)
    return spark.createDataFrame(
        rows, "client string, ts timestamp, path string, status int, agent string"
    )


def _scored(spark):
    return {
        r.client: r for r in score_bots(client_features(_logs(spark))).collect()
    }


def test_feature_values_exact(spark):
    s = _scored(spark)
    m = s["metronome"]
    assert (m.n_requests, m.distinct_paths, m.span_s) == (20, 1, 570)
    assert (m.minutes_active, m.minute_sumsq) == (10, 40)  # 2 per minute
    h = s["human"]
    assert h.distinct_paths == 6 and not h.ua_bot and h.robots_probes == 0


def test_flags_hit_the_intended_clients(spark):
    s = _scored(spark)
    assert s["metronome"].regular_cadence and s["metronome"].high_repeat
    assert not s["metronome"].high_rate  # 20 req over 9.5 min
    assert s["burst"].high_rate and not s["burst"].high_repeat
    assert s["declared"].ua_bot and s["declared"].robots_probe
    assert s["errorhammer"].high_error and s["errorhammer"].high_repeat
    h = s["human"]
    assert not any(
        [h.high_rate, h.high_repeat, h.regular_cadence, h.high_error, h.ua_bot]
    )


def test_verdicts(spark):
    s = _scored(spark)
    assert s["declared"].is_bot  # 3 (ua) + 2 (robots) + path flags
    assert not s["human"].is_bot and s["human"].bot_score == 0
    # burst: high_rate(2) alone isn't enough without corroboration
    assert s["burst"].bot_score >= 2
    # custom threshold
    strict = {
        r.client: r.is_bot
        for r in score_bots(
            client_features(_logs(spark)), bot_threshold=1
        ).collect()
    }
    assert strict["burst"] and not strict["human"]


def test_cadence_needs_three_minutes(spark):
    # 2 requests in one minute: CV undefined, must not flag
    rows = [("x", T0, "/a", 200, "m"), ("x", T0 + timedelta(seconds=5), "/a", 200, "m")]
    df = spark.createDataFrame(
        rows, "client string, ts timestamp, path string, status int, agent string"
    )
    r = score_bots(client_features(df)).collect()[0]
    assert not r.regular_cadence


def test_plan_has_no_window_and_no_python(spark):
    plan = (
        score_bots(client_features(_logs(spark)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan  # mega-bot clients never serialize a sort
