"""Session path mining: ordered prefixes, tiebreak determinism,
truncation, top-N total order."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest


def test_paths_ordered_truncated_and_counted(spark):
    from opentelemetry_collector_components_spark.operators.analytics import (
        session_paths,
        top_paths,
    )

    t0 = datetime(2024, 6, 1, 12, 0, 0)
    rows = []
    # session 0 of u1: view > click > purchase > view > click (5 steps)
    for i, s in enumerate(["view", "click", "purchase", "view", "click"]):
        rows.append(("u1", 0, t0 + timedelta(minutes=i), i, s))
    # session 1 of u1 and session 0 of u2: both view > click
    for u, sid in (("u1", 1), ("u2", 0)):
        rows.append((u, sid, t0, 100, "view"))
        rows.append((u, sid, t0 + timedelta(minutes=1), 101, "click"))
    # tie on ts inside u3: event_id must break it (7 before 9)
    rows.append(("u3", 0, t0, 9, "b"))
    rows.append(("u3", 0, t0, 7, "a"))
    df = spark.createDataFrame(
        rows, "u string, sid long, ts timestamp, eid long, step string"
    )
    per = session_paths(df, ["u"], "sid", "ts", "step", "eid", max_steps=3)
    got = {(r.u, r.sid): (r.path, r.steps) for r in per.collect()}
    assert got[("u1", 0)] == ("view>click>purchase", 5)  # truncated at 3
    assert got[("u1", 1)] == ("view>click", 2)
    assert got[("u2", 0)] == ("view>click", 2)
    assert got[("u3", 0)] == ("a>b", 2)

    top = top_paths(per, n=2).collect()
    assert [(r.path, r.n) for r in top] == [("view>click", 2), ("a>b", 1)]
    # ('a>b' sorts before 'view>click>purchase' at the tied count)

    with pytest.raises(ValueError):
        session_paths(df, ["u"], "sid", "ts", "step", "eid", max_steps=0)
