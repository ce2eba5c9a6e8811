"""CIDR longest-prefix enrich: IPv4 parsing, dim-side flatten to disjoint
intervals, single-match bucketed lookup, brute-force parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_components_spark.operators.iplookup import (
    cidr_bounds,
    flatten_prefixes,
    ip_enrich,
    ipv4_to_long,
)


def test_ipv4_to_long_valid_and_malformed(spark):
    cases = [
        ("0.0.0.0", 0),
        ("1.2.3.4", 16909060),
        ("255.255.255.255", 4294967295),
        ("10.0.0.1", 167772161),
        ("256.1.1.1", None),  # octet out of range
        ("1.2.3", None),  # too few octets
        ("1.2.3.4.5", None),  # too many
        ("a.b.c.d", None),
        ("", None),
        (None, None),
    ]
    df = spark.createDataFrame([(ip,) for ip, _ in cases], "ip string")
    got = df.select(ipv4_to_long(F.col("ip")).alias("n")).collect()
    assert [r.n for r in got] == [want for _, want in cases]


def test_cidr_bounds_alignment(spark):
    df = spark.createDataFrame(
        [(16909060, 16), (16909060, 32), (0, 0)], "net long, plen int"
    )
    lo, hi = cidr_bounds(F.col("net"), F.col("plen"))
    rows = df.select(lo.alias("lo"), hi.alias("hi")).collect()
    # 1.2.3.4/16 -> aligned down to 1.2.0.0
    assert (rows[0].lo, rows[0].hi) == (16908288, 16973824)
    assert (rows[1].lo, rows[1].hi) == (16909060, 16909061)
    assert (rows[2].lo, rows[2].hi) == (0, 4294967296)


def _dims(spark):
    # /0 fallback, /8, two /16s (one inside the /8), /24 inside a /16
    rows = [
        (0, 0, "world"),
        (10 << 24, 8, "ten"),
        ((10 << 24) | (5 << 16), 16, "ten-five"),
        ((192 << 24) | (168 << 16), 16, "private"),
        ((10 << 24) | (5 << 16) | (9 << 8), 24, "ten-five-nine"),
    ]
    return spark.createDataFrame(rows, "net long, prefix_len int, geo string")


def test_flatten_is_disjoint_and_longest_wins(spark):
    flat = flatten_prefixes(_dims(spark), ["geo"]).orderBy("lo").collect()
    # disjoint and ordered: each hi == next lo (full cover here: /0 present)
    for a, b in zip(flat, flat[1:]):
        assert a.hi == b.lo
    assert flat[0].lo == 0 and flat[-1].hi == 1 << 32
    # segment containing 10.5.9.x claims the /24
    seg = [s for s in flat if s.lo <= ((10 << 24) | (5 << 16) | (9 << 8)) < s.hi]
    assert seg[0].geo == "ten-five-nine" and seg[0].prefix_len == 24
    # duplicate dim rows for the same block collapse to one winner
    dup = _dims(spark).unionByName(_dims(spark))
    flat2 = flatten_prefixes(dup, ["geo"]).orderBy("lo").collect()
    assert [tuple(r) for r in flat2] == [tuple(r) for r in flat]


def test_flatten_drops_uncovered_gaps(spark):
    dims = spark.createDataFrame(
        [((10 << 24), 8, "ten"), ((99 << 24), 8, "nn")],
        "net long, prefix_len int, geo string",
    )
    flat = flatten_prefixes(dims, ["geo"]).orderBy("lo").collect()
    assert len(flat) == 2  # the gap between them produces no segment
    assert flat[0].hi <= flat[1].lo


def test_enrich_matches_brute_force_longest_prefix(spark):
    dims = _dims(spark)
    facts = spark.createDataFrame(
        [
            (i, f"{a}.{b}.{c}.{d}")
            for i, (a, b, c, d) in enumerate(
                (x * 37 % 256, x * 91 % 256, x * 53 % 256, x * 17 % 256)
                for x in range(200)
            )
        ]
        + [(900, "10.5.9.200"), (901, "10.5.1.1"), (902, "bad.ip")],
        "id long, ip string",
    )
    flat = flatten_prefixes(dims, ["geo"])
    got = {
        r.id: (r.prefix_len, r.geo)
        for r in ip_enrich(facts, "ip", flat, ["geo"]).collect()
    }
    assert len(got) == facts.count()  # exactly one output row per fact
    # brute force: max prefix among containing blocks
    blocks = [
        (r.lo, r.hi, r.plen, r.geo)
        for r in dims.select(
            cidr_bounds(F.col("net"), F.col("prefix_len"))[0].alias("lo"),
            cidr_bounds(F.col("net"), F.col("prefix_len"))[1].alias("hi"),
            F.col("prefix_len").alias("plen"),
            "geo",
        ).collect()
    ]
    for r in facts.collect():
        parts = r.ip.split(".")
        try:
            ipl = sum(int(p) << (8 * (3 - i)) for i, p in enumerate(parts))
            if len(parts) != 4 or any(not 0 <= int(p) <= 255 for p in parts):
                ipl = None
        except ValueError:
            ipl = None
        if ipl is None:
            assert got[r.id] == (None, None)
        else:
            want = max((b for b in blocks if b[0] <= ipl < b[1]), key=lambda b: b[2])
            assert got[r.id] == (want[2], want[3]), r.ip


def test_enrich_plan_is_jvm_only(spark):
    flat = flatten_prefixes(_dims(spark), ["geo"])
    facts = spark.createDataFrame([(1, "10.5.9.7")], "id long, ip string")
    plan = (
        ip_enrich(facts, "ip", flat, ["geo"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_enrich_broadcasts_the_dim_and_never_shuffles_facts(spark):
    flat = flatten_prefixes(_dims(spark), ["geo"])
    facts = spark.createDataFrame([(1, "10.5.9.7")], "id long, ip string")
    plan = (
        ip_enrich(facts, "ip", flat, ["geo"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
