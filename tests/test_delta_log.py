"""Delta log replay: last-writer-wins, time travel, unknown actions."""

from opentelemetry_collector_components_spark.sources.delta_log import (
    generate_delta_log,
    replay_delta_log,
)


def _log(spark, rows):
    return spark.createDataFrame(rows, "version long, line string")


def test_replay_add_remove_readd(spark):
    log = _log(spark, [
        (0, '{"protocol": {"minReaderVersion": 1}}'),
        (0, '{"add": {"path": "a", "size": 10, "stats": "{\\"numRecords\\": 2}"}}'),
        (0, '{"add": {"path": "b", "size": 20, "stats": "{\\"numRecords\\": 4}"}}'),
        (1, '{"remove": {"path": "a", "deletionTimestamp": 5}}'),
        (2, '{"add": {"path": "a", "size": 11, "stats": "{\\"numRecords\\": 3}"}}'),
        (3, '{"commitInfo": {"operation": "OPTIMIZE"}}'),
        (3, '{"whoKnows": {"future": true}}'),  # unknown action ignored
    ])
    snap = {r["path"]: r for r in replay_delta_log(log).collect()}
    assert set(snap) == {"a", "b"}
    assert snap["a"]["size"] == 11 and snap["a"]["num_records"] == 3
    assert snap["a"]["version_added"] == 2
    assert snap["b"]["size"] == 20


def test_time_travel(spark):
    log = _log(spark, [
        (0, '{"add": {"path": "a", "size": 1, "stats": "{\\"numRecords\\": 1}"}}'),
        (1, '{"remove": {"path": "a", "deletionTimestamp": 5}}'),
    ])
    assert replay_delta_log(log, as_of_version=0).count() == 1
    assert replay_delta_log(log).count() == 0


def test_generator_replay_shape(spark):
    from opentelemetry_collector_components_spark.queries import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    log = generate_delta_log(ev, n_files=50)
    snap = replay_delta_log(log).cache()
    originals = snap.where(snap.path.startswith("part-")).count()
    compacts = snap.where(snap.path.startswith("compact-")).count()
    # i in 0..49: 13 multiples of 4 removed+compacted, 37 originals live
    assert originals == 37 and compacts == 13
    total_rows = snap.groupBy().sum("num_records").first()[0]
    assert total_rows == ev.count()
    plan = snap._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    snap.unpersist()


def test_occ_conflicts(spark):
    from opentelemetry_collector_components_spark.sources.delta_log import (
        concurrent_commit_conflicts,
    )

    txns = spark.createDataFrame(
        [
            (1, "remove", "a"), (1, "add", "n1"),
            (2, "remove", "a"), (2, "remove", "b"),
            (3, "remove", "b"),
            (4, "add", "a"),  # append of a path others remove: NOT a conflict
            (5, "add", "z"),
        ],
        "txn_id long, action string, path string",
    )
    got = {(r.txn_a, r.txn_b): r.n_overlap
           for r in concurrent_commit_conflicts(txns).collect()}
    assert got == {(1, 2): 1, (2, 3): 1}


def test_occ_duplicate_removes_not_inflated(spark):
    from opentelemetry_collector_components_spark.sources.delta_log import (
        concurrent_commit_conflicts,
    )

    txns = spark.createDataFrame(
        [(1, "remove", "a"), (1, "remove", "a"),
         (2, "remove", "a"), (2, "remove", "a")],
        "txn_id long, action string, path string",
    )
    got = concurrent_commit_conflicts(txns).collect()
    assert [(r.txn_a, r.txn_b, r.n_overlap) for r in got] == [(1, 2, 1)]
