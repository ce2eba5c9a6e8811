"""Plan hygiene across the whole query registry.

The input_hint's hard rule: NO per-row Python (BatchEvalPython) anywhere —
only Arrow-vectorized exchanges.  Plus spot checks that the plans we rely
on at 100 TB actually materialize: broadcast joins on dimension sides,
pushed filters on selective scans.
"""

import os

import pytest

from opentelemetry_collector_components_spark.queries import SPARK_QUERIES

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_per_row_python_anywhere(spark):
    offenders = []
    for name, fn in sorted(SPARK_QUERIES.items()):
        plan = _plan(fn(spark, SF))
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert offenders == []


def test_broadcast_join_in_enrich_and_q3(spark):
    plan = _plan(SPARK_QUERIES["pipeline_enrich"](spark, SF))
    assert "BroadcastHashJoin" in plan
    plan3 = _plan(SPARK_QUERIES["tpch_q3"](spark, SF))
    assert "BroadcastHashJoin" in plan3


def test_filter_pushdown_q6(spark):
    df = SPARK_QUERIES["tpch_q6"](spark, SF)
    # the selective predicates must reach the parquet scan
    scan = [l for l in _plan(df).splitlines() if "PushedFilters" in l]
    assert scan, "no PushedFilters section in scan"
    assert "l_discount" in scan[0] and "l_quantity" in scan[0]


def test_column_pruning_parse(spark):
    """parse never drags html through the pipeline unless title requested."""
    from opentelemetry_collector_components_spark.operators.parse import parse_pages
    from opentelemetry_collector_components_spark.sources.pages import generate_pages

    plan = _plan(parse_pages(generate_pages(spark, 10)))
    assert "html" not in plan.lower() or "title" not in plan


def test_gate_outputs_driver_hashable(spark):
    """The driver's canonicalizer sorts result rows with pandas and hashes
    stringified cells; top-level array/map/struct columns crash it
    (``TypeError: unhashable type: 'list'``, CORRECTNESS_r01) and DuckDB
    HUGEINT sums render differently from Spark LONG.  Every registered gate
    must therefore emit only atomic columns, and every oracle must emit only
    atomic non-HUGEINT columns."""
    import duckdb
    from pyspark.sql.types import ArrayType, MapType, StructType

    from opentelemetry_collector_components_spark.queries import ORACLE_SQL

    bad_spark = []
    for name, fn in sorted(SPARK_QUERIES.items()):
        for f in fn(spark, SF).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad_spark.append(f"{name}.{f.name}:{f.dataType.simpleString()}")
    assert bad_spark == []

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    bad_oracle = []
    for name, sql in sorted(ORACLE_SQL.items()):
        for col, typ in zip(con.sql(sql).columns, con.sql(sql).types):
            t = str(typ)
            if t.startswith(("HUGEINT", "UHUGEINT")) or "[]" in t or t.startswith(
                ("STRUCT", "MAP", "LIST")
            ):
                bad_oracle.append(f"{name}.{col}:{t}")
    assert bad_oracle == []


def _unpartitioned_windows(df) -> list[str]:
    """Window nodes with an empty partition spec in the optimized plan —
    each one is a move-everything-to-one-task sort at scale."""

    bad = []

    def walk(node):
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            bad.append(node.simpleStringWithNodeId())
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return bad


def test_no_global_window_in_hierarchical_limits(spark):
    """The resource-level first-N rank must be the broadcast-threshold
    top-N form, never a bare Window.orderBy over every distinct identity
    (VERDICT r2 'What's wrong #1')."""
    for name in ("agg_overflow_hierarchical", "agg_overflow_limit"):
        assert _unpartitioned_windows(SPARK_QUERIES[name](spark, SF)) == []


def test_broadcast_in_decontamination(spark):
    # benchmark n-gram set must broadcast: corpus side never shuffles on gram
    plan = _plan(SPARK_QUERIES["decontaminate_ngrams"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_tpch_completion_join_shapes(spark):
    """The round-4 TPC-H completion batch must compile to the scale
    shapes the docstrings claim: semi/anti joins stay joins (no
    correlated re-scans), dims broadcast."""
    plan4 = _plan(SPARK_QUERIES["tpch_q4"](spark, SF))
    assert "LeftSemi" in plan4
    plan16 = _plan(SPARK_QUERIES["tpch_q16"](spark, SF))
    assert "LeftAnti" in plan16 and "BroadcastHashJoin" in plan16
    plan22 = _plan(SPARK_QUERIES["tpch_q22"](spark, SF))
    assert "LeftAnti" in plan22
    plan19 = _plan(SPARK_QUERIES["tpch_q19"](spark, SF))
    assert "BroadcastHashJoin" in plan19
    # q21's EXISTS/NOT-EXISTS pair must collapse into per-order
    # aggregates over ONE reused lineitem-orders subplan: lineitem is
    # scanned exactly twice (the joined branch + its per-order rollup),
    # never once per probe, and at most the fact-fact + agg-join-back
    # pair shuffles (every dim side broadcasts)
    plan21 = _plan(SPARK_QUERIES["tpch_q21"](spark, SF))
    assert plan21.count("lineitem.parquet") == 2
    assert plan21.count("SortMergeJoin") + plan21.count("ShuffledHashJoin") <= 2
    # q20's IN-subquery must be a semi join; q2's correlated MIN must be
    # a decorrelated aggregate join: lineitem read exactly twice (the
    # shared pair-cost relation + its per-part min), not re-scanned per
    # outer row
    plan20 = _plan(SPARK_QUERIES["tpch_q20"](spark, SF))
    assert "LeftSemi" in plan20
    plan2 = _plan(SPARK_QUERIES["tpch_q2"](spark, SF))
    assert "BroadcastHashJoin" in plan2
    assert plan2.count("lineitem.parquet") == 2
    assert plan2.count("SortMergeJoin") + plan2.count("ShuffledHashJoin") <= 2
