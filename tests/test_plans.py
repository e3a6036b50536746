"""Physical-plan assertions: the scale claims (broadcast joins, filter
pushdown, partial aggregation, no cartesian products) hold for the
headline queries — regressions to shuffle joins or full scans fail here.
"""

import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_broadcasts_and_pushes_down(spark, sf_dir):
    plan = _plan(spark, sf_dir, "flagship_demand_rollup")
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual" in plan or (
        "GreaterThanOrEqual(o_orderdate" in plan
    ), "date range must reach the orders scan"
    assert "In(c_mktsegment" in plan, "IN-list must reach the customer scan"


def test_enrichment_join_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j2_enrichment")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "a1_pivot_sum")
    # the lineitem scan must not read all 16 columns
    for line in plan.splitlines():
        if "ReadSchema" in line and "lineitem" not in line:
            assert line.count(",") < 8, f"scan reads too many columns: {line}"


@pytest.mark.parametrize(
    "name", ["flagship_demand_rollup", "w1_abc_classify", "a1_pivot_sum"]
)
def test_no_cartesian_products(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_events_is_distributed_scan_with_pushdown(spark, sf_dir):
    # the ns-parquet fallback must yield a real FileScan (pushdown,
    # pruning), never a driver-embedded LocalRelation
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.schemas import load_table

    ev = load_table(spark, sf_dir, "events")
    assert ev.schema["ts"].dataType.typeName() == "timestamp"  # not _ntz
    plan = (
        ev.filter(F.col("event_type") == "click")
        .select("ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Scan parquet" in plan, plan
    assert "LocalTableScan" not in plan and "LocalRelation" not in plan
    assert "EqualTo(event_type,click)" in plan, "filter must reach the scan"


def test_aggregation_is_partial_then_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "flagship_demand_rollup")
    # partial_sum before the exchange = map-side combine
    assert "partial_sum" in plan, plan
