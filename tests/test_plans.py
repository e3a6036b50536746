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


def test_aggregation_is_partial_then_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "flagship_demand_rollup")
    # partial_sum before the exchange = map-side combine
    assert "partial_sum" in plan, plan
