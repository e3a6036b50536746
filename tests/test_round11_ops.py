"""Round-11 additions.

1) SQL front door over the reference's signature shapes (VERDICT r10
   item 3): the DAX rollup grand-total flag, the +/-15% QC verdict, and
   the ABC Pareto classifier as PURE ``spark.sql`` text whose identical
   ANSI statement is also the DuckDB oracle. The front door is what's
   under test — view registration + SQL text parsing + Catalyst
   lowering — so each test checks oracle equality AND that the plan is
   the expected one (Expand for rollup, zero Python eval nodes).
"""

from __future__ import annotations

from tests.conftest import assert_matches_oracle


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sql_rollup_matches_oracle_and_uses_expand(spark, sf_dir, oracle_con):
    from machine_learning_with_spark_streaming_spark.operators.sqlfront import (
        _SQL_ROLLUP,
        q_sql_rollup,
    )

    df = q_sql_rollup(spark, sf_dir)
    plan = _plan(df)
    # ROLLUP lowers to one Expand + a single-shuffle hash aggregate, and
    # the GROUPING() flag stays JVM-side.
    assert "Expand" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert_matches_oracle(df, oracle_con, _SQL_ROLLUP)
    rows = df.collect()
    # exactly one grand-total row, flagged
    gt = [r for r in rows if r["is_grand_total"]]
    assert len(gt) == 1
    assert gt[0]["o_orderstatus"] is None and gt[0]["o_orderpriority"] is None


def test_sql_qc_verdict_matches_oracle_and_edge_rules(spark, sf_dir, oracle_con):
    from machine_learning_with_spark_streaming_spark.operators.sqlfront import (
        _SQL_QC,
        q_sql_qc_verdict,
    )

    df = q_sql_qc_verdict(spark, sf_dir)
    assert "BatchEvalPython" not in _plan(df) and "ArrowEvalPython" not in _plan(df)
    assert_matches_oracle(df, oracle_con, _SQL_QC)
    rows = {r["priority"]: r for r in df.collect()}
    # the 0-baseline edge: 5-LOW is removed from the baseline year, so
    # its verdict must be FAIL with NULL pct_diff (qualitycheck.py:175-180)
    low = rows["5-LOW"]
    assert low["qc"] == "FAIL" and low["pct_diff"] is None
    assert low["baseline_value"] == 0.0


def test_sql_abc_matches_dataframe_form(spark, sf_dir, oracle_con):
    """The SQL-text ABC agrees with the DataFrame-form w1_abc_classify
    row for row — same semantics, second surface."""
    from machine_learning_with_spark_streaming_spark.operators.sqlfront import (
        _SQL_ABC,
        q_sql_abc,
    )
    from machine_learning_with_spark_streaming_spark.operators.windows import q_abc

    df = q_sql_abc(spark, sf_dir)
    assert_matches_oracle(df, oracle_con, _SQL_ABC)
    sql_rows = {(r["brand"], r["partkey"]): (r["revenue"], r["abc"]) for r in df.collect()}
    w1_rows = {
        (r["brand"], r["partkey"]): (r["revenue"], r["abc"])
        for r in q_abc(spark, sf_dir).collect()
    }
    assert sql_rows == w1_rows
