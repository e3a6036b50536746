"""Whole-registry plan audit: scale-killer patterns must not appear in
ANY registered query's physical plan — a permanent regression guard on
the two classes of mistake that silently survive correctness checks:

- ``CartesianProduct``: an unkeyed fact-fact join that still returns
  the right rows at sf0.001 and detonates at 100 TB (the broadcast-
  small-side form plans as BroadcastNestedLoopJoin, which is allowed);
- ``BatchEvalPython``: a row-at-a-time Python UDF in the plan (Arrow
  stages — ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas — are
  the engine's sanctioned Python escape hatches and are allowed).
"""


def test_no_cartesian_or_row_python_anywhere(spark, sf_dir):
    import __spark_entry__ as entry

    offenders: dict[str, str] = {}
    for name, fn in entry.queries().items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BatchEvalPython" in plan:
            offenders[name] = "BatchEvalPython (row-at-a-time UDF)"
    assert not offenders, offenders
