"""run_jobs orchestration: per-job summaries, fail-fast abort, sink
hand-off (EP1, pipeline/runner.py:180-222)."""

from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.plans.jobspec import JobSpec, run_jobs


def _feed(spark, n=5):
    return spark.range(n).select(
        F.concat(F.lit("M"), F.col("id")).alias("material"),
        F.lit("100.5").alias("raw_value"),
        F.lit("2024-01-15").alias("snap_date"),
    )


def _spec(name):
    return JobSpec(
        name=name,
        rename_map={"material": "material"},
        constants={
            "source": name,
            "bu": "BU1",
            "sales_organization": "S1",
            "country": "US",
            "attribute": "Jan 2024",
        },
        value_col="raw_value",
        clean_value=True,
        snapshot_expr=F.trunc(F.to_date("snap_date"), "month"),
    )


def test_run_jobs_summary_and_sink(spark):
    feeds = {"a": _feed(spark), "b": _feed(spark, 3)}
    results = run_jobs(feeds, [_spec("a"), _spec("b")])
    assert [(r.name, r.ok, r.rows) for r in results] == [("a", True, 5), ("b", True, 3)]

    written = {}
    results = run_jobs(
        feeds, [_spec("a")], sink=lambda name, df: written.setdefault(name, df.count())
    )
    assert results[0].ok and written == {"a": 5}


def test_run_jobs_fail_fast(spark):
    feeds = {"good": _feed(spark), "missing_feed": None, "never_run": _feed(spark)}
    bad = _spec("broken")
    bad.name = "broken"  # no feed entry -> KeyError inside the sweep
    results = run_jobs(feeds, [_spec("good"), bad, _spec("never_run")])
    assert [r.name for r in results] == ["good", "broken"]  # aborted at 2nd
    assert results[0].ok and not results[1].ok
    assert "KeyError" in results[1].error

    # fail_fast=False runs the remainder
    results = run_jobs(
        feeds, [_spec("good"), bad, _spec("never_run")], fail_fast=False
    )
    assert [r.ok for r in results] == [True, False, True]
