import pytest
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.operators.reshape import MONTH_ABBRS, unpivot_months
from machine_learning_with_spark_streaming_spark.schemas import load_table
from machine_learning_with_spark_streaming_spark.operators.validation import (
    SchemaConformanceError,
    conformance_gate,
    totals_conserved,
)


def test_conformance_gate_passes(spark):
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    assert conformance_gate(df, ["k", "v"]) is df


def test_conformance_gate_raises(spark):
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    with pytest.raises(SchemaConformanceError, match="missing"):
        conformance_gate(df, ["k", "v", "value"])


def test_totals_conserved(spark):
    a = spark.createDataFrame([(1.0,), (2.0,)], ["v"])
    b = spark.createDataFrame([(3.0000001,)], ["v"])
    assert totals_conserved(a, b, "v")
    c = spark.createDataFrame([(3.5,)], ["v"])
    assert not totals_conserved(a, c, "v")


def test_unpivot_conserves_total(spark, sf_dir):
    """Invariant from FIXTURES.md §4: sum(month cols) == sum(Value) after
    unpivot (the reference's V2 conservation check applied to R2)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    wide = (
        li.withColumn("mth", F.date_format("l_shipdate", "MMM"))
        .groupBy("l_partkey")
        .pivot("mth", MONTH_ABBRS)
        .agg(F.sum("l_quantity"))
        .fillna(0.0, subset=MONTH_ABBRS)
    )
    long = unpivot_months(wide, ["l_partkey"], MONTH_ABBRS, "mth", "qty")
    assert totals_conserved(li.select(F.col("l_quantity").alias("v")), long.select(F.col("qty").alias("v")), "v")


def test_new_vs_old_variance_zero_baseline_and_outer_keys(spark):
    from machine_learning_with_spark_streaming_spark.operators.validation import new_vs_old_variance

    new = spark.createDataFrame(
        [("A", 10.0), ("A", 5.0), ("C", 2.0)], ["bu", "value"]
    )
    old = spark.createDataFrame([("A", 10.0), ("B", 4.0)], ["bu", "value"])
    out = {r.bu: r.asDict() for r in new_vs_old_variance(new, old, ["bu"]).collect()}
    assert out["A"]["rc_new"] == 2 and out["A"]["rc_old"] == 1
    assert out["A"]["var_ea"] == 5.0 and out["A"]["var_ea_pct"] == 0.5
    # C: absent from old -> zero baseline -> pct null
    assert out["C"]["rc_old"] == 0 and out["C"]["var_rc_pct"] is None
    assert out["C"]["var_ea_pct"] is None
    # B: absent from new -> negative variance
    assert out["B"]["rc_new"] == 0 and out["B"]["var_rc"] == -1
    assert out["B"]["var_rc_pct"] == -1.0


def test_fy_extraction_precedence(spark):
    from machine_learning_with_spark_streaming_spark.functions.dates import fy_end_year_from_text, fy_label

    rows = [
        (1, "Current month to FY26"),
        (2, "FY2031 plan"),
        (3, "fy 27 lowercase spaced"),
        (4, "year 2029 bare"),
        (5, "FY31 beats bare 2028"),
        (6, "nothing here"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id long, attr string")
    got = {
        r.id: (r.y, r.lbl)
        for r in df.select(
            "id",
            fy_end_year_from_text("attr").alias("y"),
            fy_label(fy_end_year_from_text("attr")).alias("lbl"),
        ).collect()
    }
    assert got[1] == (2026, "FY26")
    assert got[2] == (2031, "FY31")
    assert got[3] == (2027, "FY27")
    assert got[4] == (2029, "FY29")
    assert got[5] == (2031, "FY31")  # FY pattern wins over bare year
    assert got[6] == (None, None)
    assert got[7] == (None, None)


def test_constraint_report_null_counts_as_violation(spark):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.validation import constraint_report

    df = spark.createDataFrame([(1,), (None,), (-3,)], "x int")
    rep = {r.check_name: r for r in constraint_report(
        df, {"x_pos": F.col("x") > 0, "x_not_null": F.col("x").isNotNull()}
    ).collect()}
    # NULL > 0 is NULL -> counts as a violation alongside the false row
    assert rep["x_pos"].n_violations == 2
    assert rep["x_pos"].passed is False
    assert rep["x_not_null"].n_violations == 1
    assert all(r.n_rows == 3 for r in rep.values())


def test_constraint_report_empty_input_passes_vacuously(spark):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.validation import constraint_report

    empty = spark.createDataFrame([], "x int")
    rows = constraint_report(
        empty, {"x_pos": F.col("x") > 0, "o'quoted": F.col("x").isNotNull()}
    ).collect()
    assert len(rows) == 2
    assert all(r.n_rows == 0 and r.n_violations == 0 and r.passed is True for r in rows)
    assert {r.check_name for r in rows} == {"x_pos", "o'quoted"}


def test_constraint_report_empty_dict_raises(spark):
    import pytest as _pytest

    from machine_learning_with_spark_streaming_spark.operators.validation import constraint_report

    with _pytest.raises(ValueError, match="at least one constraint"):
        constraint_report(spark.range(3), {})


def test_observe_metrics_single_pass_gate(spark, sf_dir):
    from machine_learning_with_spark_streaming_spark.operators.validation import (
        observe_metrics,
        observed_gate_metrics,
    )

    docs = load_table(spark, sf_dir, "documents")
    cond = F.col("n_chars") >= 100
    observed, obs = observe_metrics(docs, "gate", observed_gate_metrics(cond))
    kept = observed.filter(cond)
    n_kept = kept.count()  # the ONLY job; metrics ride it
    got = obs.get
    want_rows = docs.count()
    assert got["n_rows"] == want_rows
    assert got["n_pass"] == n_kept
    assert got["n_violations"] == want_rows - n_kept


def test_observe_metrics_null_verdict_counts_as_violation(spark):
    from machine_learning_with_spark_streaming_spark.operators.validation import (
        observe_metrics,
        observed_gate_metrics,
    )

    df = spark.createDataFrame(
        [(1,), (None,), (3,)], "v int"
    )
    observed, obs = observe_metrics(
        df, "nulls", observed_gate_metrics(F.col("v") > 2)
    )
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert (got["n_rows"], got["n_pass"], got["n_violations"]) == (3, 1, 2)


def test_observe_metrics_empty_dict_raises(spark):
    import pytest

    from machine_learning_with_spark_streaming_spark.operators.validation import observe_metrics

    with pytest.raises(ValueError):
        observe_metrics(spark.range(1), "x", {})


def test_column_profile_native_type_minmax(spark):
    from machine_learning_with_spark_streaming_spark.operators.validation import column_profile

    df = spark.createDataFrame(
        [(9.0, "b"), (10.0, None), (2.0, "a")], "v double, s string"
    )
    got = {r["column"]: r for r in column_profile(df, ["v", "s"]).collect()}
    # min/max on the NATIVE type: 2.0 < 10.0 numerically even though
    # "10.0" < "2.0" lexicographically
    assert (got["v"]["min_str"], got["v"]["max_str"]) == ("2.0", "10.0")
    assert got["v"]["n_null"] == 0 and got["v"]["n_distinct"] == 3
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["n_rows"] == 3


def test_column_profile_empty_columns_raises(spark):
    import pytest

    from machine_learning_with_spark_streaming_spark.operators.validation import column_profile

    with pytest.raises(ValueError):
        column_profile(spark.range(1), [])


def test_mad_outlier_report_flags_known_outlier(spark):
    """A group of tight values plus one wild point: exactly that point
    is beyond 3 MAD; an all-identical group has MAD 0 and flags every
    deviation (the known MAD degenerate — callers add an epsilon floor
    when values can be constant)."""
    from machine_learning_with_spark_streaming_spark.operators.validation import mad_outlier_report

    rows = [("a", v) for v in [10.0, 11.0, 9.0, 10.5, 9.5, 100.0]] + [
        ("b", 5.0), ("b", 5.0), ("b", 5.0)
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = {r.grp: r for r in mad_outlier_report(df, "value", "grp").collect()}
    assert out["a"].n_outliers == 1          # only the 100.0
    assert out["a"].median == 10.25
    assert out["b"].n_outliers == 0 and out["b"].mad == 0.0


def test_observe_qc_counts_in_one_pass(spark, sf_dir):
    """The observation must report rows/nulls/sum/violations as a side
    effect of the pipeline's own action — verified against explicitly
    recomputed values, with the metrics available right after ONE
    noop-write action (no second scan issued by the helper)."""
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.validation import observe_qc
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    instrumented, obs = observe_qc(
        li, "qc", "l_quantity", violation=F.col("l_quantity") > 45
    )
    instrumented.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == li.count()
    assert got["n_nulls"] == li.filter(F.col("l_quantity").isNull()).count()
    assert got["n_violations"] == li.filter(F.col("l_quantity") > 45).count()
    assert abs(
        got["value_sum"]
        - li.agg(F.sum("l_quantity")).collect()[0][0]
    ) < 1e-6


def test_observe_qc_streaming_metrics_per_batch(spark, tmp_path):
    """The same observation rides a STREAMING query: per-micro-batch
    counters surface in the progress events' observedMetrics — live QC
    without a second pass over the stream."""
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.validation import observe_qc
    from machine_learning_with_spark_streaming_spark.streaming.examples import stage_ordered_files

    rows_a = [(1, 10.0), (2, None)]
    rows_b = [(3, 250.0), (4, 20.0), (5, 30.0)]
    schema = "id long, value double"
    stage = stage_ordered_files(
        [
            spark.createDataFrame(rows_a, schema),
            spark.createDataFrame(rows_b, schema),
        ],
        str(tmp_path / "stage"),
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    instrumented, _obs = observe_qc(
        stream, "qc_stream", "value", violation=F.col("value") > 100
    )
    seen = []

    def sink(batch_df, batch_id):
        batch_df.write.format("noop").mode("overwrite").save()

    q = (
        instrumented.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    for p in q.recentProgress:
        om = p["observedMetrics"].get("qc_stream") if p["observedMetrics"] else None
        if om is not None:
            seen.append((om["n_rows"], om["n_nulls"], om["n_violations"]))
    assert (2, 1, 0) in seen  # batch A: 2 rows, one NULL, no violation
    assert (3, 0, 1) in seen  # batch B: 3 rows, the 250.0 violation
