import pytest
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.operators.reshape import MONTH_ABBRS, unpivot_months
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
