"""Registered parity queries for the scalar-function toolkit (F1-F10).

Each query manufactures "dirty" inputs deterministically from clean
testdata columns, pushes them through the engine's cleaning expressions,
and proves round-trip equivalence against an independent SQL derivation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.functions.cleaning import clean_numeric
from machine_learning_with_spark_streaming_spark.functions.dates import (
    fiscal_month_sort,
    fiscal_year,
    parse_date_multi,
)
from machine_learning_with_spark_streaming_spark.functions.keys import build_key, material_key
from machine_learning_with_spark_streaming_spark.functions.nulls import blank_to_sentinel, literals_to_null
from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table

_F1_ORACLE = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END), 2)
         AS cleaned_qty
FROM lineitem
GROUP BY 1 ORDER BY 1
"""


@register("f1_clean_numeric_roundtrip", oracle=_F1_ORACLE)
def q_clean_numeric(spark, sf_dir):
    """F1: locale-dirty string -> double. Quantities are rendered as
    ``$ 12 `` / ``($ 12 )`` accounting strings, then cleaned back
    (myConversionsClass.py:64-95); totals must round-trip exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_int = F.col("l_quantity").cast("int").cast("string")
    dirty = F.when(
        F.col("l_returnflag") == "R", F.concat(F.lit("($ "), qty_int, F.lit(" )"))
    ).otherwise(F.concat(F.lit("$ "), qty_int, F.lit(" ")))
    return (
        li.withColumn("dirty", dirty)
        .withColumn("cleaned", clean_numeric("dirty"))
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("cleaned"), 2).alias("cleaned_qty"))
        .orderBy("l_returnflag")
    )


_F2_ORACLE = """
SELECT 'SKU-' || CAST(p_partkey AS VARCHAR) AS material_key,
       p_brand || '|' || CAST(p_partkey AS VARCHAR) AS composite_key
FROM part
ORDER BY p_partkey
"""


@register("f2_key_builders", oracle=_F2_ORACLE)
def q_key_builders(spark, sf_dir):
    """F2: composite/material key builders (myDFClass.py:128-159)."""
    part = load_table(spark, sf_dir, "part")
    return part.orderBy("p_partkey").select(
        material_key("p_partkey").alias("material_key"),
        build_key("p_brand", "p_partkey").alias("composite_key"),
    )


_F4_ORACLE = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY 1 ORDER BY 1
"""


@register("f4_multiformat_date_parse", oracle=_F4_ORACLE)
def q_multiformat_dates(spark, sf_dir):
    """F4: multi-format date parsing (pipeline/lib.py:107-146). Each order
    date is rendered in one of three text formats by key, then the
    coalesce-of-try_to_date chain recovers the month."""
    orders = load_table(spark, sf_dir, "orders")
    rendered = (
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format("o_orderdate", "MMM yyyy"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format("o_orderdate", "yyyyMM"))
        .otherwise(F.date_format("o_orderdate", "M/yyyy"))
    )
    return (
        orders.withColumn("attr_text", rendered)
        .withColumn("order_month", parse_date_multi("attr_text", ["MMM yyyy", "yyyyMM", "M/yyyy"]))
        .groupBy("order_month")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("order_month")
    )


_F5_ORACLE = """
SELECT CAST(CASE WHEN month(o_orderdate) >= 10 THEN year(o_orderdate) + 1
            ELSE year(o_orderdate) END AS INT) AS fy,
       CAST((month(o_orderdate) - 10 + 12) % 12 + 1 AS INT) AS fy_month_sort,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("f5_fiscal_calendar", oracle=_F5_ORACLE)
def q_fiscal_calendar(spark, sf_dir):
    """F5: Oct-start fiscal year + in-FY month position
    (myConversionsClass.py:685-709)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            fiscal_year("o_orderdate").alias("fy"),
            fiscal_month_sort("o_orderdate").alias("fy_month_sort"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("fy", "fy_month_sort")
    )


_F6_ORACLE = """
SELECT CASE WHEN c_mktsegment IN ('BUILDING', 'nan') OR trim(c_mktsegment) = ''
            THEN 'Blank' ELSE c_mktsegment END AS segment,
       CAST(count(*) AS BIGINT) AS n_customers
FROM customer
GROUP BY 1 ORDER BY 1
"""


@register("f6_null_sentinels", oracle=_F6_ORACLE)
def q_null_sentinels(spark, sf_dir):
    """F6: literal-null scrubbing + Blank sentinel
    (SqlUpload_Actuals.py:75-78, myConversionsClass.py:268)."""
    cust = load_table(spark, sf_dir, "customer")
    dirty = F.when(F.col("c_mktsegment") == "BUILDING", F.lit("nan")).otherwise(
        F.col("c_mktsegment")
    )
    return (
        cust.withColumn("seg_dirty", dirty)
        .withColumn("seg_null", literals_to_null("seg_dirty"))
        .withColumn("segment", blank_to_sentinel("seg_null"))
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("segment")
    )


def _f9_oracle() -> str:
    from machine_learning_with_spark_streaming_spark.functions.formatting import (
        fmt_int_sql,
        fmt_pct_sql,
        fmt_val_sql,
        human_format_sql,
    )

    def nz(expr: str) -> str:  # the reference's null path via 5-LOW
        return f"(CASE WHEN priority = '5-LOW' THEN NULL ELSE {expr} END)"

    return f"""
WITH agg AS (
  SELECT o_orderpriority AS priority, count(*) AS rc,
         CAST(sum(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
  FROM orders GROUP BY 1
), t AS (SELECT CAST(sum(rc) AS DOUBLE) AS all_rc FROM agg)
SELECT priority,
       {human_format_sql(nz('total * 10'))} AS human_b,
       {human_format_sql(nz('total'))} AS human_m,
       {human_format_sql(nz('total / 1e3'))} AS human_k,
       {human_format_sql(nz('total / 1e8'))} AS human_unit,
       {human_format_sql(nz('total / 1e9'))} AS human_small,
       {human_format_sql(nz('-total'))} AS human_neg,
       {fmt_int_sql(nz('rc'))} AS rc_str,
       {fmt_pct_sql(nz('rc / all_rc'))} AS share_pct,
       {fmt_val_sql(nz('total / 1e8'))} AS val_str
FROM agg, t
ORDER BY priority
"""


@register("f9_number_format", oracle=_f9_oracle())
def q_number_format(spark, sf_dir):
    """F9: human K/M/B, grouped-integer, percent and EA-value formatting
    as engine-side expressions (qualitycheck.py:48-63,
    datavalidation.py:79-111). One priority (5-LOW) is nulled to
    exercise the null sentinels; scaled copies of the same exact
    decimal-summed total hit every magnitude branch."""
    from machine_learning_with_spark_streaming_spark.functions.formatting import (
        fmt_int,
        fmt_pct,
        fmt_val,
        human_format,
    )

    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("rc"),
        F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
        .cast("double")
        .alias("total"),
    )
    t = agg.agg(F.sum("rc").cast("double").alias("all_rc"))

    def nz(c):
        return F.when(F.col("priority") != "5-LOW", c)

    return (
        agg.crossJoin(F.broadcast(t))
        .select(
            "priority",
            human_format(nz(F.col("total") * 10)).alias("human_b"),
            human_format(nz(F.col("total"))).alias("human_m"),
            human_format(nz(F.col("total") / 1e3)).alias("human_k"),
            human_format(nz(F.col("total") / 1e8)).alias("human_unit"),
            human_format(nz(F.col("total") / 1e9)).alias("human_small"),
            human_format(nz(-F.col("total"))).alias("human_neg"),
            fmt_int(nz(F.col("rc"))).alias("rc_str"),
            fmt_pct(nz(F.col("rc") / F.col("all_rc"))).alias("share_pct"),
            fmt_val(nz(F.col("total") / 1e8)).alias("val_str"),
        )
        .orderBy("priority")
    )
