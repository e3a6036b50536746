"""Set operations (SURVEY.md §2.7, U1-U3).

``pd.concat`` file/frame stacking becomes ``unionByName`` (or simply a
multi-path read); the reference's split-by-type -> transform -> re-concat
pattern (``packages/myDFClass.py:139-143``) collapses into a single
``when/otherwise`` expression — no split, no union, one scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table


def union_all(frames: list[DataFrame], allow_missing: bool = True) -> DataFrame:
    """U1: UNION ALL by column name (pd.concat, myFileClass.py:127)."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), frames
    )


# ---------------------------------------------------------------- queries

_U1_ORACLE = """
WITH unioned AS (
  SELECT 'actuals' AS feed, o_orderpriority AS priority, o_totalprice AS value
  FROM orders WHERE o_orderdate < DATE '1995-01-01'
  UNION ALL
  SELECT 'forecast' AS feed, o_orderpriority AS priority, o_totalprice AS value
  FROM orders WHERE o_orderdate >= DATE '1995-01-01'
)
SELECT feed, priority, CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(value), 2) AS value_sum
FROM unioned GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("u1_union_all", oracle=_U1_ORACLE)
def q_union_all(spark, sf_dir):
    """U1: actuals+forecast union with feed lineage column
    (pipeline/Staging.py:156)."""
    orders = load_table(spark, sf_dir, "orders")
    actuals = (
        orders.filter(F.col("o_orderdate") < F.lit("1995-01-01"))
        .select(
            F.lit("actuals").alias("feed"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("value"),
        )
    )
    forecast = (
        orders.filter(F.col("o_orderdate") >= F.lit("1995-01-01"))
        .select(
            F.lit("forecast").alias("feed"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("value"),
        )
    )
    return (
        union_all([actuals, forecast])
        .groupBy("feed", "priority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .orderBy("feed", "priority")
    )


_U3_ORACLE = """
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
       round(sum(CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END), 2)
         AS net_qty
FROM lineitem
GROUP BY 1 ORDER BY 1
"""


@register("u3_split_transform_union", oracle=_U3_ORACLE)
def q_split_transform_union(spark, sf_dir):
    """U3: the reference splits rows into populations, transforms each and
    re-concats (myDFClass.py:139-143); in Spark that is one
    ``when/otherwise`` expression — single scan, no union."""
    li = load_table(spark, sf_dir, "lineitem")
    signed = F.when(F.col("l_returnflag") == "R", -F.col("l_quantity")).otherwise(
        F.col("l_quantity")
    )
    return (
        li.groupBy(F.trunc("l_shipdate", "month").alias("ship_month"))
        .agg(F.round(F.sum(signed), 2).alias("net_qty"))
        .orderBy("ship_month")
    )
