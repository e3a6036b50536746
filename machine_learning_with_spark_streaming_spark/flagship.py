"""Flagship query — the FCST_DemandBlank extract shape, Spark-first.

The richest query in the reference is the DAX extract
``PowerShell script/FCST_DemandBlank.ps1:20-63``:

    filter (ISBLANK(country), BU IN {...}, measure <> 0, date window)
    -> SUMMARIZE(fact, dims...) + CALCULATE(SUM(measure))
    -> ORDER BY dims

Transposed onto the testdata star schema: revenue rollup of
``lineitem ⋈ orders ⋈ customer`` for selected market segments over a
one-year order-date window, grouped by segment / priority / month,
dropping zero-revenue groups.

Scale notes (100 TB posture):
- The only shuffle-heavy join is ``lineitem ⋈ orders`` on the orderkey —
  both sides hash-partition on the key; AQE handles skew.
- ``customer`` is dimension-sized relative to the fact; Catalyst/AQE
  broadcasts it under the configured threshold (no manual collect).
- The date-window + segment filters sit directly on the scans, so parquet
  row-group pruning and column pruning apply before the join.
- Aggregation is partial (map-side) before the exchange — free with
  ``groupBy().agg()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.schemas import load_table

SEGMENTS = ["BUILDING", "AUTOMOBILE", "MACHINERY"]
DATE_START = "1995-01-01"
DATE_END = "1996-01-01"


def demand_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment/priority/month revenue rollup (FCST_DemandBlank shape)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(DATE_START))
        & (F.col("o_orderdate") < F.lit(DATE_END))
    )
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(SEGMENTS)
    )

    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
            F.trunc("o_orderdate", "month").alias("order_month"),
        )
        .agg(
            # decimal aggregation: exact + associative, so the result (and
            # its 2-dec rounding) is identical regardless of partitioning
            # and matches any engine computing the same decimal sum
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .filter(F.col("revenue") != 0)
        .orderBy("segment", "priority", "order_month")
    )


DEMAND_ROLLUP_ORACLE = f"""
SELECT
  c.c_mktsegment AS segment,
  o.o_orderpriority AS priority,
  CAST(date_trunc('month', o.o_orderdate) AS DATE) AS order_month,
  CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l.l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
  round(sum(l.l_quantity), 2) AS sum_qty,
  count(*) AS n_rows
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderdate >= DATE '{DATE_START}'
  AND o.o_orderdate < DATE '{DATE_END}'
  AND c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
GROUP BY 1, 2, 3
HAVING CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l.l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) <> 0
ORDER BY 1, 2, 3
"""
