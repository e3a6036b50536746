"""EP1 end-to-end: a JobSpec normalizing a raw feed to canonical fact rows.

The feed is ``lineitem ⋈ orders ⋈ customer`` (standing in for a DAX
extract CSV, FIXTURES.md §2/§6); the mapping join enriches the customer's
nation into ``country`` with NotMapped defaults; BU comes from the
return-flag with the reference's remap semantics (SRG->SUR style,
myDFClass.py:161-168).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.plans.jobspec import JobSpec, MappingSpec, run_job
from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table

_EP1_ORACLE = """
SELECT
  'tpch_feed' AS source,
  CAST(date_trunc('month', o.o_orderdate) AS DATE) AS snapshot,
  CAST(l.l_partkey AS VARCHAR) AS material,
  o.o_orderpriority AS sales_organization,
  coalesce(n.n_name, 'NotMapped') AS country,
  CAST(date_trunc('month', l.l_shipdate) AS DATE) AS attribute,
  l.l_extendedprice AS value,
  CASE l.l_returnflag WHEN 'A' THEN 'ACT' WHEN 'N' THEN 'NEW' WHEN 'R' THEN 'RET'
       ELSE l.l_returnflag END AS bu
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY l.l_orderkey, l.l_linenumber
"""


@register("ep1_job_pipeline", oracle=_EP1_ORACLE)
def q_job_pipeline(spark, sf_dir):
    """EP1: config-driven feed normalization to the 8-column fact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name")
    )

    feed = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )

    spec = JobSpec(
        name="tpch_feed",
        rename_map={
            "l_partkey": "material",
            "o_orderpriority": "sales_organization",
            "l_returnflag": "bu",
        },
        constants={"source": "tpch_feed"},
        value_col="l_extendedprice",
        mapping=MappingSpec(
            dim=nation, on=["c_nationkey"], enriched_cols={"n_name": "country"}
        ),
        snapshot_expr=F.trunc("o_orderdate", "month"),
        bu_remap={"A": "ACT", "N": "NEW", "R": "RET"},
    )
    feed = feed.withColumn("attribute", F.trunc("l_shipdate", "month"))
    return run_job(feed, spec)
