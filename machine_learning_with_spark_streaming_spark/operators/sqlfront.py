"""The SQL front door — proof that a user of this engine can drive it
through ``spark.sql`` alone: registered temp views + a multi-table
analytical query text (the TPC-H Q3 shape), a CREATE TEMPORARY
FUNCTION SQL scalar function (Spark 4 SQL UDFs — a reusable expression
that stays INSIDE Catalyst: it inlines into the plan, full codegen, no
Python), and the Spark 4 VARIANT type for semi-structured payloads
(``parse_json`` → ``variant_get`` typed access, the modern replacement
for stringly get_json_object).

Exactness: revenue is e4 fixed-point — cents × integer discount-
percent — so the Q3 aggregate is BIGINT end to end; the variant path
extracts an INT. Plans are ordinary Catalyst plans (the SQL text
lowers to the same operators the DataFrame API builds), so all the
usual pushdown/broadcast behavior applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table

Q3_CUT = "1998-01-01"
Q3_SEGMENT = "BUILDING"


def _register_views(spark: SparkSession, sf_dir: str, tables=()) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


_Q3_SPARK_SQL = f"""
SELECT l.l_orderkey,
       CAST(o.o_orderdate AS DATE) AS order_date,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS INT)))
            AS BIGINT) AS revenue_e4
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < DATE '{Q3_CUT}'
  AND l.l_shipdate > DATE '{Q3_CUT}'
GROUP BY 1, 2
ORDER BY revenue_e4 DESC, l_orderkey
LIMIT 10
"""

_Q3_ORACLE = f"""
SELECT l.l_orderkey,
       CAST(o.o_orderdate AS DATE) AS order_date,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS INT)))
            AS BIGINT) AS revenue_e4
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < DATE '{Q3_CUT}'
  AND l.l_shipdate > DATE '{Q3_CUT}'
GROUP BY 1, 2
ORDER BY revenue_e4 DESC, l_orderkey
LIMIT 10
"""


@register("sql_q3_shipping_priority", oracle=_Q3_ORACLE)
def q_sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-surface: the TPC-H Q3 shape as pure ``spark.sql`` text over
    registered views — segment-filtered 3-table join, e4 fixed-point
    revenue, deterministic top-10."""
    _register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_Q3_SPARK_SQL)


_UDF_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS INT)))
            AS BIGINT) AS revenue_e4
FROM lineitem GROUP BY 1 ORDER BY 1
"""


@register("sql_scalar_function", oracle=_UDF_ORACLE)
def q_sql_scalar_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-surface: a CREATE TEMPORARY FUNCTION scalar SQL UDF
    (Catalyst-inlined, zero Python) reused inside an aggregate — the
    oracle inlines the same expression, so the function's inlining is
    what gets hash-certified."""
    _register_views(spark, sf_dir, ("lineitem",))
    spark.sql("""
CREATE OR REPLACE TEMPORARY FUNCTION discounted_e4(price DOUBLE, disc DOUBLE)
RETURNS BIGINT
RETURN CAST(round(price * 100) AS BIGINT)
       * (100 - CAST(round(disc * 100) AS INT))
""")
    return spark.sql("""
SELECT l_returnflag,
       CAST(sum(discounted_e4(l_extendedprice, l_discount)) AS BIGINT)
         AS revenue_e4
FROM lineitem GROUP BY 1 ORDER BY 1
""")


_VARIANT_ORACLE = """
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
         AS k_sum
FROM events GROUP BY 1 ORDER BY 1
"""


@register("f13_variant_props", oracle=_VARIANT_ORACLE)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family: semi-structured payload access through the Spark 4
    VARIANT type — parse_json once, typed variant_get extraction —
    beside s11_json_props_extract's stringly get_json_object form."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select(k.alias("__k"))
        .groupBy((F.col("__k") % 10).cast("int").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("__k").cast("long").alias("k_sum"),
        )
        .orderBy("k_bucket")
    )
