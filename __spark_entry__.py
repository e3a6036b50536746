"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001. ``queries()`` maps one
name per implemented operator (SURVEY.md §2) to a ``(spark, sf_dir) ->
DataFrame`` callable; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL
for each (omitted only for genuinely non-SQL-expressible ops, which get the
driver's weaker rows-only check).

Query implementations live in ``machine_learning_with_spark_streaming_spark`` and self-register via
``machine_learning_with_spark_streaming_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from machine_learning_with_spark_streaming_spark import flagship
from machine_learning_with_spark_streaming_spark.registry import collect

QueryFn = Callable[[SparkSession, str], DataFrame]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship.demand_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, QueryFn]:
    q: dict[str, QueryFn] = {
        "flagship_demand_rollup": flagship.demand_rollup,
    }
    for name, rq in collect().items():
        q[name] = rq.fn
    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {
        "flagship_demand_rollup": flagship.DEMAND_ROLLUP_ORACLE,
    }
    for name, rq in collect().items():
        if rq.oracle is not None:
            o[name] = rq.oracle
    return o
