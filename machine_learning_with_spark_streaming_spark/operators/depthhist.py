"""Equi-depth (frequency-balanced) histogram — the partner to a17's
equi-WIDTH bins: every bin holds the same row count, so bin boundaries
ARE the empirical quantiles. The binning a range-partitioner, a
percentile-bucketed report, or a spill-aware shuffle planner actually
wants (equi-width bins collapse under skew; equi-depth bins can't).

Rank-based and integer-exact: bin(rn) = ((rn − 1)·B) div n over the
per-group value sort — no interpolated percentiles, no doubles. One
window pass per group (the a14/w25 exact-order-statistic shape; the
sketch-mergeable alternative at 100 TB is percentile_approx bins) +
one (group, bin) aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table

DEPTH_BINS = 4


def equi_depth_histogram(
    df: DataFrame, group_col: str, value_cents, n_bins: int = DEPTH_BINS
) -> DataFrame:
    """(g, bin, lo, hi, n_rows) with ~equal n_rows per bin within each
    group; ties on the value split by rank (both engines sort by
    (value, rank) so boundary assignment is positional and exact)."""
    base = df.select(F.col(group_col).alias("g"), value_cents.alias("v"))
    w = Window.partitionBy("g").orderBy("v")
    wc = Window.partitionBy("g")
    ranked = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wc)
    )
    binned = ranked.withColumn(
        "bin", F.expr(f"((rn - 1) * {n_bins}) div n").cast("int")
    )
    return (
        binned.groupBy("g", "bin")
        .agg(
            F.min("v").cast("long").alias("lo"),
            F.max("v").cast("long").alias("hi"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .orderBy("g", "bin")
    )


_A23_ORACLE = f"""
WITH base AS (
  SELECT l_returnflag AS g,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS v
  FROM lineitem
),
ranked AS (
  SELECT g, v,
         row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM base
),
binned AS (
  SELECT g, v, CAST(((rn - 1) * {DEPTH_BINS}) // n AS INT) AS bin
  FROM ranked
)
SELECT g, bin, CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi,
       CAST(count(*) AS BIGINT) AS n_rows
FROM binned GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("a23_equi_depth_histogram", oracle=_A23_ORACLE)
def q_equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family beyond-ref: 4 frequency-balanced price bins per return
    flag — rank-positional boundaries, integer cents end to end."""
    li = load_table(spark, sf_dir, "lineitem")
    return equi_depth_histogram(
        li, "l_returnflag", F.round(F.col("l_extendedprice") * 100).cast("long")
    )
