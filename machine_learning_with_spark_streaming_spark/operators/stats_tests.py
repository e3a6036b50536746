"""Contingency-table independence testing (chi-square) — the QC
counterpart to the distribution-drift family (v14/v17/v20): "are these
two categorical columns independent, and which cells drive the
dependence?"

Cross-engine exactness recipe (the v20 PSI precedent): every term is
derived from EXACT integer sufficient statistics — per-cell observed
count ``o``, margin totals ``r`` and ``c``, grand total ``n`` — and the
floating-point part is a fixed sequence of single IEEE ops on those
integers, identical in Spark and DuckDB:

    diff = o*n - r*c                 (exact BIGINT)
    term = (diff * diff) / (n * (r*c))   in DOUBLE, then round 6dp

which is algebraically (o-e)^2/e with e = r*c/n, but with the division
deferred to one final op so both engines round identically. The total
row (flag='__TOTAL__') sums the ROUNDED terms and rounds again —
sum order over ~6 values is immaterial after per-term rounding.

At 100 TB the BIGINT products would be computed in DECIMAL(38,0)
internally (o*n overflows int64 past ~3e9 rows x cells); the margins
and cells are two tiny hash aggregates either way, and the cell grid
join is a broadcast of a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table


def chi2_independence(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Per-cell chi-square decomposition of a two-way contingency table
    plus a '__TOTAL__' statistic row. Columns: a, b, o (observed),
    r_tot, c_tot (margins), chi2_term (6dp)."""
    base = df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    n = base.count()  # plan-time literal, like v20's n_old/n_new
    cells = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    r_m = base.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("r_tot"))
    c_m = base.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("c_tot"))
    grid = r_m.crossJoin(F.broadcast(c_m))  # |a| x |b| tiny post-agg rows
    full = grid.join(F.broadcast(cells), ["a", "b"], "left").select(
        "a",
        "b",
        F.coalesce("o", F.lit(0)).cast("long").alias("o"),
        "r_tot",
        "c_tot",
    )
    diff = F.col("o") * F.lit(n) - F.col("r_tot") * F.col("c_tot")
    rc = (F.col("r_tot") * F.col("c_tot")).cast("double")
    term = (diff.cast("double") * diff.cast("double")) / (
        F.lit(float(n)) * rc
    )
    terms = full.withColumn(
        "chi2_term", F.round(term, 6) + F.lit(0.0)
    )
    total = terms.agg(
        F.lit("__TOTAL__").alias("a"),
        F.lit("").alias("b"),
        F.sum("o").cast("long").alias("o"),
        F.lit(n).cast("long").alias("r_tot"),
        F.lit(n).cast("long").alias("c_tot"),
        (F.round(F.sum("chi2_term"), 6) + F.lit(0.0)).alias("chi2_term"),
    )
    return terms.unionByName(total).orderBy("a", "b")


_V25_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS a, l_linestatus AS b FROM lineitem
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
cells AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS o FROM base GROUP BY a, b
),
r_m AS (SELECT a, CAST(count(*) AS BIGINT) AS r_tot FROM base GROUP BY a),
c_m AS (SELECT b, CAST(count(*) AS BIGINT) AS c_tot FROM base GROUP BY b),
grid AS (SELECT a, r_tot, b, c_tot FROM r_m, c_m),
full_g AS (
  SELECT g.a, g.b, CAST(COALESCE(c.o, 0) AS BIGINT) AS o, g.r_tot, g.c_tot
  FROM grid g LEFT JOIN cells c USING (a, b)
),
terms AS (
  SELECT a, b, o, r_tot, c_tot,
         round((CAST(o * n - r_tot * c_tot AS DOUBLE)
                * CAST(o * n - r_tot * c_tot AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(r_tot * c_tot AS DOUBLE)), 6)
           + 0.0 AS chi2_term
  FROM full_g, tot
)
SELECT * FROM terms
UNION ALL
SELECT '__TOTAL__', '', (SELECT CAST(sum(o) AS BIGINT) FROM terms),
       (SELECT n FROM tot), (SELECT n FROM tot),
       (SELECT round(sum(chi2_term), 6) + 0.0 FROM terms)
ORDER BY 1, 2
"""


@register("v25_chi2_independence", oracle=_V25_ORACLE)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-family beyond-ref: chi-square independence decomposition of
    l_returnflag x l_linestatus — per-cell terms from exact integer
    margins, plus the '__TOTAL__' statistic row."""
    li = load_table(spark, sf_dir, "lineitem")
    return chi2_independence(li, "l_returnflag", "l_linestatus")
