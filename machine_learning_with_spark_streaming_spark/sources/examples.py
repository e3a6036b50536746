"""Registered ingest-edge queries over committed messy-feed fixtures.

``s1_header_autodetect`` exercises the reference's header-row scan
(``pipeline/lib.py:399-417``), candidate-column resolution
(``pipeline/lib.py:149-154``) and `` Performance`` suffix cleanup
(``pipeline/lib.py:157-159``) end-to-end on a fixture CSV with a junk
preamble. The DuckDB oracle reads the same committed file with an
explicit ``skip``, so the detection logic itself is what the comparison
certifies.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.sources.files import read_csv

_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
    "messy_feed.csv",
)

_HEADER_ORACLE = f"""
SELECT replace("Country", ' Performance', '') AS country,
       "Sales Organization" AS sales_organization,
       round(sum(CAST("Qty" AS DOUBLE)), 6) AS total_qty,
       CAST(count(*) AS BIGINT) AS n_rows
FROM read_csv('{_FIXTURE}', skip = 2, header = true, all_varchar = true)
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("s1_header_autodetect", oracle=_HEADER_ORACLE)
def q_header_autodetect(spark, sf_dir):
    """Messy-feed ingest: auto-detect the header row under a 2-line junk
    preamble, resolve the material column from drift candidates, strip
    the `` Performance`` country suffix, aggregate."""
    df = read_csv(
        spark,
        _FIXTURE,
        detect_header=True,
        col_candidates={"material": ["Material", "Material Number", "MatNr"]},
        required_cols=["material", "Country", "Qty"],
    )
    return (
        df.select(
            F.regexp_replace(F.col("Country"), " Performance$", "").alias("country"),
            F.col("Sales Organization").alias("sales_organization"),
            F.col("Qty").cast("double").alias("qty"),
        )
        .groupBy("country", "sales_organization")
        .agg(
            F.round(F.sum("qty"), 6).alias("total_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("country", "sales_organization")
    )
