"""Bucketed tables: co-located joins and aggregations without shuffles.

At 100 TB the dominant cost of fact-fact joins (lineitem ⋈ orders) and
repeated keyed aggregations is the shuffle. Bucketing pre-partitions the
data by key at write time — each side's bucket i holds the same key hash
range — so Catalyst plans a sort-merge join with **no Exchange on either
side** (verified in tests/test_bucketed.py by asserting the physical
plan). The write cost is paid once; every downstream join/agg on the
bucket key reuses it.

This is the engine's answer to the reference's hand-sharded extracts
(7 x 6-month DAX windows, FCST_DemandNonBlank1..7.ps1): instead of
manually bounding data per query, store once bucketed on the join key
and let every query prune + co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    ``sort_cols`` defaulting to the bucket columns lets the sort-merge
    join skip its per-partition sort too (bucket files are pre-sorted).
    """
    writer = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on ``on``: shuffle-free by construction
    (both sides' outputPartitioning already satisfies the join's
    distribution requirement)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
