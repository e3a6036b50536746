"""JDBC-shaped table IO (S5-S7, K3-K5 of SURVEY.md §2.1).

The reference hand-builds ``SELECT ... WHERE col IN (...)`` strings and
ships them over pyodbc (``packages/mySQLClass.py:103-146``), then uploads
with chunked ``to_sql`` (``:60-90``). In Spark the same surface is
``spark.read.jdbc`` / ``df.write.jdbc`` — predicate pushdown happens in
Catalyst (``filter(col.isin(...))`` reaches the remote WHERE clause), and
writes parallelize per partition with ``batchsize`` replacing the 5000-row
``chunksize`` + fast_executemany.

Exercised two ways in tests: a parquet-backed shim for plumbing, and a
REAL JDBC round-trip against embedded Apache Derby (whose driver jar
ships inside pyspark itself) covering driver loading, type mapping,
batched inserts, remote predicate pushdown, partitioned parallel reads,
and the live-table delta upsert (tests/test_jdbc_derby.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BATCH_SIZE = 5000  # pipeline/SqlUpload.py:24


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    predicates: list[str] | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """S5/S6: table read. ``partition_column`` bounds give a parallel read
    (replaces the reference's manual 7-way query sharding). Filters applied
    to the result push down into the remote query."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions or 8)
            .option("lowerBound", lower_bound or 0)
            .option("upperBound", upper_bound or 1)
        )
    return reader.load()


def write_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = DEFAULT_BATCH_SIZE,
    properties: dict[str, str] | None = None,
) -> None:
    """K3: chunked append/replace (mySQLClass.py:60-90). ``mode='append'``
    mirrors to_sql append; ``'overwrite'`` the replace path."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def upsert_delta_rows(
    new: DataFrame,
    read_existing,
    write_changed,
    pk: list[str],
    compare_cols: list[str],
) -> int:
    """K4: delta upsert — read back the target, keep only changed/new rows,
    write just those (mySQLClass.py:148-220). ``read_existing()`` and
    ``write_changed(df)`` abstract the sink (JDBC, Delta MERGE, parquet).
    Returns the number of rows written."""
    from machine_learning_with_spark_streaming_spark.operators.validation import delta_rows

    existing = read_existing()
    changed = delta_rows(new, existing, pk, compare_cols)
    n = changed.count()
    if n:
        write_changed(changed)
    return n
