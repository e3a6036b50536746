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


def read_table_schema(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
):
    """Target-table schema via JDBC metadata only — the Spark
    equivalent of the reference's INFORMATION_SCHEMA.COLUMNS probe
    (pipeline/DryRun.py:115-130). ``.schema`` on a JDBC relation
    resolves from driver metadata without fetching rows."""
    return read_table(spark, url, table, properties).schema


def coerce_to_schema(df: DataFrame, target, strict: bool = True) -> DataFrame:
    """Cast + reorder ``df`` to match a target ``StructType`` — the
    engine half of the reference's pre-upload type coercion
    (pipeline/DryRun.py:137-188: read the sink table's types, align the
    frame column-by-column before to_sql). Spark-first: one ``select``
    of cast expressions, fully JVM-side; under ANSI mode an
    incompatible VALUE (e.g. a non-numeric string into BIGINT) fails
    the write loudly instead of silently nulling — the reference's
    errors='coerce'→NaN path is exactly the silent type drift this
    guards against.

    Matching is case-insensitive (the reference lowercases both sides);
    if two ``df`` columns differ only by case, the FIRST in column
    order wins — deterministic, and a schema that pathological should
    be fixed upstream. Extra ``df`` columns are dropped (DryRun keeps
    only EXPECTED_COLS);
    a target column missing from ``df`` raises when ``strict`` else is
    filled with typed NULLs. Structurally uncastable pairs (array →
    int, ...) raise at analysis time via Spark's cast resolution."""
    from pyspark.sql import functions as F

    by_lower = {}
    for c in df.columns:
        by_lower.setdefault(c.lower(), c)
    exprs = []
    missing = []
    for field in target.fields:
        src = by_lower.get(field.name.lower())
        if src is None:
            if strict:
                missing.append(field.name)
            else:
                exprs.append(
                    F.lit(None).cast(field.dataType).alias(field.name)
                )
        else:
            exprs.append(F.col(src).cast(field.dataType).alias(field.name))
    if missing:
        raise ValueError(
            f"dataframe is missing target table column(s) {missing}; "
            f"have {df.columns}"
        )
    return df.select(*exprs)


def coerce_to_table_schema(
    df: DataFrame,
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """DryRun parity: introspect the live target table's schema and
    coerce ``df`` to it before ``write_table`` — the guard a real load
    path needs because source extracts drift types constantly
    (pipeline/DryRun.py:115-188)."""
    return coerce_to_schema(
        df, read_table_schema(spark, url, table, properties), strict=strict
    )


def _jdbc_connect(spark: SparkSession, url: str, properties):
    """Raw ``java.sql`` connection honoring the same ``properties``
    dict Spark's reader/writer takes: ``driver`` loads the class, every
    other entry (user, password, ssl, ...) is forwarded via
    ``java.util.Properties`` — a bare ``getConnection(url)`` cannot
    authenticate against any credentialed engine."""
    jvm = spark._jvm  # noqa: SLF001 - py4j gateway to java.sql
    props = dict(properties or {})
    driver = props.pop("driver", None)
    if driver:
        jvm.java.lang.Class.forName(driver)
    jprops = jvm.java.util.Properties()
    for k, v in props.items():
        jprops.setProperty(k, str(v))
    return jvm.java.sql.DriverManager.getConnection(url, jprops)


def _to_jdbc_string_array(spark: SparkSession, items):
    """py4j does not auto-convert Python lists to Java ``String[]`` —
    ``DatabaseMetaData.getTables`` needs a real array for its ``types``
    filter."""
    gw = spark.sparkContext._gateway  # noqa: SLF001 - py4j array ctor
    arr = gw.new_array(gw.jvm.java.lang.String, len(items))
    for i, it in enumerate(items):
        arr[i] = it
    return arr


def execute_transaction(
    spark: SparkSession,
    url: str,
    statements: list[str],
    driver: str | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """Run raw SQL statements over JDBC in ONE transaction (autocommit
    off, commit only after every statement succeeds; rollback + reraise
    on any failure). Spark's DataFrame writer has no multi-statement
    transaction surface, so sink patterns that need atomicity (the
    stage-and-swap below) drop to ``java.sql`` via the running JVM —
    still the public JDBC API, no extra client library. ``properties``
    carries credentials exactly as ``read_table``/``write_table`` take
    them; the legacy ``driver`` kwarg folds into it."""
    props = dict(properties or {})
    if driver:
        props.setdefault("driver", driver)
    conn = _jdbc_connect(spark, url, props)
    try:
        conn.setAutoCommit(False)
        st = conn.createStatement()
        try:
            for sql in statements:
                st.execute(sql)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            st.close()
    finally:
        conn.close()


def staged_atomic_overwrite(
    df: DataFrame,
    url: str,
    table: str,
    stage_table: str | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    properties: dict[str, str] | None = None,
) -> None:
    """K4 exactly-once half: replace ``table``'s contents with ``df``
    ATOMICALLY. Spark's ``mode='overwrite'`` is a non-transactional
    truncate+insert — a crash between the two loses every pre-crash row
    (tests/test_jdbc_derby.py pins that loss). Here the parallel Spark
    write lands in a STAGE table (crash there leaves the live table
    untouched), then one server-side transaction does

        DELETE FROM live; INSERT INTO live SELECT ... FROM stage;

    A crash before the commit rolls back to the fully-old table; after
    it, the table is fully-new — there is no observable intermediate
    state, so a retried foreachBatch converges from ANY crash point.
    Same shape at cluster scale: stage via parallel JDBC writers, swap
    via one transactional statement (or RENAME/partition-exchange where
    the engine offers it)."""
    stage = stage_table or f"{table}_stage"
    write_table(df, url, stage, mode="overwrite",
                batch_size=batch_size, properties=properties)
    # Spark's JDBC writer quotes column identifiers (case-preserving);
    # match it or the unquoted names case-fold and miss
    cols = ", ".join(f'"{c}"' for c in df.columns)
    conn = _jdbc_connect(df.sparkSession, url, properties)
    try:
        # first run: create the live table from the stage's shape (empty;
        # idempotent via a metadata existence probe, so a crash between
        # this DDL and the swap changes nothing observable). '_' is a
        # JDBC LIKE wildcard in getTables patterns — escape it, or
        # 'latest_events' also matches LATESTXEVENTS and the CREATE is
        # wrongly skipped
        md = conn.getMetaData()
        esc = md.getSearchStringEscape()
        # fold the probe name the way THIS engine stores unquoted
        # identifiers (Derby/Oracle upper, Postgres lower, else as-is),
        # scope it to the connection's current schema, and restrict to
        # TABLE — a same-named VIEW or a table in another schema must
        # not suppress the CREATE
        if md.storesUpperCaseIdentifiers():
            folded = table.upper()
        elif md.storesLowerCaseIdentifiers():
            folded = table.lower()
        else:
            folded = table
        pattern = folded.replace("_", f"{esc}_")
        schema = conn.getSchema()
        types = _to_jdbc_string_array(df.sparkSession, ["TABLE"])
        if not md.getTables(None, schema, pattern, types).next():
            st = conn.createStatement()
            try:
                st.execute(
                    f"CREATE TABLE {table} AS SELECT {cols} FROM {stage} "
                    "WITH NO DATA"
                )
            finally:
                st.close()
    finally:
        conn.close()
    execute_transaction(
        df.sparkSession,
        url,
        [
            f"DELETE FROM {table}",
            f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {stage}",
        ],
        properties=properties,
    )
