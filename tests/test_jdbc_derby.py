"""Real JDBC round-trip (S5/K3) against embedded Apache Derby — the one
JDBC engine whose driver jar ships inside pyspark itself
(``jars/derby-*.jar``, bundled for the Hive metastore), so this runs
with no network and no extra installs. Covers what the parquet-shim
tests cannot: the actual ``spark.read/write.format("jdbc")`` path —
driver loading, type mapping, batched inserts, predicate pushdown into
the remote engine, partitioned parallel reads, and the K4 delta upsert
against a live SQL table. Reference parity: packages/mySQLClass.py
(pyodbc read 103-146, chunked to_sql upload 60-90, delta upsert
148-220)."""

import os

import pytest
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.sources.jdbc import read_table, upsert_delta_rows, write_table

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db_dir};create=true"


def _orders(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("order_id"),
        (F.col("id") % 7).alias("cust_id"),
        (F.col("id") * 10 + 5).cast("double").alias("amount"),
        F.when(F.col("id") % 3 == 0, "F").otherwise("O").alias("status"),
    )


def test_write_then_read_roundtrip(spark, derby_url):
    df = _orders(spark)
    write_table(df, derby_url, "orders_rt", mode="overwrite",
                properties=DERBY_PROPS, batch_size=25)
    back = read_table(spark, derby_url, "orders_rt", properties=DERBY_PROPS)
    assert back.count() == 100
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0


def test_append_mode_accumulates(spark, derby_url):
    write_table(_orders(spark, 10), derby_url, "orders_app",
                mode="overwrite", properties=DERBY_PROPS)
    write_table(_orders(spark, 10), derby_url, "orders_app",
                mode="append", properties=DERBY_PROPS)
    assert read_table(spark, derby_url, "orders_app",
                      properties=DERBY_PROPS).count() == 20


def test_predicate_pushes_into_remote_query(spark, derby_url):
    # Spark's default Derby mapping makes StringType a CLOB, which the
    # remote engine refuses to compare — declaring VARCHAR at write time
    # is the documented cure (and itself proves the filter runs remotely:
    # without the cast Derby, not Spark, raised the comparison error).
    write_table(_orders(spark), derby_url, "orders_pred",
                mode="overwrite",
                properties={**DERBY_PROPS,
                            "createTableColumnTypes": "status VARCHAR(1)"})
    q = read_table(spark, derby_url, "orders_pred",
                   properties=DERBY_PROPS).filter(F.col("status") == "F")
    assert q.count() == 34  # ids 0,3,...,99
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the filter must reach the JDBC scan, not run post-scan in Spark
    assert "PushedFilters" in plan and "status" in plan


def test_partitioned_parallel_read(spark, derby_url):
    write_table(_orders(spark), derby_url, "orders_part",
                mode="overwrite", properties=DERBY_PROPS)
    df = read_table(
        spark, derby_url, "orders_part", properties=DERBY_PROPS,
        partition_column="order_id", num_partitions=4,
        lower_bound=0, upper_bound=100,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100


def test_k4_delta_upsert_against_live_table(spark, derby_url):
    base = _orders(spark, 20)
    write_table(base, derby_url, "orders_ups", mode="overwrite",
                properties=DERBY_PROPS)
    # 5 changed rows + 3 brand-new ones
    changed = _orders(spark, 23).withColumn(
        "amount",
        F.when(F.col("order_id") < 5, F.col("amount") + 1000).otherwise(
            F.col("amount")
        ),
    ).filter((F.col("order_id") < 5) | (F.col("order_id") >= 20))
    n = upsert_delta_rows(
        changed,
        read_existing=lambda: read_table(
            spark, derby_url, "orders_ups", properties=DERBY_PROPS
        ),
        write_changed=lambda d: write_table(
            d, derby_url, "orders_ups_delta", mode="overwrite",
            properties=DERBY_PROPS,
        ),
        pk=["order_id"],
        compare_cols=["amount", "status"],
    )
    assert n == 8
    delta = read_table(spark, derby_url, "orders_ups_delta",
                       properties=DERBY_PROPS)
    assert delta.count() == 8
    assert delta.filter(F.col("amount") > 1000).count() == 5


def test_derby_jar_is_sparks_own(spark):
    """Guard the premise: the Derby driver comes from pyspark's bundled
    jars, not an external install."""
    import pyspark

    jars = os.listdir(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    assert any(j.startswith("derby-") for j in jars)


def test_aggregate_pushdown_executes_in_remote_engine(spark, derby_url):
    """Via the DSv2 JDBCTableCatalog with pushDownAggregate, a GROUP BY
    over the remote table plans as `PushedAggregates: [COUNT(*),
    SUM(...)]` — the aggregation runs inside Derby and Spark receives
    |groups| rows, not the table. At 100 TB-behind-JDBC this is the
    difference between shipping the warehouse and shipping the answer;
    S6's predicate pushdown is the same contract one operator earlier."""
    write_table(_orders(spark), derby_url, "agg_push", mode="overwrite",
                properties=DERBY_PROPS)
    confs = {
        "spark.sql.catalog.derby":
            "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
        "spark.sql.catalog.derby.url": derby_url,
        "spark.sql.catalog.derby.driver": "org.apache.derby.jdbc.EmbeddedDriver",
        "spark.sql.catalog.derby.pushDownAggregate": "true",
    }
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        q = spark.sql(
            "SELECT cust_id, count(*) AS n, sum(amount) AS amt "
            "FROM derby.APP.AGG_PUSH GROUP BY cust_id"
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregates: [COUNT(*), SUM(amount)]" in plan, plan[:1500]
        got = {r.cust_id: (r.n, r.amt) for r in q.collect()}
        expect = {
            r.cust_id: (r.n, r.amt)
            for r in _orders(spark)
            .groupBy("cust_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("amt"))
            .collect()
        }
        assert got == expect
    finally:
        for k in confs:
            spark.conf.unset(k)


def test_coerce_to_table_schema_fixes_type_drift(spark, derby_url):
    """DryRun parity (pipeline/DryRun.py:115-188): a deliberately
    mistyped extract (ids/amounts as strings, ints where the table has
    doubles) must coerce to the live table's introspected schema and
    append cleanly; a frame missing a target column must refuse."""
    from machine_learning_with_spark_streaming_spark.sources.jdbc import (
        coerce_to_table_schema,
    )

    write_table(
        _orders(spark, 5), derby_url, "orders_coerce",
        mode="overwrite", properties=DERBY_PROPS,
    )
    drifted = spark.createDataFrame(
        [("100", 9, "77.5", "F"), ("101", 3, "12.25", "O")],
        # wrong types AND wrong order AND wrong case
        "ORDER_ID string, CUST_ID int, amount string, status string",
    ).select("amount", "status", "ORDER_ID", "CUST_ID")
    fixed = coerce_to_table_schema(
        drifted, spark, derby_url, "orders_coerce", properties=DERBY_PROPS
    )
    assert [f.name.lower() for f in fixed.schema.fields] == [
        "order_id", "cust_id", "amount", "status",
    ]
    write_table(fixed, derby_url, "orders_coerce",
                mode="append", properties=DERBY_PROPS)
    back = read_table(spark, derby_url, "orders_coerce", properties=DERBY_PROPS)
    assert back.count() == 7
    got = {tuple(r) for r in back.collect() if r[0] >= 100}
    assert got == {(100, 9, 77.5, "F"), (101, 3, 12.25, "O")}

    with pytest.raises(ValueError, match="missing target table column"):
        coerce_to_table_schema(
            drifted.drop("status"), spark, derby_url, "orders_coerce",
            properties=DERBY_PROPS,
        )
    # non-strict fills typed NULLs instead
    filled = coerce_to_table_schema(
        drifted.drop("status"), spark, derby_url, "orders_coerce",
        properties=DERBY_PROPS, strict=False,
    )
    assert [r.status for r in filled.collect()] == [None, None]


def test_coerce_rejects_bad_values_loudly(spark, derby_url):
    """ANSI cast: a non-numeric string bound for a numeric column fails
    the job instead of silently writing NULL (the reference's
    errors='coerce' NaN path is the drift this guards against)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import NumberFormatException

    from machine_learning_with_spark_streaming_spark.sources.jdbc import (
        coerce_to_table_schema,
    )

    write_table(
        _orders(spark, 3), derby_url, "orders_badval",
        mode="overwrite", properties=DERBY_PROPS,
    )
    bad = spark.createDataFrame(
        [("not-a-number", 1, "1.0", "F")],
        "order_id string, cust_id int, amount string, status string",
    )
    fixed = coerce_to_table_schema(
        bad, spark, derby_url, "orders_badval", properties=DERBY_PROPS
    )
    with pytest.raises((Py4JJavaError, NumberFormatException)):
        fixed.collect()


def _merge_latest(spark, url, table, batch_df):
    """The s11_jdbc_upsert_stream merge: read target, union batch, keep
    max-(ts-free here: max event_id) row per user."""
    from pyspark.sql import Window

    target = read_table(spark, url, table, properties=DERBY_PROPS)
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        target.unionByName(batch_df)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .localCheckpoint(eager=True)
    )


def test_plain_overwrite_crash_loses_rows(spark, derby_url):
    """Negative control for the staged sink: JDBC mode='overwrite' is
    truncate+insert with an observable truncated-but-not-reloaded
    intermediate state. If the writer dies there, the retried batch
    merges against an empty target and every row only EARLIER batches
    carried is gone — the loss mode the staged swap exists to close."""
    from machine_learning_with_spark_streaming_spark.sources.jdbc import execute_transaction

    table = "up_plain"
    b0 = spark.createDataFrame([(1, 10, 1.0)], "user_id long, event_id long, value double")
    b1 = spark.createDataFrame([(2, 20, 2.0)], "user_id long, event_id long, value double")
    write_table(b0, derby_url, table, mode="overwrite", properties=DERBY_PROPS)
    # batch 1 "crashes" after overwrite's truncate, before its insert:
    merged = _merge_latest(spark, derby_url, table, b1)
    assert merged.count() == 2  # the state the sink MEANT to write
    execute_transaction(spark, derby_url, [f"DELETE FROM {table}"],
                        driver=DERBY_PROPS["driver"])  # the truncate half ran
    # retry of batch 1 sees the damaged target:
    retried = _merge_latest(spark, derby_url, table, b1)
    write_table(retried, derby_url, table, mode="overwrite", properties=DERBY_PROPS)
    final = read_table(spark, derby_url, table, properties=DERBY_PROPS)
    assert final.count() == 1  # user 1 is LOST — rows-only-from-b0 gone
    assert [r["user_id"] for r in final.collect()] == [2]


def test_staged_swap_survives_crash(spark, derby_url):
    """The staged sink converges from every crash point: (a) death
    after the stage write but before the swap leaves the live table
    fully-old, and the retried batch recovers everything; (b) a failure
    INSIDE the swap transaction rolls back — the DELETE half never
    becomes visible on its own."""
    from machine_learning_with_spark_streaming_spark.sources.jdbc import (
        execute_transaction,
        staged_atomic_overwrite,
        write_table as _wt,
    )

    table = "up_staged"
    b0 = spark.createDataFrame([(1, 10, 1.0)], "user_id long, event_id long, value double")
    b1 = spark.createDataFrame([(2, 20, 2.0)], "user_id long, event_id long, value double")
    staged_atomic_overwrite(b0, derby_url, table, properties=DERBY_PROPS)

    # (a) crash point: stage written, swap never ran
    merged = _merge_latest(spark, derby_url, table, b1)
    _wt(merged, derby_url, f"{table}_stage", mode="overwrite", properties=DERBY_PROPS)
    # ... process dies here; live table must be fully-old:
    live = read_table(spark, derby_url, table, properties=DERBY_PROPS)
    assert [r["user_id"] for r in live.collect()] == [1]
    # retry from the checkpoint re-merges against the INTACT target:
    retried = _merge_latest(spark, derby_url, table, b1)
    staged_atomic_overwrite(retried, derby_url, table, properties=DERBY_PROPS)
    final = read_table(spark, derby_url, table, properties=DERBY_PROPS)
    assert sorted(r["user_id"] for r in final.collect()) == [1, 2]

    # (b) crash point: inside the swap transaction — DELETE executed,
    # then the transaction fails before commit. Atomicity = the DELETE
    # is rolled back, not left as a truncated table.
    with pytest.raises(Exception):
        execute_transaction(
            spark, derby_url,
            [f"DELETE FROM {table}", "INSERT INTO no_such_table VALUES (1)"],
            driver=DERBY_PROPS["driver"],
        )
    after = read_table(spark, derby_url, table, properties=DERBY_PROPS)
    assert sorted(r["user_id"] for r in after.collect()) == [1, 2]
