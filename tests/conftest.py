"""Shared fixtures: one local SparkSession + a DuckDB oracle comparator.

The comparator mirrors the driver's correctness gate: run the Spark
DataFrame and the ANSI-SQL oracle on the same parquet tables, compare
row count + column names + order-insensitive values.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from machine_learning_with_spark_streaming_spark.schemas import TESTDATA_TABLES
from machine_learning_with_spark_streaming_spark.session import get_session
from machine_learning_with_spark_streaming_spark.testing import rowset as _rowset

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_session("machine-learning-with-spark-streaming-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def assert_matches_oracle(spark_df, oracle_con, sql, check_schema=True):
    """Driver-style compare: row count, sorted column names, sorted values."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = oracle_con.execute(sql)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()

    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    if check_schema:
        assert sorted(s_cols) == sorted(o_cols), (
            f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
        )
    s_set = _rowset(s_cols, s_rows)
    o_set = _rowset(o_cols, o_rows)
    for i, (a, b) in enumerate(zip(s_set, o_set)):
        assert a == b, f"first differing row #{i}: spark={a!r} oracle={b!r}"
