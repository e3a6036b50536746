"""Drive the actual driver contract: every ``queries()`` entry runs, and
every declared ``oracle_sql()`` entry hash-matches DuckDB on the same
parquet tables. This test grows automatically as operators land.
"""

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import assert_matches_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, oracle_con, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, oracle_con, ORACLES[name])
