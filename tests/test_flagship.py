from machine_learning_with_spark_streaming_spark.flagship import DEMAND_ROLLUP_ORACLE, demand_rollup

from tests.conftest import assert_matches_oracle


def test_demand_rollup_matches_oracle(spark, sf_dir, oracle_con):
    df = demand_rollup(spark, sf_dir)
    assert df.count() > 0
    assert_matches_oracle(df, oracle_con, DEMAND_ROLLUP_ORACLE)
