import pytest
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.operators.joins import (
    DuplicateJoinKeyError,
    enrich,
    guarded_join,
)


def test_guarded_join_raises_on_duplicate_keys(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    dup_dim = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], ["k", "d"])
    with pytest.raises(DuplicateJoinKeyError):
        guarded_join(left, dup_dim, ["k"])


def test_guarded_join_ok_without_duplicates(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    dim = spark.createDataFrame([(1, "x"), (2, "z")], ["k", "d"])
    out = guarded_join(left, dim, ["k"]).orderBy("k").collect()
    assert [r["d"] for r in out] == ["x", "z", None]


def test_enrich_sentinels_and_errors(spark):
    fact = spark.createDataFrame([("US", 1.0), ("", 2.0), ("XX", 3.0)], ["country", "v"])
    dim = spark.createDataFrame([("US", "America")], ["country", "region"])
    enriched, errors = enrich(fact, dim, ["country"], {"region": "region_name"})
    rows = {r["country"]: r["region_name"] for r in enriched.collect()}
    assert rows == {"US": "America", "Blank": "NotMapped", "XX": "NotMapped"}
    err_keys = sorted(r["country"] for r in errors.collect())
    assert err_keys == ["Blank", "XX"]


def test_enrich_blank_null_both_sentineled(spark):
    fact = spark.createDataFrame([(None, 1.0), ("  ", 2.0)], "country string, v double")
    dim = spark.createDataFrame([("US", "America")], ["country", "region"])
    enriched, _ = enrich(fact, dim, ["country"], {"region": "region_name"})
    assert all(r["country"] == "Blank" for r in enriched.collect())


def test_assert_unique_keys_batched(spark):
    import pytest as _pytest

    from machine_learning_with_spark_streaming_spark.operators.joins import (
        DuplicateJoinKeyError,
        assert_unique_keys,
        guarded_join,
    )

    clean = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    dup = spark.createDataFrame([(1, "a"), (1, "b")], ["k", "v"])
    assert_unique_keys([("c1", clean, ["k"]), ("c2", clean, ["k"])])
    with _pytest.raises(DuplicateJoinKeyError, match="d2"):
        assert_unique_keys([("c1", clean, ["k"]), ("d2", dup, ["k"])])
    # check=False skips the eager probe entirely (batched validation path)
    fact = spark.createDataFrame([(1, 10)], ["k", "x"])
    out = guarded_join(fact, dup, ["k"], check=False)
    assert out.count() == 2  # fan-out allowed when unchecked
