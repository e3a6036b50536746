"""Property tests for deterministic hash sampling (operators/sampling.py)."""

from machine_learning_with_spark_streaming_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
)
from machine_learning_with_spark_streaming_spark.schemas import load_table


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_hash_sample_deterministic_and_nested(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s20 = _ids(hash_sample(docs, 0.2))
    s20_again = _ids(hash_sample(docs, 0.2))
    s50 = _ids(hash_sample(docs, 0.5))
    assert s20 == s20_again  # reproducible
    assert s20 <= s50  # growing the rate never resamples
    n = docs.count()
    assert 0 < len(s20) < len(s50) < n


def test_hash_sample_seed_changes_membership(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = _ids(hash_sample(docs, 0.5, seed=0))
    b = _ids(hash_sample(docs, 0.5, seed=1))
    assert a != b  # different seed, different (deterministic) sample


def test_hash_sample_partitioning_invariant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = _ids(hash_sample(docs, 0.3))
    reparted = _ids(hash_sample(docs.repartition(7, "lang"), 0.3))
    assert base == reparted  # membership is a pure function of the key


def test_stratified_rates_respected(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_hash_sample(
        docs, {"en": 0.0, "zh": 1.0}, strata_col="lang", default_rate=0.5
    )
    langs = dict(
        out.groupBy("lang").count().collect()
    )
    totals = dict(docs.groupBy("lang").count().collect())
    assert "en" not in {r[0] for r in langs.items()} or langs.get("en", 0) == 0
    if "zh" in totals:
        assert langs.get("zh", 0) == totals["zh"]  # rate 1.0 keeps all


def test_mix_corpora_weighted_union(spark, sf_dir):
    from machine_learning_with_spark_streaming_spark.operators.sampling import mix_corpora

    docs = load_table(spark, sf_dir, "documents")
    lo = docs.filter("doc_id % 2 = 0")
    hi = docs.filter("doc_id % 2 = 1")
    mixed = mix_corpora({"lo": (lo, 0.25), "hi": (hi, 1.0)})
    counts = {r["source"]: r["count"] for r in mixed.groupBy("source").count().collect()}
    assert counts["hi"] == hi.count()  # rate 1.0 keeps everything
    assert 0 < counts["lo"] < lo.count()
    # re-weighting nests: the 0.25 sample is a subset of the 0.5 sample
    wider = mix_corpora({"lo": (lo, 0.5), "hi": (hi, 1.0)})
    lo_ids = {r.doc_id for r in mixed.filter("source = 'lo'").collect()}
    lo_wider = {r.doc_id for r in wider.filter("source = 'lo'").collect()}
    assert lo_ids <= lo_wider
