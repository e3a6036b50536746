"""Partitioning-invariance sweep: a representative query slice must
produce the IDENTICAL normalized rowset under different
spark.sql.shuffle.partitions — the cheap local proxy for "same answer on
a 1000-executor cluster as on local[32]". Queries with any
partitioning-dependent nondeterminism (float sum order reaching the
output, undeterministic tie-breaks, per-partition RNG) fail this
immediately."""

import pytest

from machine_learning_with_spark_streaming_spark.testing import rowset

# One per engine area; chosen to cross a shuffle (agg/join/window/dedup/
# sampling/tokenize) so the partition count actually changes the plan.
SWEEP = [
    "flagship_demand_rollup",
    "w1_abc_classify",
    "a14_group_percentiles",
    "j10_asof_join",
    "dedup_minhash_lsh",
    "sample_weighted_mix",
    "text_perplexity_buckets",
    "text_subword_tokenize",
    "pipeline_rag_index",
    "pipeline_tokenize_pack",
    "v12_cdc_apply",
    "sample_negatives",
    "sample_length_batches",
    "sim_topk_multiprobe",
    "emb_centroid_drift",
    "v11_incremental_datasheet",
    # r4: the integer-nano ADC sum and the md5-bucket grid must be
    # partition-count-independent by construction — pin it
    "sim_pq_adc_topk",
    "sim_ivfpq_topk",
    "text_cms_heavy_hitters",
    "v14_histogram_drift",
]


@pytest.mark.parametrize("name", SWEEP)
def test_same_result_across_shuffle_partition_counts(spark, sf_dir, name):
    import __spark_entry__ as entry

    fn = entry.queries()[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        df_a = fn(spark, sf_dir)
        a = rowset(df_a.columns, df_a.collect())
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        df_b = fn(spark, sf_dir)
        b = rowset(df_b.columns, df_b.collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b, f"{name} result depends on shuffle partitioning"
    assert len(a) > 0
