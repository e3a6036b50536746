"""Property tests for the dedup operators (operators/dedup.py).

The injected corpus (corpus_with_duplicates) carries known ground truth:
- ids 25..49 have exact copies at id+200000 -> exact_dedup collapses them,
  and every near-dup method must report the pair (i, i+200000) at
  jaccard 1.0 / hamming 0.
- ids 0..24 have near copies at id+100000 (same text + ' zzz extra').
"""

from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.operators.dedup import (
    corpus_with_duplicates,
    exact_dedup,
    jaccard_pairs,
    md5_hash60,
    minhash_lsh_pairs,
    simhash_pairs,
)


def _exact_pairs(df):
    return {
        (r.id_a, r.id_b)
        for r in df.filter(F.col("id_a") + 200000 == F.col("id_b")).collect()
    }


EXPECTED_EXACT = {(i, i + 200000) for i in range(25, 50)}


def test_exact_dedup_collapses_copies(spark, sf_dir):
    corpus = corpus_with_duplicates(spark, sf_dir)
    out = exact_dedup(corpus)
    n_in = corpus.count()
    n_out = out.count()
    # 25 exact copies collapse; near copies (different text) survive
    assert n_in - n_out == 25
    dupes = out.filter(F.col("n_copies") > 1)
    assert {r.doc_id for r in dupes.collect()} == set(range(25, 50))


def test_jaccard_finds_exact_copies(spark, sf_dir):
    corpus = corpus_with_duplicates(spark, sf_dir)
    pairs = jaccard_pairs(corpus)
    assert _exact_pairs(pairs) == EXPECTED_EXACT
    # exact copies score jaccard == 1.0
    ones = pairs.filter(
        (F.col("id_a") + 200000 == F.col("id_b")) & (F.col("jaccard") == 1.0)
    )
    assert ones.count() == 25


def test_minhash_lsh_matches_exact_jaccard(spark, sf_dir):
    corpus = corpus_with_duplicates(spark, sf_dir)
    exact = {(r.id_a, r.id_b) for r in jaccard_pairs(corpus).collect()}
    lsh = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(corpus).collect()}
    # verification step gives precision 1.0; banding must not lose the
    # exact-copy pairs (identical signatures always share every band)
    assert lsh <= exact
    assert EXPECTED_EXACT <= lsh


def test_simhash_finds_exact_copies(spark, sf_dir):
    corpus = corpus_with_duplicates(spark, sf_dir)
    pairs = simhash_pairs(corpus)
    exact = pairs.filter(F.col("id_a") + 200000 == F.col("id_b"))
    rows = exact.collect()
    assert {(r.id_a, r.id_b) for r in rows} == EXPECTED_EXACT
    assert all(r.hamming == 0 for r in rows)


def test_simhash_md5_variant_finds_exact_copies(spark, sf_dir):
    # the DuckDB-checkable 60-bit md5 path must agree with the xxhash64
    # path on the unambiguous ground truth (exact copies: hamming 0)
    corpus = corpus_with_duplicates(spark, sf_dir)
    pairs = simhash_pairs(corpus, bits=60, hash_fn=md5_hash60)
    exact = pairs.filter(F.col("id_a") + 200000 == F.col("id_b")).collect()
    assert {(r.id_a, r.id_b) for r in exact} == EXPECTED_EXACT
    assert all(r.hamming == 0 for r in exact)


def test_exact_dedup_hash_path_equivalent(spark, sf_dir):
    corpus = corpus_with_duplicates(spark, sf_dir)
    plain = {(r.doc_id, r.n_copies) for r in exact_dedup(corpus).collect()}
    hashed = {
        (r.doc_id, r.n_copies)
        for r in exact_dedup(corpus, by_hash=True).collect()
    }
    assert plain == hashed


def test_decontaminate_drops_exactly_flagged_docs(spark, sf_dir):
    from machine_learning_with_spark_streaming_spark.operators.dedup import (
        contamination_report,
        decontaminate,
    )
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    flagged = {r.id for r in contamination_report(corpus, bench).collect()}
    kept = {r.doc_id for r in decontaminate(corpus, bench).collect()}
    all_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert kept == all_ids - flagged
    assert flagged  # the synthetic docs share vocabulary: some overlap

    # a doc is always contaminated by its own copy in the benchmark
    self_bench = corpus.limit(1)
    self_id = self_bench.collect()[0].doc_id
    assert self_id in {
        r.id for r in contamination_report(corpus, self_bench).collect()
    }


def test_decontaminate_empty_benchmark_keeps_everything(spark, sf_dir):
    from machine_learning_with_spark_streaming_spark.operators.dedup import decontaminate
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    empty = docs.filter(F.lit(False))
    assert decontaminate(docs, empty).count() == docs.count()
