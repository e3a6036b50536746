"""Property tests for similarity search, text analysis, and multimodal
operators (the LLM-data-pipeline suite). Oracle parity is covered by
tests/test_entry_contract.py; these assert the semantic invariants."""

import pytest
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.operators.multimodal import (
    assets_from_documents,
    decode_audio,
    decode_image,
    extract_features,
)
from machine_learning_with_spark_streaming_spark.operators.similarity import (
    topk_cosine,
    topk_cosine_bucketed,
)
from machine_learning_with_spark_streaming_spark.operators.text import (
    lang_id,
    quality_class,
    quality_features,
    token_counts,
)
from machine_learning_with_spark_streaming_spark.schemas import load_table


def test_topk_cosine_self_similarity(spark):
    # a vector duplicated under another id must rank itself #1 at cos 1.0
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [1.0, 1.0, 0.0]),
        (101, [1.0, 0.0, 0.0]),  # copy of 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = topk_cosine(df, df.filter(F.col("vec_id") == 1), k=3).collect()
    assert (out[0].neighbor_id, out[0].cos) == (101, 1.0)
    assert [r.rank for r in out] == [1, 2, 3]


def test_topk_cosine_excludes_self(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = topk_cosine(emb, emb.filter(F.col("vec_id") < 4), k=5)
    assert out.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0
    # exactly k rows per query, ranks 1..k
    per_q = out.groupBy("query_id").agg(
        F.count("*").alias("n"), F.max("rank").alias("mx")
    )
    assert all(r.n == 5 and r.mx == 5 for r in per_q.collect())


def test_bucketed_results_subset_of_corpus_bucket(spark, sf_dir):
    # bucketed ANN only returns neighbors from the query's bucket, and
    # its top-1 cos never exceeds the exact top-1 cos
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 4)
    exact = {
        r.query_id: r.cos for r in topk_cosine(emb, q, k=1).collect()
    }
    approx = {
        r.query_id: r.cos for r in topk_cosine_bucketed(emb, q, k=1).collect()
    }
    for qid, cos in approx.items():
        assert cos <= exact[qid] + 1e-9


def test_lang_id_real_language_samples(spark):
    rows = [
        (1, "the cat and the dog went to the park for a walk"),
        (2, "der hund und die katze sind nicht mit dem auto"),
        (3, "el perro y la casa de que un dia por la noche"),
        (4, "le chien et les chats du village pour une promenade"),
        (5, "xyzzy plugh qwerty"),  # no markers -> und
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.pred for r in df.select("doc_id", lang_id("text").alias("pred")).collect()}
    assert out == {1: "en", 2: "de", 3: "es", 4: "fr", 5: "und"}


def test_quality_features_ranges(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = quality_class(quality_features(docs))
    bad = out.filter(
        (F.col("punct_ratio") < 0)
        | (F.col("punct_ratio") > 1)
        | (F.col("stopword_ratio") < 0)
        | (F.col("stopword_ratio") > 1)
        | (F.col("n_words") <= 0)
        | F.col("quality").isNull()
    )
    assert bad.count() == 0


def test_token_counts_simple(spark):
    df = spark.createDataFrame([(1, "Hello, world! 42")], "doc_id long, text string")
    r = token_counts(df).collect()[0]
    assert r.ws_tokens == 3
    # hello , world ! 4 2  -> 6 BPE-ish tokens
    assert r.bpe_tokens == 6


def test_multimodal_feature_batch_shape(spark, sf_dir):
    assets = assets_from_documents(spark, sf_dir)
    feats = extract_features(assets)
    assert feats.count() == assets.count()
    r = feats.orderBy("asset_id").first()
    # payload is UTF-8 text; mean byte of printable ASCII is within range
    assert 32.0 <= r.mean_byte <= 127.0
    assert r.n_bytes > 0 and r.width >= 16 and r.height >= 16
    assert r.sampled_frames >= 1


def test_decode_dispatch_gates_compressed_formats():
    # compressed formats stay gated; BMP/WAV now decode for real
    # (tests/test_codecs.py), and truncated real-format payloads fail
    # with the parser's own error rather than the gate
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04")
    with pytest.raises(EOFError):
        decode_audio(b"RIFF")  # real wave parser rejects the stub header


def test_hyperplane_buckets_spread_correlated_vectors(spark):
    # all-positive leading dims: axis-aligned sign buckets collapse to a
    # single bucket (no candidate pruning), random hyperplanes still spread
    import numpy as np

    from machine_learning_with_spark_streaming_spark.functions.vectors import hyperplane_bucket, sign_bucket

    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((200, 64))
    vecs[:, :8] = np.abs(vecs[:, :8]) + 0.5  # correlated, strictly positive
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n_sign = df.select(sign_bucket("embedding", 4).alias("b")).distinct().count()
    n_hyper = df.select(hyperplane_bucket("embedding", 4).alias("b")).distinct().count()
    assert n_sign == 1  # the failure mode motivating random projections
    assert n_hyper >= 8  # most of the 16 buckets occupied

    # and the bucketed ANN still finds most true neighbors on this corpus
    q = df.filter(F.col("vec_id") < 8)
    exact = topk_cosine(df, q, k=5).select("query_id", "neighbor_id")
    approx = topk_cosine_bucketed(df, q, k=5).select("query_id", "neighbor_id")
    hits = exact.intersect(approx).count()
    # deterministic on the seeded corpus (0.175): a gaussian corpus has
    # weak true neighbors, so single-table 4-bit recall is modest — the
    # invariant is that it stays well above the 1/16 random-bucket rate
    assert hits / exact.count() >= 0.15


def test_ivf_pretrained_matches_contract(spark, sf_dir):
    # serving path: frozen centroids; injected duplicate surfaces at rank 1
    from machine_learning_with_spark_streaming_spark.operators.ivf import assign_cells, ivf_topk_pretrained
    from machine_learning_with_spark_streaming_spark.operators.similarity import embeddings_with_duplicates

    corpus = embeddings_with_duplicates(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 4)
    top1 = {
        r.query_id: (r.neighbor_id, r.cos)
        for r in ivf_topk_pretrained(corpus, queries, k=3).collect()
        if r.rank == 1
    }
    assert top1 == {q: (q + 100000, 1.0) for q in range(4)}
    # every vector lands in exactly one of the 16 frozen cells
    cells = assign_cells(corpus)
    assert cells.count() == corpus.count()
    assert cells.filter((F.col("cell") < 0) | (F.col("cell") > 15)).count() == 0


def test_ivf_topk_recovers_duplicates_and_ranks(spark, sf_dir):
    from machine_learning_with_spark_streaming_spark.operators.ivf import ivf_topk
    from machine_learning_with_spark_streaming_spark.operators.similarity import (
        embeddings_with_duplicates,
        topk_cosine,
    )

    corpus = embeddings_with_duplicates(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 4)
    got = ivf_topk(corpus, queries, k=3)
    rows = got.collect()
    # identical vectors share a cell, so each query's injected duplicate
    # must surface as rank 1 with cos 1.0
    top1 = {r.query_id: (r.neighbor_id, r.cos) for r in rows if r.rank == 1}
    assert top1 == {q: (q + 100000, 1.0) for q in range(4)}
    # ranks are 1..3 per query
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())
    # ANN top-1 never beats exact top-1
    exact1 = {
        r.query_id: r.cos
        for r in topk_cosine(corpus, queries, k=1).collect()
    }
    assert all(cos <= exact1[q] + 1e-9 for q, (_, cos) in top1.items())


def test_sample_frames_expansion(spark, sf_dir):
    from machine_learning_with_spark_streaming_spark.operators.multimodal import (
        FRAME_SAMPLE_EVERY,
        sample_frames,
    )

    assets = assets_from_documents(spark, sf_dir)
    frames = sample_frames(assets)
    videos = assets.filter(F.col("kind") == "video").select(
        "asset_id", F.col("meta.n_frames").alias("n_frames")
    )
    # cardinality: ceil(n_frames / every) rows per video
    expected = videos.select(
        F.ceil(F.col("n_frames") / FRAME_SAMPLE_EVERY).alias("n")
    ).agg(F.sum("n")).first()[0]
    assert frames.count() == expected
    r = frames.orderBy("asset_id", "frame_idx").first()
    assert r.frame_idx == 0 and r.frame_offset == 0
    assert 32.0 <= r.frame_mean_byte <= 127.0
    # frame indices step by the sampling stride
    bad = frames.filter(F.col("frame_idx") % FRAME_SAMPLE_EVERY != 0)
    assert bad.count() == 0


def test_llm_data_prep_pipeline_invariants(spark, sf_dir):
    from machine_learning_with_spark_streaming_spark.operators.dedup import corpus_with_duplicates
    from machine_learning_with_spark_streaming_spark.operators.text import llm_data_prep

    corpus = corpus_with_duplicates(spark, sf_dir)
    out = llm_data_prep(corpus)
    rows = out.select("doc_id", "quality").collect()
    ids = [r.doc_id for r in rows]
    # exact copies (id+200000) deduplicate away — the min-id original wins
    assert not any(i >= 200000 for i in ids)
    # near copies (' zzz extra' suffix) are not exact dups and survive
    assert any(100000 <= i < 200000 for i in ids)
    # the quality gate ran before dedup
    assert all(r.quality != "junk" for r in rows)
    assert len(ids) == len(set(ids))


def test_repetition_features_constructed(spark):
    from machine_learning_with_spark_streaming_spark.operators.text import (
        repetition_features,
        repetition_gate,
    )

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # one word repeated
            # 26 distinct words: top bigram share 1/25 stays under the
            # 0.05 gate (short distinct docs have high shares by n-1 math)
            (2, " ".join(chr(c) for c in range(ord("a"), ord("z") + 1))),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in repetition_gate(repetition_features(docs)).collect()
    }
    assert out[1]["dup_word_ratio"] == 0.75
    assert out[1]["top_word_ratio"] == 1.0
    assert out[1]["top_bigram_ratio"] == 1.0
    assert out[1]["repetitive"] == 1
    assert out[2]["dup_word_ratio"] == 0.0
    assert out[2]["top_bigram_ratio"] == 0.04  # 1/25
    assert out[2]["repetitive"] == 0


def test_pii_counts_and_redaction(spark):
    from machine_learning_with_spark_streaming_spark.operators.pii import (
        pii_counts,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "mail a.b@x.io call 555-123-4567 ip 10.0.0.1 ssn 123-45-6789"),
            (2, "clean text with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    counted = {r["doc_id"]: r.asDict() for r in pii_counts(df).collect()}
    assert (
        counted[1]["n_email"],
        counted[1]["n_phone"],
        counted[1]["n_ipv4"],
        counted[1]["n_ssn"],
    ) == (1, 1, 1, 1)
    assert sum(counted[2][f"n_{k}"] for k in ("email", "phone", "ipv4", "ssn")) == 0

    red = {
        r["doc_id"]: r["red"]
        for r in df.select("doc_id", redact_pii("text").alias("red")).collect()
    }
    assert red[1] == "mail [EMAIL] call [PHONE] ip [IPV4] ssn [SSN]"
    assert red[2] == "clean text with no identifiers at all"


def test_repetition_expr_equals_explode(spark, sf_dir):
    from machine_learning_with_spark_streaming_spark.operators.text import repetition_features
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = {tuple(r) for r in repetition_features(docs, method="expr").collect()}
    b = {tuple(r) for r in repetition_features(docs, method="explode").collect()}
    assert a == b and a


def test_quantize_int8_bounds_and_reconstruction(spark, sf_dir):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.similarity import quantize_int8
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    q = quantize_int8(emb).localCheckpoint(eager=True)
    # codes stay inside the int8 range
    bounds = q.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
    ).first()
    assert bounds["lo"] >= -127 and bounds["hi"] <= 127
    # per-element reconstruction error is at most scale/2, so
    # mse <= scale^2/4 (floor(x/s + .5) is nearest-int up to ties)
    bad = q.filter(
        F.col("recon_mse") > (F.col("scale") ** 2) / 4 + F.lit(1e-18)
    ).count()
    assert bad == 0


def test_quantize_int8_zero_vector(spark):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -1.0, 0.5])],
        "vec_id bigint, embedding array<double>",
    )
    q = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert list(q[1]["codes"]) == [0, 0, 0]
    assert q[1]["recon_mse"] == 0.0
    assert list(q[2]["codes"]) == [127, -127, 64]


def test_perplexity_buckets_tercile_shape(spark, sf_dir):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.text import perplexity_buckets
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    out = perplexity_buckets(docs).localCheckpoint(eager=True)
    # ntile terciles: per-lang bucket sizes differ by at most 1
    sizes = (
        out.groupBy("lang", "bucket").count().groupBy("lang")
        .agg((F.max("count") - F.min("count")).alias("spread"))
        .collect()
    )
    assert all(r["spread"] <= 1 for r in sizes)
    # head outranks tail on mean log-prob within every language
    m = {
        (r["lang"], r["bucket"]): r["s"]
        for r in out.groupBy("lang", "bucket")
        .agg(F.avg("avg_logprob").alias("s"))
        .collect()
    }
    for lang in {k[0] for k in m}:
        assert m[(lang, "head")] > m[(lang, "tail")]


def test_dsir_importance_sign(spark):
    from machine_learning_with_spark_streaming_spark.operators.text import dsir_importance

    # Target docs are all-"alpha"; the off-domain doc is all-"omega".
    # Under target-vs-corpus unigram models, words the target favors get a
    # positive log-ratio and target-absent words a negative one.
    df = spark.createDataFrame(
        [
            (1, "alpha alpha alpha alpha", "tgt"),
            (2, "alpha alpha alpha alpha", "tgt"),
            (3, "omega omega omega omega", "other"),
        ],
        "doc_id long, text string, domain string",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_importance(df, F.col("domain") == "tgt").collect()
    }
    assert out[1]["n_words"] == 4
    assert out[1]["avg_log_ratio"] == out[2]["avg_log_ratio"]
    assert out[1]["avg_log_ratio"] > 0 > out[3]["avg_log_ratio"]


def test_dsir_importance_oov_finite(spark):
    from machine_learning_with_spark_streaming_spark.operators.text import dsir_importance

    # A word the target never emits must still score finite (Laplace).
    df = spark.createDataFrame(
        [(1, "a b", True), (2, "zzz zzz", False)],
        "doc_id long, text string, is_t boolean",
    )
    rows = dsir_importance(df, F.col("is_t")).collect()
    assert all(r["avg_log_ratio"] is not None for r in rows)


def test_ann_recall_full_probe_is_exact(spark, sf_dir):
    from machine_learning_with_spark_streaming_spark.operators.ivf import (
        N_CELLS,
        ann_recall_report,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4)
    # probing every cell makes IVF exhaustive == brute force
    full = ann_recall_report(emb, queries, nprobe=N_CELLS).collect()
    assert len(full) == 4
    assert all(r["recall_at_5"] == 1.0 and r["n_hits"] == 5 for r in full)
    # default nprobe: recall is a valid fraction of k
    part = ann_recall_report(emb, queries).collect()
    assert all(0.0 <= r["recall_at_5"] <= 1.0 and r["n_hits"] <= 5 for r in part)


def test_semdedup_keeps_one_per_ball(spark):
    from machine_learning_with_spark_streaming_spark.operators.ivf import semdedup

    # Two identical vectors + one distant: the ε-ball keeps exactly one
    # member (tie on centroid_sim → lower id wins); the distant vector
    # is untouched.
    base = [1.0] + [0.0] * 63
    far = [0.0] * 63 + [1.0]
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, far)],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in semdedup(df).collect()}
    assert out[1]["keep"] == 1
    assert out[2]["keep"] == 0
    assert out[3]["keep"] == 1
    assert out[1]["cluster"] == out[2]["cluster"]


def test_key_skew_report_shares_and_nulls(spark):
    from machine_learning_with_spark_streaming_spark.operators.skew import key_skew_report

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 2 + [(None,)] * 4,
        "k string",
    )
    rows = key_skew_report(df, "k", top_n=2).collect()
    assert [r["key"] for r in rows] == ["a", None]
    assert [r["rank"] for r in rows] == [1, 2]
    assert rows[0]["cnt"] == 6 and rows[0]["share"] == 0.5
    # 3 distinct keys, 12 rows -> mean 4; 'a' runs 1.5x the average reducer
    assert rows[0]["x_avg"] == 1.5


def test_segment_dedup_rewrites_documents(spark):
    from machine_learning_with_spark_streaming_spark.operators.text import segment_dedup

    # doc 1 = two segments AB; doc 2 = exact copy (loses everything);
    # doc 3 = B + new tail C (keeps only C); seg width 2 words.
    a, b, c = "aa bb", "cc dd", "ee ff"
    df = spark.createDataFrame(
        [(1, f"{a} {b}"), (2, f"{a} {b}"), (3, f"{b} {c}")],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in segment_dedup(df, seg_words=2).collect()}
    assert (out[1]["n_kept"], out[1]["clean_text"]) == (2, f"{a} {b}")
    assert (out[2]["n_kept"], out[2]["clean_text"]) == (0, "")
    assert (out[3]["n_kept"], out[3]["clean_text"]) == (1, c)
    assert out[3]["n_dropped"] == 1


def test_segment_dedup_within_doc_repeat(spark):
    from machine_learning_with_spark_streaming_spark.operators.text import segment_dedup

    # the same segment repeated inside ONE doc keeps only its first
    # occurrence (min seg_idx)
    df = spark.createDataFrame(
        [(7, "xx yy xx yy zz")], "doc_id long, text string"
    )
    row = segment_dedup(df, seg_words=2).collect()[0]
    assert row["n_seg"] == 3 and row["n_kept"] == 2
    assert row["clean_text"] == "xx yy zz"


def test_hashed_quality_classifier_distillation_fidelity(spark, sf_dir):
    from machine_learning_with_spark_streaming_spark.operators.text import (
        hashed_quality_score,
        quality_class,
        quality_features,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    truth = {
        r["doc_id"]: r["quality"] == "good"
        for r in quality_class(quality_features(docs)).collect()
    }
    pred = {
        r["id"]: bool(r["pred_good"])
        for r in hashed_quality_score(docs).collect()
    }
    agree = sum(pred[d] == truth[d] for d in truth) / len(truth)
    # distilled from the rule gate at sf0.01 (0.998 train acc); held-out
    # sf0.001 docs must still agree far above the base rate
    assert agree >= 0.9


def test_hashed_quality_score_partitioning_invariant(spark):
    from machine_learning_with_spark_streaming_spark.operators.text import hashed_quality_score

    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog for it is that"),
         (2, "qqq www eee rrr ttt yyy uuu")],
        "doc_id long, text string",
    )
    a = {r["id"]: tuple(r) for r in hashed_quality_score(df).collect()}
    b = {
        r["id"]: tuple(r)
        for r in hashed_quality_score(df.repartition(7)).collect()
    }
    # BIGINT micro-weight sums: bit-identical under any partitioning
    assert a == b


def test_l2_normalize_unit_and_zero(spark):
    from machine_learning_with_spark_streaming_spark.operators.similarity import l2_normalize

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in l2_normalize(df).collect()}
    assert out[1]["unit"] == [0.6, 0.8] and out[1]["unit_norm"] == 5.0
    # zero vector: norm nullif -> NULL unit, no div-by-zero
    assert out[2]["unit_norm"] is None
    assert out[2]["unit"] is None or all(x is None for x in out[2]["unit"])


def test_group_centroids_mean(spark):
    from machine_learning_with_spark_streaming_spark.operators.similarity import group_centroids

    df = spark.createDataFrame(
        [(0, [1.0, 10.0]), (0, [3.0, 30.0]), (1, [5.0, 7.0])],
        "label int, embedding array<double>",
    )
    got = {
        (r["grp"], r["pos"]): (r["n"], r["centroid"])
        for r in group_centroids(df, "label").collect()
    }
    assert got[(0, 0)] == (2, 2.0) and got[(0, 1)] == (2, 20.0)
    assert got[(1, 0)] == (1, 5.0) and got[(1, 1)] == (1, 7.0)


def test_bpe_pair_counts_word_frequency_weighting(spark):
    from machine_learning_with_spark_streaming_spark.operators.text import bpe_pair_counts

    # "ab" x3 (docs) + "abc" x1 -> pair 'ab' = 4, 'bc' = 1; single-char
    # word 'z' contributes nothing
    df = spark.createDataFrame(
        [(1, "ab ab z"), (2, "ab abc")], "doc_id long, text string"
    )
    got = {r["pair"]: r["n"] for r in bpe_pair_counts(df).collect()}
    assert got == {"ab": 4, "bc": 1}


def test_retrieve_documents_snippet_join(spark):
    from machine_learning_with_spark_streaming_spark.operators.similarity import retrieve_documents

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    docs = spark.createDataFrame(
        [(1, "Doc  One"), (2, "Doc Two"), (3, "Doc Three")],
        "doc_id long, text string",
    )
    out = retrieve_documents(
        emb, emb.filter(F.col("vec_id") == 1), docs, k=2
    ).orderBy("rank").collect()
    assert [r["doc_id"] for r in out] == [2, 3]
    assert out[0]["snippet"] == "doc two"  # normalized text


def test_bigram_logprob_conditional(spark):
    import math

    from machine_learning_with_spark_streaming_spark.operators.text import bigram_logprob

    # corpus bigrams: "a b" x2, "a c" x1, "b a" x1, "c a" x1 (via two docs)
    # P(b|a)=2/3, P(c|a)=1/3, P(a|b)=1, P(a|c)=1
    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    # doc 2: one bigram "a b" -> ln(2/3)
    assert out[2]["n_bigrams"] == 1
    assert abs(out[2]["avg_logprob"] - round(math.log(2 / 3), 4)) < 1e-9
    # doc 1: bigrams a b, b a, a c -> mean(ln 2/3, ln 1, ln 1/3)
    want = (math.log(2 / 3) + 0.0 + math.log(1 / 3)) / 3
    assert abs(out[1]["avg_logprob"] - round(want, 4)) < 1e-3


def test_bigram_logprob_short_docs_absent(spark):
    from machine_learning_with_spark_streaming_spark.operators.text import bigram_logprob

    df = spark.createDataFrame(
        [(1, "solo"), (2, "two words")], "doc_id long, text string"
    )
    ids = {r["doc_id"] for r in bigram_logprob(df).collect()}
    assert ids == {2}


def test_rag_index_topk_matches_python_replay(spark):
    """The hashed-projection index + cosine ranking must equal a pure
    Python replay of the same hashing trick (bucket/sign from md5),
    including tie-breaks — on a corpus small enough to enumerate."""
    import hashlib
    import math

    from machine_learning_with_spark_streaming_spark.operators.similarity import (
        RAG_DIM,
        rag_index_topk,
    )

    docs = [
        (1, "alpha beta gamma delta"),
        (2, "alpha alpha beta beta"),
        (3, "epsilon zeta eta theta"),
        (4, "alpha beta"),
    ]
    query = "alpha beta"

    def h60(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16)

    def emb(ws):
        v = [0] * RAG_DIM
        for w in ws:
            v[h60(w) % RAG_DIM] += (h60(w + "#s") % 2) * 2 - 1
        return v

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    qv = emb(query.split())
    # every doc here is shorter than CHUNK_STRIDE -> exactly one chunk
    expect = sorted(
        ((round(cos(emb(t.split()), qv), 6), d) for d, t in docs),
        key=lambda x: (-x[0], x[1]),
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = rag_index_topk(df, query=query, k=3).collect()
    assert [(r.doc_id, r.chunk_idx) for r in got] == [
        (d, 0) for _c, d in expect[:3]
    ]
    assert [r.cosine for r in got] == [c for c, _d in expect[:3]]
    assert [r.rank for r in got] == [1, 2, 3]


def test_datasheet_sketch_merge_equals_full_recompute(spark):
    """finalize(merge(sketch(A), sketch(B))) == finalize(sketch(A∪B)),
    including the cross-part duplicate (same text in both halves) that
    only the merged hash fingerprints can count correctly."""
    from machine_learning_with_spark_streaming_spark.operators.text import (
        datasheet_sketch,
        finalize_datasheet,
        merge_sketches,
    )

    rows_a = [(1, "en", "s1", "alpha beta"), (2, "de", "s2", "gamma")]
    rows_b = [(3, "en", "s1", "alpha beta"), (4, "fr", "s3", "x " * 600)]
    schema = "doc_id long, lang string, source string, text string"
    a, b = spark.createDataFrame(rows_a, schema), spark.createDataFrame(rows_b, schema)
    both = spark.createDataFrame(rows_a + rows_b, schema)
    merged = {
        r.metric: r.value
        for r in finalize_datasheet(
            merge_sketches(datasheet_sketch(a), datasheet_sketch(b))
        ).collect()
    }
    full = {
        r.metric: r.value
        for r in finalize_datasheet(datasheet_sketch(both)).collect()
    }
    assert merged == full
    assert merged["n_docs"] == 4.0
    assert merged["n_langs"] == 3.0 and merged["n_sources"] == 3.0
    assert merged["exact_dup_rate"] == 0.25  # doc 3 duplicates doc 1 ACROSS parts
    assert merged["hist_2"] == 1.0  # the 1200-char doc lands in bin 2


def test_multiprobe_recall_dominates_single_bucket(spark):
    """On the correlated corpus where single-bucket sign-LSH recall is
    modest, probing the 4 Hamming-1 buckets must strictly improve
    recall@5 (and can never hurt: the probe set is a superset)."""
    import numpy as np

    from machine_learning_with_spark_streaming_spark.operators.similarity import (
        topk_cosine,
        topk_cosine_bucketed,
        topk_cosine_multiprobe,
    )

    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((200, 64))
    vecs[:, :8] = np.abs(vecs[:, :8]) + 0.5
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 8)
    exact = topk_cosine(df, q, k=5).select("query_id", "neighbor_id")
    single = topk_cosine_bucketed(df, q, k=5).select("query_id", "neighbor_id")
    multi = topk_cosine_multiprobe(df, q, k=5).select("query_id", "neighbor_id")
    r_single = exact.intersect(single).count() / exact.count()
    r_multi = exact.intersect(multi).count() / exact.count()
    assert r_multi > r_single  # deterministic on the seeded corpus
    assert r_multi >= 0.5  # 5 of 16 buckets probed recovers most neighbors


def test_datasheet_null_text_counts_like_oracle(spark, oracle_con):
    """NULL-text docs: Spark xxhash64 hashes NULL to the seed (a real
    fingerprint) while SQL count(DISTINCT ...) drops NULL — the two
    engines diverged on exact_dup_rate until both sides coalesce text
    to '' (r3 advice finding). Pin the coalesced semantics on a corpus
    with a NULL-text doc AND an empty-text doc: they count as
    duplicates of each other, identically in both engines."""
    import duckdb

    from machine_learning_with_spark_streaming_spark.operators.text import (
        corpus_datasheet,
        datasheet_sketch,
        finalize_datasheet,
    )

    rows = [
        (1, "en", "s1", "alpha"),
        (2, "en", "s1", None),
        (3, "de", "s2", ""),
        (4, "fr", "s1", "alpha"),
    ]
    schema = "doc_id long, lang string, source string, text string"
    df = spark.createDataFrame(rows, schema)
    # NULL('') and '' collapse to one fingerprint; 'alpha' twice ->
    # n_uniq = 2 of 4 docs -> dup rate 0.5 in BOTH paths
    ds = {r.metric: r.value for r in corpus_datasheet(df).collect()}
    assert ds["exact_dup_rate"] == 0.5
    sk = {
        r.metric: r.value
        for r in finalize_datasheet(datasheet_sketch(df)).collect()
    }
    assert sk["exact_dup_rate"] == 0.5
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, lang VARCHAR, source VARCHAR,"
        " text VARCHAR)"
    )
    con.executemany("INSERT INTO d VALUES (?, ?, ?, ?)", rows)
    (oracle_rate,) = con.execute(
        "SELECT round(1.0 - CAST(count(DISTINCT coalesce("
        "lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ''))"
        " AS DOUBLE) / count(*), 6) FROM d"
    ).fetchone()
    con.close()
    assert oracle_rate == 0.5


def test_pq_encode_exact_on_centroid_vectors(spark):
    """A vector assembled from one codebook centroid per subspace must
    encode to exactly those codes (distance 0 each), and ADC must rank
    an exact-centroid twin of the query at the top with adc_nano 0."""
    from machine_learning_with_spark_streaming_spark.functions.pq_artifacts import (
        PQ_CODEBOOK,
        PQ_K,
        PQ_M,
    )
    from machine_learning_with_spark_streaming_spark.operators.pq import pq_adc_topk, pq_encode

    def assemble(codes):
        v = []
        for m, c in enumerate(codes):
            v.extend(PQ_CODEBOOK[m][c])
        return v

    rows = [
        (0, assemble([2] * PQ_M)),       # query
        (1, assemble([2] * PQ_M)),       # exact twin -> adc 0
        (2, assemble([5] * PQ_M)),       # different cell everywhere
        (3, assemble(list(range(PQ_M)))),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes = {
        (r.id, r.m): r.code for r in pq_encode(df).collect()
    }
    assert all(codes[(1, m)] == 2 for m in range(PQ_M))
    assert all(codes[(2, m)] == 5 for m in range(PQ_M))
    assert all(codes[(3, m)] == m for m in range(PQ_M))
    assert all(0 <= c < PQ_K for c in codes.values())
    top = pq_adc_topk(df, query_id=0, k=3).collect()
    assert top[0].neighbor_id == 1 and top[0].adc_nano == 0
    assert [r.rank for r in top] == [1, 2, 3]


def test_pq_codes_complete_and_in_range(spark, sf_dir):
    """Every corpus vector gets exactly M codes, all in [0, K)."""
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.functions.pq_artifacts import PQ_K, PQ_M
    from machine_learning_with_spark_streaming_spark.operators.pq import pq_encode

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    codes = pq_encode(emb)
    stats = codes.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("id").alias("ids"),
        F.min("code").alias("lo"),
        F.max("code").alias("hi"),
    ).collect()[0]
    assert stats.rows == n * PQ_M and stats.ids == n
    assert 0 <= stats.lo and stats.hi < PQ_K


def test_cms_merge_equals_full_and_always_overestimates(spark):
    """CMS contract: (1) cell-wise sum of two part-sketches equals the
    full-corpus sketch; (2) estimates never undercount (only
    collisions inflate); (3) a token with no collisions estimates
    exactly."""
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.sketch import (
        cms_estimate,
        cms_sketch,
    )

    rows = [("alpha", 100), ("beta", 40), ("gamma", 7), ("delta", 1)]
    counts = spark.createDataFrame(rows, "token string, cnt long")
    a = counts.filter(F.col("cnt") >= 10)
    b = counts.filter(F.col("cnt") < 10)
    merged = (
        cms_sketch(a)
        .unionByName(cms_sketch(b))
        .groupBy("r", "bucket")
        .agg(F.sum("value").cast("long").alias("value"))
    )
    full = cms_sketch(counts)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in full.collect()
    }
    est = {
        r.token: r.est
        for r in cms_estimate(full, counts.select("token")).collect()
    }
    exact = dict(rows)
    assert all(est[t] >= exact[t] for t in exact)
    # 4 tokens in a 4x64 grid: expect at least one collision-free token
    assert any(est[t] == exact[t] for t in exact)


def test_pq_encode_refuses_malformed_vectors(spark):
    """NULL and wrong-dimension embeddings must fail the job with a
    clear message (NULL distances would otherwise all tie and silently
    fabricate code 0 everywhere)."""
    import pytest

    from machine_learning_with_spark_streaming_spark.operators.pq import pq_encode

    for bad in [None, [0.1] * 8]:
        df = spark.createDataFrame(
            [(1, bad), (2, [0.1] * 64)], "vec_id long, embedding array<float>"
        )
        with pytest.raises(Exception, match="pq_encode: embedding"):
            pq_encode(df).collect()


def test_ivfpq_equals_adc_on_probed_cells(spark, sf_dir):
    """IVF-PQ must equal brute PQ-ADC restricted to the probed cells'
    members (pruning changes the candidate set, nothing else), and at
    nprobe = all cells it must equal full PQ-ADC exactly."""
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.functions.artifacts import IVF_CENTROIDS
    from machine_learning_with_spark_streaming_spark.operators.ivf import assign_cells
    from machine_learning_with_spark_streaming_spark.operators.pq import ivfpq_topk, pq_adc_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_cells = len(IVF_CENTROIDS)
    full = [tuple(r) for r in pq_adc_topk(emb).collect()]
    allprobe = [tuple(r) for r in ivfpq_topk(emb, nprobe=n_cells).collect()]
    assert allprobe == full

    pruned = ivfpq_topk(emb, nprobe=1).collect()
    # every pruned-path neighbor must be a member of the query's own
    # cell (nprobe=1 -> only that cell is probed)
    cells = {r.id: r.cell for r in assign_cells(emb).select("id", "cell").collect()}
    qcell = cells[0]
    assert pruned and all(cells[r.neighbor_id] == qcell for r in pruned)
    # and scores must agree with the full ADC scores for shared ids
    full_scores = {r[1]: r[2] for r in full}
    for r in pruned:
        if r.neighbor_id in full_scores:
            assert r.adc_nano == full_scores[r.neighbor_id]


def test_pq_adc_many_matches_single_and_streams(spark, sf_dir, tmp_path):
    """Multi-query ADC serving: (1) per-query results equal the
    single-query path; (2) a REAL 4-micro-batch stream of query
    vectors scored per batch against the static code table unions to
    exactly the all-at-once batch answer (stateless serving)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.pq import (
        pq_adc_topk,
        pq_adc_topk_many,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 8)
    many = pq_adc_topk_many(emb, queries, k=5)
    single0 = [
        (r.rank, r.neighbor_id, r.adc_nano)
        for r in pq_adc_topk(emb, query_id=0, k=5).collect()
    ]
    got0 = sorted(
        (r.rank, r.neighbor_id, r.adc_nano)
        for r in many.filter(F.col("query_id") == 0).collect()
    )
    assert got0 == sorted(single0)

    expected = {tuple(r) for r in many.collect()}
    stage = tmp_path / "qstage"
    stage.mkdir()
    for i in range(4):
        part = queries.filter(
            (F.col("vec_id") >= i * 2) & (F.col("vec_id") < (i + 1) * 2)
        )
        tmp = str(tmp_path / f"t{i}")
        part.coalesce(1).write.parquet(tmp)
        shutil.copyfile(
            glob.glob(f"{tmp}/part-*.parquet")[0], str(stage / f"{i:02d}.parquet")
        )
    out_dir = str(tmp_path / "results")
    spark.createDataFrame(
        [], "query_id bigint, rank int, neighbor_id bigint, adc_nano bigint"
    ).write.parquet(out_dir)

    def sink(batch_df, _id):
        if batch_df.isEmpty():
            return
        pq_adc_topk_many(emb, batch_df, k=5).write.mode("append").parquet(
            out_dir
        )

    q = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    assert streamed == expected


def test_cms_maintained_by_ingest_stream(spark, tmp_path):
    """The CMS grid maintained BY INGEST: each micro-batch sketches its
    token counts and cell-wise-merges into a stored grid; after a REAL
    4-batch run the stored grid equals the batch build over the whole
    corpus — the mergeable-summary contract that lets a 100 TB ingest
    keep frequency estimates without a vocabulary join."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.sketch import cms_sketch
    from machine_learning_with_spark_streaming_spark.operators.text import words

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} common word{i % 11}") for i in range(40)],
        "doc_id long, text string",
    )
    stage = tmp_path / "stage"
    stage.mkdir()
    for i in range(4):
        part = docs.filter(
            (F.col("doc_id") >= i * 10) & (F.col("doc_id") < (i + 1) * 10)
        )
        tmp = str(tmp_path / f"t{i}")
        part.coalesce(1).write.parquet(tmp)
        shutil.copyfile(
            glob.glob(f"{tmp}/part-*.parquet")[0],
            str(stage / f"{i:02d}.parquet"),
        )
    grid_dir = str(tmp_path / "grid")
    spark.createDataFrame([], "r int, bucket bigint, value bigint").write.parquet(
        grid_dir
    )

    def sink(batch_df, _id):
        ss = batch_df.sparkSession
        counts = (
            batch_df.select(F.explode(words("text")).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        merged = (
            ss.read.parquet(grid_dir)
            .unionByName(cms_sketch(counts))
            .groupBy("r", "bucket")
            .agg(F.sum("value").cast("long").alias("value"))
            .localCheckpoint(eager=True)
        )
        merged.write.mode("overwrite").parquet(grid_dir)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    full_counts = (
        docs.select(F.explode(words("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    expected = {tuple(r) for r in cms_sketch(full_counts).collect()}
    got = {tuple(r) for r in spark.read.parquet(grid_dir).collect()}
    assert got == expected


def test_cdc_segments_survive_a_prefix_insertion(spark):
    """The point of content-defined chunking: duplicate content behind
    a small edit still dedups. doc 2 = three inserted words + doc 1's
    exact text; rolling-hash boundaries re-align after the edit so most
    of doc 2 drops, while fixed-width segmentation (segment_dedup)
    shifts every segment and keeps nearly everything. Also pins the
    rewrite invariants: survivors reassemble in order from original
    words, and a clean corpus is untouched."""
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.text import (
        cdc_segment_dedup,
        segment_dedup,
    )

    base = " ".join(f"w{(i * 13) % 97}x{i % 7}" for i in range(160))
    rows = [(1, base), (2, "alpha beta gamma " + base)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    cdc = {r.id: r for r in cdc_segment_dedup(df).collect()}
    fixed = {r.id: r for r in segment_dedup(df).collect()}
    # doc 1 is the keeper: everything survives in both schemes
    assert cdc[1].n_dropped == 0 and fixed[1].n_dropped == 0
    # CDC: the shared suffix re-aligns -> most of doc 2 drops
    assert cdc[2].n_dropped >= cdc[2].n_seg // 2, (
        cdc[2].n_seg, cdc[2].n_dropped
    )
    # fixed-width: the 3-word shift breaks every segment alignment
    assert fixed[2].n_dropped == 0
    # rewrite invariant: doc 2's survivors are a subsequence of its words
    doc2_words = ("alpha beta gamma " + base).split()
    kept_words = cdc[2].clean_text.split()
    it = iter(doc2_words)
    assert all(w in it for w in kept_words)  # subsequence check
    # determinism
    again = {r.id: r for r in cdc_segment_dedup(df).collect()}
    assert {(-r.n_seg, r.n_kept, r.clean_text) for r in cdc.values()} == {
        (-r.n_seg, r.n_kept, r.clean_text) for r in again.values()
    }
