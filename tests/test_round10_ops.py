"""Round-10 additions: the Arrow exact-rescore stage for IVF serving,
the stored cell-partitioned serving query (partition pruning
plan-asserted), and the argmax_assign NULL-element contract."""

from __future__ import annotations


def test_exact_rescore_matches_jvm_fold(spark):
    """The Arrow/numpy pair rescore is IEEE-identical to the JVM
    ``zip_with``+``aggregate`` cosine fold it replaced, on a seeded
    random pair table — including precomputed-vs-inline candidate
    norms (both arms bit-equal)."""
    import random

    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.functions.vectors import (
        as_double_array,
        cosine_similarity,
        norm,
    )
    from machine_learning_with_spark_streaming_spark.operators.ivf import exact_rescore

    rng = random.Random(77)
    dim, n = 16, 250
    rows = [
        (
            i,
            i + 1000,
            [rng.uniform(-1, 1) for _ in range(dim)],
            [rng.uniform(-1, 1) for _ in range(dim)],
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows,
        "query_id long, neighbor_id long, "
        "qv array<float>, cv array<float>",
    ).select(
        "query_id",
        "neighbor_id",
        as_double_array("qv").alias("qv"),
        as_double_array("cv").alias("v"),
    )

    ref = {
        r["query_id"]: r["cos"]
        for r in df.select(
            "query_id",
            cosine_similarity(F.col("qv"), F.col("v")).alias("cos"),
        ).collect()
    }

    inline = {
        r["query_id"]: r["cos"]
        for r in exact_rescore(
            df, keep_cols=["query_id", "neighbor_id"], dim=dim
        ).collect()
    }
    pre = {
        r["query_id"]: r["cos"]
        for r in exact_rescore(
            df.withColumn("vnorm", norm(F.col("v"))),
            keep_cols=["query_id", "neighbor_id"],
            dim=dim,
            vnorm_col="vnorm",
        ).collect()
    }
    assert len(inline) == n and len(pre) == n
    for qid, want in ref.items():
        assert inline[qid] == want, (qid, inline[qid], want)  # bit-equal
        assert pre[qid] == want, (qid, pre[qid], want)  # bit-equal


def test_exact_rescore_null_contract(spark):
    """Zero vectors, NULL vectors, wrong-length vectors and vectors
    with a NULL element all rescore to NULL (the engine-NULL contract
    shared with argmax_assign) — never NaN, never a crash."""
    from machine_learning_with_spark_streaming_spark.operators.ivf import exact_rescore

    dim = 4
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]),  # zero cand
        (2, [1.0, 0.0, 0.0, 0.0], None),  # NULL cand
        (3, [1.0, 0.0, 0.0, 0.0], [1.0, 2.0]),  # wrong length
        (4, [1.0, 0.0, 0.0, 0.0], [1.0, None, 0.0, 0.0]),  # NULL element
        (5, [0.0, 0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]),  # zero query
        (6, [1.0, 0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]),  # clean pair
    ]
    df = spark.createDataFrame(
        rows, "query_id long, qv array<double>, v array<double>"
    )
    out = {
        r["query_id"]: r["cos"]
        for r in exact_rescore(df, keep_cols=["query_id"], dim=dim).collect()
    }
    assert out[6] == 1.0
    for qid in (1, 2, 3, 4, 5):
        assert out[qid] is None, (qid, out[qid])


def test_argmax_assign_null_element_is_zero_vector(spark):
    """A NULL element inside a correct-length embedding takes the
    zero-vector path: cell 0, NULL similarity, norm 0 — matching the
    JVM window form (NULL dot for every centroid) instead of numpy's
    NaN propagation (r9 ADVICE item)."""
    from machine_learning_with_spark_streaming_spark.operators.ivf import argmax_assign

    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (0, [1.0, None]),
        (1, [None, None]),
        (2, [0.0, 0.0]),
        (3, [3.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["id"]: r
        for r in argmax_assign(
            df, cents, cell_col="cell", sim_col="csim", norm_col="vnorm"
        ).collect()
    }
    for vid in (0, 1, 2):
        assert out[vid]["cell"] == 0 and out[vid]["csim"] is None
        assert out[vid]["vnorm"] == 0.0
    assert out[3]["cell"] == 1 and out[3]["csim"] == 0.8
    assert out[3]["vnorm"] == 5.0


def test_assign_norm_col_matches_jvm_norm(spark):
    """The write-time norm column is bit-equal to the JVM sqrt-of-fold
    ``norm()`` expression for a seeded random corpus."""
    import random

    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.functions.vectors import (
        as_double_array,
        norm,
    )
    from machine_learning_with_spark_streaming_spark.operators.ivf import assign_cells

    rng = random.Random(42)
    dim, n = len(_ivf_dim_probe()), 200
    rows = [(i, [rng.uniform(-2, 2) for _ in range(dim)]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    fast = {
        r["id"]: r["vnorm"]
        for r in assign_cells(df, norm_col="vnorm").collect()
    }
    ref = {
        r["vec_id"]: r["n"]
        for r in df.select(
            "vec_id", norm(as_double_array("embedding")).alias("n")
        ).collect()
    }
    assert len(fast) == n
    for vid, want in ref.items():
        assert fast[vid] == want, (vid, fast[vid], want)  # bit-equal


def _ivf_dim_probe():
    from machine_learning_with_spark_streaming_spark.functions.artifacts import (
        IVF_CENTROIDS,
    )

    return IVF_CENTROIDS[0]


def test_stored_serving_query_prunes_partitions(spark, sf_dir):
    """The registered ``sim_topk_ivf_stored`` reads the cell-partitioned
    store with static PartitionFilters (the probed cells only) and
    returns exactly what the inline-assignment form returns."""
    from machine_learning_with_spark_streaming_spark.operators.ivf import (
        q_ivf_topk,
        q_ivf_topk_stored,
    )

    stored = q_ivf_topk_stored(spark, sf_dir)
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan
    # the pruning filter is static (in-list over probed cells), present
    # in the scan line — not an unpruned full read
    scan_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert any("cell" in ln and "[]" not in ln.split("PartitionFilters", 1)[1][:80]
               for ln in scan_lines), scan_lines

    inline_rows = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos"])
        for r in q_ivf_topk(spark, sf_dir).collect()
    }
    stored_rows = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos"])
        for r in stored.collect()
    }
    assert stored_rows == inline_rows and len(stored_rows) > 0


def test_cell_store_builds_once(spark, sf_dir, tmp_path, monkeypatch):
    """``ensure_cell_store`` materializes on first call and serves the
    marker-guarded store afterwards (assignment is a write-time
    property — the read path never re-assigns)."""
    import os

    from machine_learning_with_spark_streaming_spark.operators import ivf

    monkeypatch.setattr(ivf, "IVF_STORE_ROOT", str(tmp_path / "store"))
    p1 = ivf.ensure_cell_store(spark, sf_dir)
    marker = os.path.join(p1, "_BUILT")
    assert os.path.exists(marker)
    mt = os.path.getmtime(marker)
    p2 = ivf.ensure_cell_store(spark, sf_dir)
    assert p2 == p1 and os.path.getmtime(marker) == mt  # no rebuild
    # 16 cell directories exist (the partition layout)
    cells = [d for d in os.listdir(p1) if d.startswith("cell=")]
    assert len(cells) == 16


def test_centroid_outliers_null_cosine_ranks_last(spark):
    """A zero-norm embedding (NULL cosine to its label centroid) must
    NOT rank as the #1 outlier: ordering is pinned ASC NULLS LAST in
    both engines (r9 ADVICE item)."""
    from machine_learning_with_spark_streaming_spark.operators.index_health import (
        centroid_outliers,
    )

    rows = [
        (0, 7, [0.0, 0.0]),  # zero vector -> NULL cosine
        (1, 7, [1.0, 0.0]),
        (2, 7, [0.0, 1.0]),
        (3, 7, [1.0, 1.0]),
        (4, 7, [-1.0, -1.0]),  # the true outlier (negative cosine)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = centroid_outliers(df, k=5).orderBy("rank").collect()
    assert out[0]["vec_id"] == 4 and out[0]["cos"] < 0
    assert out[-1]["vec_id"] == 0 and out[-1]["cos"] is None


def test_refit_step_recovers_drifted_centroids(spark):
    """Two tight planted clusters, frozen centroids drifted off-center:
    one Lloyd step moves each centroid to its cluster mean, occupancy
    stays balanced, and the mean member-cosine rises for both cells.
    An empty third cell keeps its frozen centroid (Lloyd's rule)."""
    from machine_learning_with_spark_streaming_spark.operators.refit import (
        ivf_refit_report,
        refit_centroids,
    )
    from machine_learning_with_spark_streaming_spark.operators.ivf import argmax_assign

    # clusters around (10, 0) and (0, 10); frozen centroids tilted
    frozen = [[3.0, 1.0], [1.0, 3.0], [-5.0, -5.0]]
    rows = [(i, [10.0 + (i % 3) * 0.1, float(i % 2)]) for i in range(20)]
    rows += [(100 + i, [float(i % 2), 10.0 + (i % 3) * 0.1]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    rep = {r["cell"]: r for r in ivf_refit_report(df, frozen=frozen).collect()}
    assert rep[0]["n_before"] == 20 and rep[1]["n_before"] == 20
    assert rep[2]["n_before"] == 0 and rep[2]["mean_sim_before_e6"] is None
    assert rep[0]["n_after"] == 20 and rep[1]["n_after"] == 20
    for cell in (0, 1):
        assert rep[cell]["mean_sim_after_e6"] > rep[cell]["mean_sim_before_e6"]
        assert rep[cell]["mean_sim_after_e6"] > 990_000  # near-1 cosine

    assigned = argmax_assign(df, frozen, sim_col="sim")
    new_cents = refit_centroids(assigned, frozen, vec_col="v")
    assert new_cents[2] == frozen[2]  # empty cell: frozen centroid kept
    assert abs(new_cents[0][0] - 10.1) < 0.2 and abs(new_cents[0][1] - 0.5) < 0.2
    assert abs(new_cents[1][1] - 10.1) < 0.2 and abs(new_cents[1][0] - 0.5) < 0.2


def test_refit_step_improves_real_corpus_mean_sim(spark, sf_dir):
    """On the real embeddings table the Lloyd step must not degrade the
    corpus-wide quantization quality: occupancy-weighted mean cosine
    after >= before (Lloyd monotonicity, integer-e6 metric)."""
    from machine_learning_with_spark_streaming_spark.operators.refit import (
        q_ivf_refit_step,
    )

    rows = q_ivf_refit_step(spark, sf_dir).collect()
    tot_b = sum(r["n_before"] for r in rows)
    tot_a = sum(r["n_after"] for r in rows)
    assert tot_b == tot_a and tot_b > 0  # re-assignment loses no rows
    wb = sum(
        r["n_before"] * r["mean_sim_before_e6"]
        for r in rows
        if r["mean_sim_before_e6"] is not None
    )
    wa = sum(
        r["n_after"] * r["mean_sim_after_e6"]
        for r in rows
        if r["mean_sim_after_e6"] is not None
    )
    assert wa >= wb


def test_full_outer_stream_join_extends_both_sides(spark, sf_dir):
    """The full-outer stream-stream run emits BOTH null-extension
    directions — unmatched clicks (error_id NULL) and unmatched errors
    (click_id NULL) — with the key surviving on every row via the
    coalesce (no NULL user_id can remain after sentinel filtering)."""
    from machine_learning_with_spark_streaming_spark.streaming.examples import (
        q_full_outer_join_stream,
    )

    rows = q_full_outer_join_stream(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["user_id"] is not None and r["user_id"] >= 0 for r in rows)
    assert any(r["error_id"] is None for r in rows)  # unmatched clicks
    assert any(r["click_id"] is None for r in rows)  # unmatched errors
    matched = [r for r in rows if r["click_id"] is not None and r["error_id"] is not None]
    assert matched  # and real matches too


def test_naive_bayes_beats_prior_baseline(spark, oracle_con):
    """End-to-end NB train+score on sf-test documents: the confusion
    matrix covers every document exactly once, the diagonal beats the
    majority-class prior baseline, and the result hash-matches the
    DuckDB oracle (the driver-gate preview)."""
    from tests.conftest import SF_DIR, assert_matches_oracle

    from machine_learning_with_spark_streaming_spark.ml import metrics as M
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    rows = M.q_naive_bayes(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == n_docs
    diag = sum(r["n_docs"] for r in rows if r["lang"] == r["pred"])
    majority = max(
        r["cnt"]
        for r in docs.groupBy("lang").agg(F_count().alias("cnt")).collect()
    )
    assert diag >= majority  # learned likelihoods add signal over the prior
    assert_matches_oracle(M.q_naive_bayes(spark, SF_DIR), oracle_con, M._NB_ORACLE)


def F_count():
    from pyspark.sql import functions as F

    return F.count(F.lit(1))


def test_auc_rank_known_values(spark):
    """auc_rank on hand-computable fixtures: perfect separation -> 1.0;
    anti-separation -> 0.0; all-ties -> exactly 0.5 (tie-averaged
    ranks); single-class input -> NULL, not a crash."""
    from machine_learning_with_spark_streaming_spark.ml.metrics import auc_rank

    def run(rows):
        df = spark.createDataFrame(rows, "y int, score_e6 long")
        return auc_rank(df).collect()[0]

    perfect = run([(1, 10), (1, 9), (0, 2), (0, 1)])
    assert (perfect["n_pos"], perfect["n_neg"], perfect["auc_e6"]) == (2, 2, 1_000_000)

    inverted = run([(0, 10), (0, 9), (1, 2), (1, 1)])
    assert inverted["auc_e6"] == 0

    ties = run([(1, 5), (0, 5), (1, 5), (0, 5)])
    assert ties["auc_e6"] == 500_000

    onesided = run([(1, 3), (1, 7)])
    assert onesided["auc_e6"] is None


def test_auc_rank_matches_quadratic_definition(spark):
    """auc_rank's rank-sum identity equals the O(n^2) pairwise
    definition (wins + half-ties over P*N) on a seeded random sample."""
    import random

    from machine_learning_with_spark_streaming_spark.ml.metrics import auc_rank

    rng = random.Random(41)
    rows = [(rng.randint(0, 1), rng.randint(-20, 20)) for _ in range(300)]
    pos = [s for y, s in rows if y == 1]
    neg = [s for y, s in rows if y == 0]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    # exact rational, truncating at 1e-6 exactly like the operator
    expect_e6 = (2 * wins + ties) * 1_000_000 // (2 * len(pos) * len(neg))

    df = spark.createDataFrame(rows, "y int, score_e6 long")
    got = auc_rank(df).collect()[0]
    assert got["auc_e6"] == expect_e6


def test_bloom_prejoin_plan_and_equivalence(spark, oracle_con):
    """j17: (a) composed result is IDENTICAL to the plain join (the
    oracle runs the plain join); (b) the plan is the at-scale shape —
    a BroadcastHashJoin LeftSemi bloom probe feeding a SortMergeJoin;
    (c) the probe never drops a true match and prunes most non-matches
    at the documented fp rate."""
    from tests.conftest import SF_DIR, assert_matches_oracle

    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators import bloomjoin as B
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    df = B.q_bloom_prejoin(spark, SF_DIR)
    assert_matches_oracle(df, oracle_con, B._BLOOM_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan  # the bitmap probe join
    assert "SortMergeJoin" in plan, plan  # the exact join stays SMJ

    li = load_table(spark, SF_DIR, "lineitem")
    urgent = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    bits = B.bloom_bits(urgent, "o_orderkey")
    pruned = B.bloom_prune(li, bits, "l_orderkey")
    true_match = li.join(
        urgent, li.l_orderkey == urgent.o_orderkey, "left_semi"
    ).count()
    n_fact, n_pruned = li.count(), pruned.count()
    assert n_pruned >= true_match  # no false negatives, ever
    # 1-hash fp rate == bit occupancy (popcount over the packed masks);
    # allow 2x headroom over the expected-value bound
    set_bits = bits.agg(F.sum(F.bit_count("__mask"))).collect()[0][0]
    occupancy = set_bits / B.DEFAULT_BITS
    assert n_pruned - true_match <= 2 * occupancy * (n_fact - true_match) + 50
    # the packed bitmap is bounded by m/64 rows no matter the dim size
    assert bits.count() <= B.DEFAULT_BITS // 64


def test_bloom_prune_empty_dim(spark):
    """An empty dim side yields an empty bit table and prunes ALL fact
    rows — the degenerate case collapses, it doesn't error."""
    from machine_learning_with_spark_streaming_spark.operators import bloomjoin as B

    fact = spark.range(100).withColumnRenamed("id", "k")
    dim = spark.range(0).withColumnRenamed("id", "k")
    assert B.bloom_prune(fact, B.bloom_bits(dim, "k"), "k").count() == 0


def test_kcore_peel_known_graph(spark):
    """Hand-checkable 2-core: a triangle with a pendant path. Round 1
    drops the path tail (deg 1), round 2 drops the now-exposed middle
    node, leaving the triangle as the stable 2-core."""
    from machine_learning_with_spark_streaming_spark.operators.kcore import kcore_peel_trace

    #   1-2, 2-3, 1-3 (triangle)  3-4, 4-5 (pendant path)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "a long, b long"
    )
    rows = {r["round"]: (r["n_nodes"], r["n_edges"])
            for r in kcore_peel_trace(edges, k=2, rounds=4).collect()}
    assert rows[0] == (5, 5)
    assert rows[1] == (4, 4)  # node 5 (deg 1) peeled, edge 4-5 gone
    assert rows[2] == (3, 3)  # node 4 exposed at deg 1, peeled
    assert rows[3] == (3, 3)  # converged: the triangle IS the 2-core
    assert rows[4] == (3, 3)


def test_kcore_monotone_and_wellformed(spark, oracle_con):
    """The registered trace is monotone non-increasing in both counts,
    starts at the full repeat-co-purchase graph, and hash-matches the
    unrolled DuckDB oracle."""
    from tests.conftest import SF_DIR, assert_matches_oracle

    from machine_learning_with_spark_streaming_spark.operators import kcore as K

    df = K.q_kcore_peel(spark, SF_DIR)
    rows = sorted(
        ((r["round"], r["n_nodes"], r["n_edges"]) for r in df.collect())
    )
    assert [r[0] for r in rows] == list(range(K.KCORE_ROUNDS + 1))
    for (_, n0, m0), (_, n1, m1) in zip(rows, rows[1:]):
        assert n1 <= n0 and m1 <= m0
    assert rows[0][1] > 0 and rows[0][2] > 0
    assert_matches_oracle(K.q_kcore_peel(spark, SF_DIR), oracle_con, K._kcore_oracle())


def test_theilsen_known_series(spark):
    """Hand-computable Theil-Sen: a clean slope-2 line with one wild
    outlier still reports slope 2 (the median shrugs the outlier off),
    while the OLS slope would not; odd/even pair counts both pick the
    lower-median order statistic."""
    from machine_learning_with_spark_streaming_spark.operators.robust import theilsen_trend

    # y = 2t at t=0..4, except t=2 spikes to 100
    rows = [("g", t, 2 * t if t != 2 else 100) for t in range(5)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    got = theilsen_trend(df, "k", "t", "v").collect()[0]
    assert got["n_points"] == 5 and got["n_pairs"] == 10
    assert got["slope_e6"] == 2_000_000

    # two points: single pair, slope is that pair's slope
    df2 = spark.createDataFrame([("h", 0, 10), ("h", 4, 30)], "k string, t long, v long")
    got2 = theilsen_trend(df2, "k", "t", "v").collect()[0]
    assert got2["slope_e6"] == 5_000_000

    # single point: no pairs, group dropped (slope undefined)
    df3 = spark.createDataFrame([("i", 0, 10)], "k string, t long, v long")
    assert theilsen_trend(df3, "k", "t", "v").count() == 0


def test_theilsen_matches_oracle(spark, oracle_con):
    from tests.conftest import assert_matches_oracle

    from machine_learning_with_spark_streaming_spark.operators import robust as R

    from tests.conftest import SF_DIR

    assert_matches_oracle(
        R.q_theilsen_trend(spark, SF_DIR), oracle_con, R._THEILSEN_ORACLE
    )


def test_mann_kendall_known_series(spark):
    """Hand-checkable MK verdicts: a strictly increasing series is
    'increasing' (S = maximal, ties none); a constant series is
    'no_trend' with var18 = 0; a short noisy series is insignificant."""
    from machine_learning_with_spark_streaming_spark.operators.robust import mann_kendall

    rows = (
        [("up", t, 10 * t) for t in range(10)]
        + [("flat", t, 7) for t in range(10)]
        + [("noise", t, v) for t, v in enumerate([3, 1, 4, 1, 5])]
    )
    df = spark.createDataFrame(rows, "k string, t long, v long")
    got = {r["k"]: r for r in mann_kendall(df, "k", "t", "v").collect()}

    assert got["up"]["s_stat"] == 45  # all C(10,2) pairs concordant
    assert got["up"]["trend"] == "increasing"
    n = 10
    assert got["up"]["var18"] == n * (n - 1) * (2 * n + 5)

    assert got["flat"]["s_stat"] == 0
    assert got["flat"]["var18"] == 0  # one tie group of size 10
    assert got["flat"]["trend"] == "no_trend"

    assert got["noise"]["trend"] == "no_trend"  # n=5, |S| small


def test_mann_kendall_matches_oracle(spark, oracle_con):
    from tests.conftest import SF_DIR, assert_matches_oracle

    from machine_learning_with_spark_streaming_spark.operators import robust as R

    assert_matches_oracle(
        R.q_mann_kendall(spark, SF_DIR), oracle_con, R._MK_ORACLE
    )


def test_mg_shrink_guarantee_and_eviction(spark):
    """The MG batch decrement on a synthetic skewed stream: with k far
    below the distinct-key count, eviction must actually fire (the
    summary stays <= k keys) while every true phi-heavy key survives
    the full streamed pipeline and the final output equals the exact
    frequency filter."""
    from machine_learning_with_spark_streaming_spark.streaming.heavyhitters import (
        _mg_shrink,
        mg_candidate_stream,
    )

    # pure-function check: 10 keys, k=3 -> at most 3 survive, and the
    # dominant key (count 100) must be one of them
    counters = {i: 5 for i in range(9)}
    counters[99] = 100
    out = _mg_shrink(counters, 3)
    assert len(out) <= 3 and 99 in out
    assert out[99] >= 100 - (5 + 100 + 5 * 8) / 4  # undercount bound n/(k+1)

    # streamed check: zipf-ish skew, 400 distinct keys, k=128 buckets=4
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    rows = []
    eid = 0
    for key in range(400):
        reps = 200 if key < 5 else (20 if key < 50 else 2)
        for _ in range(reps):
            rows.append((eid, key))
            eid += 1
    n = len(rows)
    df = spark.createDataFrame(rows, "event_id long, user_id long").withColumn(
        "bucket", F.pmod(F.col("user_id"), F.lit(4))
    )
    work = tempfile.mkdtemp(prefix="mlwss_hh_test_")
    from machine_learning_with_spark_streaming_spark.streaming.examples import stage_ordered_files

    parts = [
        df.filter(F.pmod(F.col("event_id"), F.lit(3)) == i).select(
            "bucket", "user_id"
        )
        for i in range(3)
    ]
    stage = stage_ordered_files(parts, f"{work}/stage")
    stream = (
        spark.readStream.schema("bucket bigint, user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    sink = f"hh_test_{uuid.uuid4().hex[:8]}"
    q = (
        mg_candidate_stream(stream, k=16)  # k << 100 distinct per bucket
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    per_batch = spark.table(sink).localCheckpoint(eager=True)
    cands = {r["user_id"] for r in per_batch.select("user_id").distinct().collect()}
    spark.catalog.dropTempView(sink)
    shutil.rmtree(work, ignore_errors=True)

    # eviction fired: k=16 << 100 distinct keys per bucket, so each
    # bucket's summary is capped and most tail keys never surface
    per_bucket_max = (
        per_batch.groupBy("bucket")
        .agg(F.countDistinct("user_id").alias("nd"))
        .agg(F.max("nd"))
        .collect()[0][0]
    )
    assert per_bucket_max < 100  # summaries stayed bounded (evicted)
    # and the MG guarantee held through eviction: every key whose
    # bucket-local count exceeds n_bucket/(k+1) ~ 650/17 is a candidate
    heavy = {k for k in range(5)}  # 200 reps each, one bucket each
    assert heavy <= cands
    exact_hh = {
        k
        for k in range(400)
        if (200 if k < 5 else (20 if k < 50 else 2)) * 125 >= n
    }
    assert exact_hh <= cands  # no false negatives through the stream


def test_heavy_hitters_stream_matches_oracle(spark, oracle_con):
    from tests.conftest import SF_DIR, assert_matches_oracle

    from machine_learning_with_spark_streaming_spark.streaming import heavyhitters as H

    assert_matches_oracle(
        H.q_heavy_hitters_stream(spark, SF_DIR), oracle_con, H._HH_ORACLE
    )


def test_hll_reaggregate_contract(spark, oracle_con):
    """Day→month sketch merge: violation flag 0 on every row (the bound
    holds through the union), months cover the events range, and the
    registered output hash-matches the exact-recount oracle."""
    from tests.conftest import SF_DIR, assert_matches_oracle

    from machine_learning_with_spark_streaming_spark.operators import sketch_rollup as S

    df = S.q_hll_reaggregate(spark, SF_DIR)
    rows = df.collect()
    assert rows and all(r["est_violation"] == 0 for r in rows)
    assert all(r["n_days"] >= 1 for r in rows)
    assert_matches_oracle(df, oracle_con, S._HLL_ORACLE)


def test_hll_merge_equals_whole_input_sketch(spark):
    """Merging per-day partials estimates the same cardinality as one
    sketch over the whole input — the re-aggregation property itself,
    on a fixture where exact equality is known (low cardinality ->
    sparse mode -> exact)."""
    from pyspark.sql import functions as F

    rows = [(d, u) for d in range(6) for u in range(40) if (u + d) % 3]
    df = spark.createDataFrame(rows, "d int, user_id long")
    whole = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    merged = (
        df.groupBy("d")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    exact = df.select("user_id").distinct().count()
    assert whole == merged == exact


def test_dpp_plan_prunes_at_runtime(spark, oracle_con):
    """j18: the fact scan's partition filter is a RUNTIME dynamic-
    pruning subquery (not a static in-list), and the result equals the
    plain join the oracle runs."""
    from tests.conftest import SF_DIR, assert_matches_oracle

    from machine_learning_with_spark_streaming_spark.operators import dpp as D

    df = D.q_dpp_partition_join(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert_matches_oracle(df, oracle_con, D._DPP_ORACLE)
    rows = df.collect()
    assert len(rows) == 3  # one quarter = three ship months
    assert [r["month"] for r in rows] == ["1996-01", "1996-02", "1996-03"]


def test_label_propagation_two_cliques(spark):
    """LPA on two 4-cliques joined by one bridge edge: each clique
    collapses to its own min-id label (communities survive the bridge,
    where connected-components would merge them)."""
    from machine_learning_with_spark_streaming_spark.operators.communities import (
        community_sizes,
        label_propagation,
    )

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = spark.createDataFrame(
        clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)],
        "a long, b long",
    )
    labs = {r["v"]: r["lab"] for r in label_propagation(edges, rounds=4).collect()}
    assert len({labs[v] for v in (1, 2, 3)}) == 1
    assert len({labs[v] for v in (11, 12, 13)}) == 1
    assert labs[1] != labs[11]  # the bridge did not merge the cliques

    sizes = community_sizes(label_propagation(edges, rounds=4), min_size=2).collect()
    assert sum(r["n_members"] for r in sizes) == 8  # all 8 nodes covered
    assert sorted(r["n_members"] for r in sizes) == [4, 4]


def test_label_propagation_matches_oracle(spark, oracle_con):
    from tests.conftest import SF_DIR, assert_matches_oracle

    from machine_learning_with_spark_streaming_spark.operators import communities as C

    assert_matches_oracle(
        C.q_label_propagation(spark, SF_DIR), oracle_con, C._lpa_oracle()
    )


def test_pmi_collocations_planted_phrase(spark):
    """A planted always-adjacent pair outranks a frequent-but-chance
    pair: docs repeat 'alpha beta' as a unit amid shuffled fillers, so
    PMI(alpha, beta) ~ ln(N/c) is maximal while filler pairs sit near 0."""
    from machine_learning_with_spark_streaming_spark.operators.collocations import pmi_collocations

    import random

    rng = random.Random(7)
    fillers = ["the", "of", "and", "to", "in"]
    docs = []
    for _ in range(120):
        toks = [rng.choice(fillers) for _ in range(30)]
        pos = rng.randint(0, 28)
        toks[pos:pos + 2] = ["alpha", "beta"]
        docs.append((" ".join(toks),))
    df = spark.createDataFrame(docs, "text string")
    rows = pmi_collocations(df, min_count=20, top=10).collect()
    assert rows[0]["w1"] == "alpha" and rows[0]["w2"] == "beta"
    # every emitted pair respects the count cut and the PMI ordering
    assert all(r["c12"] >= 20 for r in rows)
    pmis = [r["pmi_e6"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_matryoshka_recall_curve_monotone_data(spark, oracle_con):
    """The registered curve: full-width prefix recovers everything on a
    fixture whose information lives in the first dims; on the real
    corpus recall is non-increasing as dims shrink (weak monotonicity
    with 1-step tolerance for tie flips) and hash-matches the oracle."""
    from tests.conftest import SF_DIR, assert_matches_oracle

    from machine_learning_with_spark_streaming_spark.operators import matryoshka as M

    df = M.q_matryoshka_recall(spark, SF_DIR)
    rows = {r["dim"]: r for r in df.collect()}
    assert set(rows) == set(M.MRL_DIMS)
    for r in rows.values():
        assert r["n_queries"] == M.MRL_QUERIES
        assert 0 <= r["recall_permille"] <= 1000
    assert_matches_oracle(
        M.q_matryoshka_recall(spark, SF_DIR), oracle_con, M._mrl_oracle()
    )

    # exact-equivalence fixture: vectors whose tail is constant — any
    # truncation >= 2 dims preserves the full ranking exactly
    import random

    rng = random.Random(3)
    rows_fx = [
        (i, [rng.uniform(-1, 1), rng.uniform(-1, 1)] + [0.5] * 62)
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows_fx, "vec_id long, embedding array<float>")
    out = {
        r["dim"]: r["recall_permille"]
        for r in M.matryoshka_recall(
            emb, emb.filter("vec_id < 4"), dims=(32, 8), k=3
        ).collect()
    }
    assert out[32] == 1000 and out[8] == 1000


def test_bloom_split_and_negative_cache_dedup(spark, oracle_con):
    """bloom_split partitions exactly (pass + miss = all, no row in
    both); the negative-cache dedup equals the plain anti-join output
    and its plan joins the base fingerprints only on the maybe branch."""
    from tests.conftest import SF_DIR, assert_matches_oracle

    from machine_learning_with_spark_streaming_spark.operators import bloomjoin as B

    fact = spark.range(1000).withColumnRenamed("id", "k")
    dim = spark.range(0, 1000, 7).withColumnRenamed("id", "k")  # ~143 keys
    maybe, miss = B.bloom_split(fact, B.bloom_bits(dim, "k"), "k")
    n_maybe, n_miss = maybe.count(), miss.count()
    assert n_maybe + n_miss == 1000
    # every true member is on the maybe side (no false negatives)
    assert maybe.join(dim, "k", "left_semi").count() == dim.count()
    assert miss.join(dim, "k", "left_semi").count() == 0

    df = B.q_incremental_dedup_bloom(spark, SF_DIR)
    assert_matches_oracle(df, oracle_con, B._INCR_BLOOM_ORACLE)
    # identical to the certified plain-anti-join query
    from machine_learning_with_spark_streaming_spark.operators.dedup import q_incremental_dedup

    plain = {r["doc_id"] for r in q_incremental_dedup(spark, SF_DIR).collect()}
    cached = {r["doc_id"] for r in df.collect()}
    assert plain == cached and len(cached) > 0


def test_kfold_partition_and_group_atomicity(spark, oracle_con):
    """Folds partition the corpus exactly (masses sum to the totals),
    every group lands in exactly ONE fold, assignment is deterministic
    across invocations, and the report hash-matches the oracle."""
    from tests.conftest import SF_DIR, assert_matches_oracle

    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators import kfold as K
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    docs = load_table(spark, SF_DIR, "documents")
    rows = K.kfold_report(docs).collect()
    assert {r["fold"] for r in rows} <= set(range(K.KFOLD_K))
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert r["train_docs"] == docs.count() - r["n_docs"]

    assigned = K.assign_kfold(docs)
    per_group = assigned.groupBy("source").agg(
        F.countDistinct("fold").alias("nf")
    )
    assert per_group.filter("nf > 1").count() == 0  # group-atomic

    again = {
        (r["source"], r["fold"])
        for r in K.assign_kfold(docs).select("source", "fold").distinct().collect()
    }
    first = {
        (r["source"], r["fold"])
        for r in assigned.select("source", "fold").distinct().collect()
    }
    assert first == again  # deterministic

    assert_matches_oracle(K.q_kfold_assign(spark, SF_DIR), oracle_con, K._KFOLD_ORACLE)


def test_bag_set_ops_multiset_identity(spark, oracle_con):
    """Hand-checkable multiset algebra: with a = {1,1,2,3} and
    b = {1,2,2}, a EXCEPT ALL b = {1,3}, b EXCEPT ALL a = {2},
    a INTERSECT ALL b = {1,2}; and |a| = |a∖b| + |a∩b| always. The
    registered query hash-matches DuckDB's EXCEPT/INTERSECT ALL."""
    from tests.conftest import SF_DIR, assert_matches_oracle

    from machine_learning_with_spark_streaming_spark.operators import bagops as B

    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
    b = spark.createDataFrame([(1,), (2,), (2,)], "k long")
    rows = {r["op"]: (r["n_rows"], r["n_keys"]) for r in B.bag_compare(a, b).collect()}
    assert rows["a_except_all_b"] == (2, 2)  # {1, 3}
    assert rows["b_except_all_a"] == (1, 1)  # {2}
    assert rows["a_intersect_all_b"] == (2, 2)  # {1, 2}
    assert rows["a_except_all_b"][0] + rows["a_intersect_all_b"][0] == 4

    assert_matches_oracle(B.q_bag_set_ops(spark, SF_DIR), oracle_con, B._BAG_ORACLE)
