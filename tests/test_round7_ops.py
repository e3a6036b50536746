"""Round-7 additions: scaled-k SemDeDup, the source-overlap stop-shingle
cut, and the r6-ADVICE robustness fixes (ks_drift degenerate inputs,
eval-holdout empty populations)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_semdedup_k32_same_policy_scaled_quantizer(spark, sf_dir):
    """The k=32 artifact changes only the quantizer: injected exact
    copies still land in the same cluster as their originals and exactly
    one of each copy-pair survives (equal centroid_sim -> lower id
    kept)."""
    from machine_learning_with_spark_streaming_spark.functions.kmeans32_artifacts import (
        KMEANS32_CENTROIDS,
    )
    from machine_learning_with_spark_streaming_spark.operators.ivf import semdedup
    from machine_learning_with_spark_streaming_spark.operators.similarity import (
        embeddings_with_duplicates,
    )

    assert len(KMEANS32_CENTROIDS) == 32
    assert all(len(c) == 64 for c in KMEANS32_CENTROIDS)

    corpus = embeddings_with_duplicates(spark, sf_dir)
    cent = spark.createDataFrame(
        [(i, c) for i, c in enumerate(KMEANS32_CENTROIDS)],
        "cluster int, centroid array<double>",
    )
    out = {r["vec_id"]: r for r in semdedup(corpus, centroids=cent).collect()}
    n_orig = corpus.count() - 20
    assert len(out) == n_orig + 20
    for i in range(20):
        orig, copy = out[i], out[i + 100000]
        assert orig["cluster"] == copy["cluster"]  # identical vector, same argmax
        assert orig["centroid_sim"] == copy["centroid_sim"]
        # the copy (higher id, equal csim) is always the dropped one
        assert copy["keep"] == 0
    # the quantizer actually spreads the corpus (the point of k=32:
    # bounded ball sizes) — at least half the centroids are occupied
    n_clusters = len({r["cluster"] for r in out.values()})
    assert n_clusters >= 16


def test_source_overlap_stop_shingle_cut(spark):
    """Shingles present in more than max_shingle_groups sources are
    dropped from the universe BEFORE sizes and the pair join, so both
    n_common and jaccard reflect only informative shingles."""
    from machine_learning_with_spark_streaming_spark.operators.dedup import (
        source_overlap_matrix,
    )

    # 12 sources all share boilerplate 'b1..b5' (3 shingles, group-DF 12);
    # sources S0 and S1 additionally share a distinctive 5-gram run.
    boiler = "b1 b2 b3 b4 b5"
    distinct_pair = "d1 d2 d3 d4 d5"
    rows = [(f"S{i}", boiler) for i in range(12)]
    rows += [("S0", distinct_pair), ("S1", distinct_pair)]
    df = spark.createDataFrame(rows, "source string, text string")

    uncut = {
        (r["grp_a"], r["grp_b"]): (r["n_common"], r["jaccard"])
        for r in source_overlap_matrix(df).collect()
    }
    # without the cut the boilerplate makes every pair overlap
    assert uncut[("S2", "S3")] == (3, 1.0)
    assert uncut[("S0", "S1")][0] == 6

    cut = {
        (r["grp_a"], r["grp_b"]): (r["n_common"], r["jaccard"])
        for r in source_overlap_matrix(df, max_shingle_groups=10).collect()
    }
    # boilerplate (group-DF 12 > 10) is gone from the universe: pure
    # boilerplate pairs vanish entirely, and the S0-S1 Jaccard is now
    # computed over the 3 distinctive shingles only
    assert ("S2", "S3") not in cut
    assert cut[("S0", "S1")] == (3, 1.0)


def test_ks_drift_degenerate_inputs(spark):
    """r6 ADVICE item 4: empty / all-NULL / one-sided inputs return a
    zero-or-NULL report instead of raising."""
    from machine_learning_with_spark_streaming_spark.operators.validation import ks_drift

    schema = "value double, old boolean"
    empty = spark.createDataFrame([], schema)
    r = ks_drift(empty, "value", F.col("old")).collect()
    assert [tuple(x) for x in r] == [(0, 0, 0, None)]

    all_null = spark.createDataFrame([(None, True), (None, False)], schema)
    r = ks_drift(all_null, "value", F.col("old")).collect()
    assert [tuple(x) for x in r] == [(0, 0, 0, None)]

    one_sided = spark.createDataFrame(
        [(1.0, True), (2.0, True), (3.0, True)], schema
    )
    r = ks_drift(one_sided, "value", F.col("old")).collect()
    assert [tuple(x) for x in r] == [(3, 0, 0, None)]


def test_eval_holdout_always_emits_named_populations(spark, sf_dir):
    """r6 ADVICE item 1: the 'contaminated' and 'eval' rows must exist
    even when those populations are empty (global agg, not
    groupBy(lit))."""
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()["pipeline_eval_holdout"]
    rows = {r["split"]: r for r in q(spark, sf_dir).collect()}
    assert "contaminated" in rows and "eval" in rows
    # and the empty-population shape directly: zero-row input still
    # yields one zero row per named population
    from machine_learning_with_spark_streaming_spark.operators.sampling import (  # noqa: F401
        assign_split,
    )
    empty = spark.createDataFrame([], "doc_id long, source string, n_chars long")
    agg = empty.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_groups"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("sum_chars"),
    ).select(F.lit("contaminated").alias("split"), "n_docs", "n_groups", "sum_chars")
    assert [tuple(r) for r in agg.collect()] == [("contaminated", 0, 0, 0)]


def test_psi_drift_planted(spark):
    """Identical distributions -> PSI ~= 0; a hard shift -> large PSI.
    The bin=-1 total row equals the sum of the rounded per-bin terms."""
    from machine_learning_with_spark_streaming_spark.operators.validation import psi_drift

    same = spark.createDataFrame(
        [(float(v), b) for v in range(32) for b in (True, False)],
        "value double, old boolean",
    )
    rows = psi_drift(same, "value", F.col("old")).collect()
    total = [r for r in rows if r["bin"] == -1][0]
    assert total["c_old"] == total["c_new"] == 32
    assert abs(total["psi_term"]) < 1e-6

    shifted = spark.createDataFrame(
        [(float(v), True) for v in range(16)]
        + [(float(v) + 16, False) for v in range(16)],
        "value double, old boolean",
    )
    rows = psi_drift(shifted, "value", F.col("old")).collect()
    total = [r for r in rows if r["bin"] == -1][0]
    assert total["psi_term"] > 1.0  # fully disjoint mass => big index
    per_bin_sum = round(sum(r["psi_term"] for r in rows if r["bin"] >= 0), 6)
    assert abs(total["psi_term"] - per_bin_sum) < 2e-6

    empty = spark.createDataFrame([], "value double, old boolean")
    assert psi_drift(empty, "value", F.col("old")).count() == 0


def test_psi_drift_scores_empty_bins(spark):
    """r8 (ADVICE): ALL 16 bins are scored. With data only in bins 0 and
    15 and size-skewed populations (n_old != n_new), the 14 double-empty
    bins each carry a nonzero Laplace-smoothed term — previously they
    were silently omitted from the total."""
    from machine_learning_with_spark_streaming_spark.operators.validation import (
        PSI_BINS,
        psi_drift,
    )

    # old side: 90 rows at v=0; new side: 10 rows at v=16 (bins 0 and 15
    # only; every interior bin is empty on both sides)
    df = spark.createDataFrame(
        [(0.0, True)] * 90 + [(16.0, False)] * 10, "value double, old boolean"
    )
    rows = {r["bin"]: r for r in psi_drift(df, "value", F.col("old")).collect()}
    assert set(rows) == set(range(PSI_BINS)) | {-1}  # full grid + total
    mid = rows[7]
    assert mid["c_old"] == mid["c_new"] == 0
    # smoothed shares differ: 1/(90+16) vs 1/(10+16) -> nonzero term
    assert abs(mid["psi_term"]) > 1e-4
    per_bin_sum = round(
        sum(r["psi_term"] for b, r in rows.items() if b >= 0), 6
    )
    assert abs(rows[-1]["psi_term"] - per_bin_sum) < 2e-6


def test_benford_digits_planted(spark):
    from machine_learning_with_spark_streaming_spark.operators.validation import (
        benford_digits,
    )

    # 30 values starting with 1, 10 with 2, none with 9; zero excluded
    rows = [(float(10 + i % 5),) for i in range(30)] + [(25.0,)] * 10 + [(0.0,)]
    df = spark.createDataFrame(rows, "amt double")
    got = {r["digit"]: r for r in benford_digits(df, "amt").collect()}
    assert set(got) == set(range(1, 10))  # all 9 digits always present
    assert got[1]["n_obs"] == 30 and got[2]["n_obs"] == 10
    assert got[9]["n_obs"] == 0 and got[9]["obs_ppm"] == 0
    assert got[1]["obs_ppm"] == 750000  # 30/40 exactly
    assert got[1]["abs_delta_ppm"] == 750000 - 301030


def test_mom_pct_change_planted(spark):
    from machine_learning_with_spark_streaming_spark.operators.windows import (
        mom_pct_change,
    )
    import datetime as dt

    rows = [
        ("A", dt.date(2024, 1, 5), 100.0),
        ("A", dt.date(2024, 1, 20), 100.0),
        ("A", dt.date(2024, 2, 1), 300.0),
        ("B", dt.date(2024, 1, 1), 50.0),
    ]
    df = spark.createDataFrame(rows, "k string, d date, amt double")
    got = {
        (r["k"], str(r["month"])): r
        for r in mom_pct_change(df, "k", "d", "amt").collect()
    }
    assert got[("A", "2024-01-01")]["revenue_cents"] == 20000
    assert got[("A", "2024-01-01")]["pct_change"] is None  # no baseline
    assert got[("A", "2024-02-01")]["pct_change"] == 0.5  # 300 vs 200
    assert got[("B", "2024-01-01")]["pct_change"] is None


def test_corr_matrix_exact_planted(spark):
    from machine_learning_with_spark_streaming_spark.ml.examples import corr_matrix_exact

    # y = 2x exactly -> corr 1; z = -x -> corr -1 with both
    rows = [(float(i), float(2 * i), float(-i)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    meas = [("x", "x", 1), ("y", "y", 1), ("z", "z", 1)]
    got = {
        (r["m_a"], r["m_b"]): r["corr"]
        for r in corr_matrix_exact(df, meas).collect()
    }
    assert got[("x", "y")] == 1.0
    assert got[("x", "z")] == -1.0
    assert got[("y", "z")] == -1.0


def test_shingle_novelty_planted(spark):
    from machine_learning_with_spark_streaming_spark.operators.text import shingle_novelty

    a = "w1 w2 w3 w4 w5"          # 3 shingles, all first-seen in doc 1
    b = "w1 w2 w3 w4 w5 x1 x2"    # repeats a's 3 + 2 new
    c = "z1 z2 z3"                # 1 shingle, all new
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in shingle_novelty(df).collect()}
    assert (got[1]["n_shingles"], got[1]["n_novel"]) == (3, 3)
    assert got[1]["novelty"] == 1.0
    assert (got[2]["n_shingles"], got[2]["n_novel"]) == (5, 2)
    assert got[2]["novelty"] == 0.4
    assert got[3]["novelty"] == 1.0


def test_asof_tolerance_nulls_stale_matches(spark):
    """Matches older than the tolerance are nulled as if absent; fresh
    matches are untouched; no-match rows stay null."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.joins import asof_join

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "k", t(10)), (2, "k", t(20)), (3, "k", t(2)), (4, "x", t(5))],
        "lid long, k string, lt timestamp",
    )
    right = spark.createDataFrame(
        [("k", t(8), 80.0), ("k", t(1), 10.0)],
        "k string, rt timestamp, val double",
    )
    out = {
        r["lid"]: r["prev_val"]
        for r in asof_join(
            left, right, on=["k"], left_time="lt", right_time="rt",
            value_cols={"val": "prev_val"},
            tolerance_seconds=5 * 86400,
        ).collect()
    }
    assert out[1] == 80.0        # 2 days old: fresh
    assert out[2] is None        # best match (day 8) is 12 days old: stale
    assert out[3] == 10.0        # 1 day old: fresh
    assert out[4] is None        # key never seen
    # without tolerance the stale match comes back
    out2 = {
        r["lid"]: r["prev_val"]
        for r in asof_join(
            left, right, on=["k"], left_time="lt", right_time="rt",
            value_cols={"val": "prev_val"},
        ).collect()
    }
    assert out2[2] == 80.0


def test_minhash_calibration_exact_copy_agrees_fully(spark):
    """An exact copy agrees on every signature component (est 1.0,
    abs_err 0 against exact Jaccard 1.0); estimates are k_agree/16."""
    from machine_learning_with_spark_streaming_spark.operators.dedup import (
        minhash_calibration,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, base)], "doc_id long, text string"
    )
    rows = minhash_calibration(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["exact_j"] == 1.0 and r["k_agree"] == 16
    assert r["est_j"] == 1.0 and r["abs_err"] == 0.0


def test_embedding_dim_stats_planted(spark):
    from machine_learning_with_spark_streaming_spark.operators.similarity import (
        embedding_dim_stats,
    )

    # dim0 constant 2.0 (std 0), dim1 = +/-1 (mean 0, std 1)
    df = spark.createDataFrame(
        [([2.0, 1.0],), ([2.0, -1.0],)], "embedding array<double>"
    )
    got = {r["dim"]: r for r in embedding_dim_stats(df).collect()}
    assert got[0]["n"] == 2 and got[0]["mean"] == 2.0 and got[0]["std"] == 0.0
    assert got[1]["mean"] == 0.0 and got[1]["std"] == 1.0


def test_benford_digits_empty_input(spark):
    from machine_learning_with_spark_streaming_spark.operators.validation import (
        benford_digits,
    )

    empty = spark.createDataFrame([(0.0,), (None,)], "amt double")
    rows = {r["digit"]: r for r in benford_digits(empty, "amt").collect()}
    assert set(rows) == set(range(1, 10))
    assert all(r["n_obs"] == 0 and r["obs_ppm"] == 0 for r in rows.values())
    assert rows[1]["abs_delta_ppm"] == 301030


def test_share_of_total_planted(spark):
    from machine_learning_with_spark_streaming_spark.operators.aggregates import (
        share_of_total,
    )

    rows = [("A", "x", 1.0), ("A", "y", 3.0), ("B", "x", 4.0)]
    df = spark.createDataFrame(rows, "g string, s string, amt double")
    got = {
        (r["grp"], r["sub"]): r
        for r in share_of_total(
            df, "g", "s", F.round(F.col("amt") * 100).cast("long")
        ).collect()
    }
    assert got[("A", "x")]["share_of_group"] == 0.25
    assert got[("A", "y")]["share_of_group"] == 0.75
    assert got[("B", "x")]["share_of_group"] == 1.0
    assert got[("A", "x")]["share_of_total"] == 0.125
    assert got[("B", "x")]["share_of_total"] == 0.5
    # shares partition: per-group sums to 1, total sums to 1
    assert round(sum(r["share_of_total"] for r in got.values()), 6) == 1.0


def test_time_gap_report_planted(spark):
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.validation import (
        time_gap_report,
    )

    t = lambda d: dt.datetime(2024, 3, d, 12)  # noqa: E731
    rows = [(1, t(1)), (1, t(2)), (1, t(5)), (1, t(5)), (2, t(1))]
    df = spark.createDataFrame(rows, "uid long, ts timestamp")
    got = time_gap_report(df, "uid", "ts").collect()
    assert len(got) == 1  # one hole; duplicate days collapse; key 2 has none
    r = got[0]
    assert r["uid"] == 1
    assert str(r["gap_start"]) == "2024-03-03"
    assert str(r["gap_end"]) == "2024-03-04"
    assert r["n_missing_days"] == 2


def test_triangle_count_planted(spark):
    from machine_learning_with_spark_streaming_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} has 4 triangles; pendant edge (4,5) adds none
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(4, 5)], "a long, b long")
    r = triangle_count(edges).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (5, 7, 4)

    # no edges between components -> zero triangles
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "a long, b long")
    assert triangle_count(path).collect()[0]["n_triangles"] == 0


def test_whiten_frozen_standardizes(spark):
    """Whitening with the frozen stats: a vector equal to the frozen
    MEAN whitens to all-zeros (w_sum = w_norm = 0); mean + 1*std
    whitens to all-ones (w_sum = 64, w_norm = 8)."""
    from machine_learning_with_spark_streaming_spark.functions.whiten_artifacts import (
        WHITEN_MEAN,
        WHITEN_STD,
    )
    from machine_learning_with_spark_streaming_spark.operators.similarity import (
        whiten_frozen,
    )

    rows = [
        (0, [float(m) for m in WHITEN_MEAN]),
        (1, [float(m + s) for m, s in zip(WHITEN_MEAN, WHITEN_STD)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in whiten_frozen(df).collect()}
    assert got[0]["w_sum"] == 0.0 and got[0]["w_norm"] == 0.0
    assert got[1]["w_sum"] == 64.0 and got[1]["w_norm"] == 8.0


def test_drift_monitor_gates_and_thresholds(spark):
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.validation import (
        drift_monitor,
    )

    # disjoint halves -> every gate alarms
    rows = [(float(v), dt.datetime(2024, 6, 1)) for v in range(100)] + [
        (float(v) + 1000, dt.datetime(2024, 6, 20)) for v in range(100)
    ]
    df = spark.createDataFrame(rows, "value double, ts timestamp")
    got = {
        r["gate"]: r
        for r in drift_monitor(df, "value", F.dayofmonth("ts") <= 15).collect()
    }
    assert set(got) == {"ks_d", "psi", "l1_ppm"}
    assert got["ks_d"]["value"] == 1.0 and got["ks_d"]["alarm"] == 1
    assert got["psi"]["alarm"] == 1 and got["l1_ppm"]["alarm"] == 1

    # identical halves -> no gate alarms
    same = spark.createDataFrame(
        [
            (float(v % 50), dt.datetime(2024, 6, 1 if v < 100 else 20))
            for v in range(200)
        ],
        "value double, ts timestamp",
    )
    got2 = {
        r["gate"]: r
        for r in drift_monitor(same, "value", F.dayofmonth("ts") <= 15).collect()
    }
    assert all(r["alarm"] == 0 for r in got2.values())
    assert got2["ks_d"]["value"] == 0.0


def test_tree_score_compilation_faithful_to_mllib(spark, sf_dir):
    """The compiled when-chain must route exactly like the artifact's
    node table: replay the tree in plain Python per row and compare."""
    from machine_learning_with_spark_streaming_spark.functions.tree_artifacts import TREE_NODES
    from machine_learning_with_spark_streaming_spark.functions.vectors import as_double_array
    from machine_learning_with_spark_streaming_spark.ml.examples import tree_score_column
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    def py_score(vec):
        nid = 0
        while True:
            _n, feat, thr, left, right, pred = TREE_NODES[nid]
            if feat == -1:
                return pred
            nid = left if float(vec[feat]) <= thr else right

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    rows = emb.select(
        "vec_id", "embedding",
        tree_score_column(as_double_array("embedding")).alias("pred"),
    ).collect()
    assert len(rows) == 200
    for r in rows:
        assert r["pred"] == py_score(r["embedding"]), r["vec_id"]
    # structural sanity of the frozen artifact
    leaves = [n for n in TREE_NODES if n[1] == -1]
    assert len(TREE_NODES) == 2 * len(leaves) - 1  # proper binary tree
    assert {n[0] for n in TREE_NODES} == set(range(len(TREE_NODES)))


def test_balanced_downsample_exact_counts_and_determinism(spark):
    from machine_learning_with_spark_streaming_spark.operators.sampling import (
        balanced_downsample,
    )

    rows = [(i, i % 3 if i < 90 else 0) for i in range(120)]  # label 0 hot
    df = spark.createDataFrame(rows, "vec_id long, label int")
    out = balanced_downsample(df, "label").collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r["id"])
    # every class downsampled to the minority count (30 each for 1,2)
    assert {k: len(v) for k, v in by_label.items()} == {0: 30, 1: 30, 2: 30}
    # deterministic: second run selects the identical ids
    out2 = balanced_downsample(df, "label").collect()
    assert {(r["label"], r["id"]) for r in out} == {
        (r["label"], r["id"]) for r in out2
    }
    # a different seed selects a different (but equally sized) sample
    out3 = balanced_downsample(df, "label", seed=1).collect()
    assert len(out3) == len(out)
    assert {(r["label"], r["id"]) for r in out3} != {
        (r["label"], r["id"]) for r in out
    }


def test_drift_monitor_stream_real_batches(spark, sf_dir):
    """The streaming drift monitor emits one verdict per staged
    micro-batch, batch indices 0..2, with finite PSI and the batch row
    counts reconciling to the second-half event count."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["s11_drift_monitor_stream"](spark, sf_dir).collect()
    assert [r["batch_idx"] for r in rows] == [0, 1, 2]
    assert all(r["psi"] is not None and r["psi"] >= 0.0 for r in rows)
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    expected = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & (F.dayofmonth("ts") >= 16))
        .count()
    )
    assert sum(r["n_rows"] for r in rows) == expected


def test_pagerank_integer_planted(spark):
    """Star graph: the hub must outrank every leaf; symmetric leaves tie
    exactly (integer arithmetic — no FP noise to break symmetry); a
    second run is bit-identical."""
    from machine_learning_with_spark_streaming_spark.operators.graph import pagerank_integer

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "a long, b long"
    )
    r = {x["node"]: x["rank_micros"] for x in pagerank_integer(star).collect()}
    assert all(r[0] > r[i] for i in range(1, 6))
    assert len({r[i] for i in range(1, 6)}) == 1  # exact leaf symmetry
    r2 = {x["node"]: x["rank_micros"] for x in pagerank_integer(star).collect()}
    assert r == r2
    # regular graph (triangle): uniform degrees -> ranks stay equal and
    # conserve mass up to the documented floor loss
    tri = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "a long, b long")
    rt = {x["node"]: x["rank_micros"] for x in pagerank_integer(tri).collect()}
    assert len(set(rt.values())) == 1
    assert abs(sum(rt.values()) - 3_000_000) <= 18  # <=2 edges*3 iters floor loss
