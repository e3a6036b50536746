"""Round-10 continuation ops: gaps-and-islands streaks, chi-square
independence decomposition, blocked edit-distance entity resolution."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_day_streaks_known_islands(spark):
    """Hand-checked islands: key 1 has runs [1-3] and [5-6] (best 3),
    key 2 has the single day [10] (best 1); duplicate (key, day) rows
    collapse."""
    from machine_learning_with_spark_streaming_spark.operators.streaks import (
        best_streak_distribution,
        day_streaks,
    )

    d = dt.date
    rows = [
        (1, d(2024, 1, 1)),
        (1, d(2024, 1, 2)),
        (1, d(2024, 1, 2)),  # dup day
        (1, d(2024, 1, 3)),
        (1, d(2024, 1, 5)),
        (1, d(2024, 1, 6)),
        (2, d(2024, 1, 10)),
    ]
    df = spark.createDataFrame(rows, "k int, day date")
    streaks = day_streaks(df, "k", "day")
    got = {
        (r["key"], r["streak_start"]): r["streak_len"]
        for r in streaks.collect()
    }
    assert got == {
        (1, d(2024, 1, 1)): 3,
        (1, d(2024, 1, 5)): 2,
        (2, d(2024, 1, 10)): 1,
    }
    dist = {
        r["best_len"]: r["n_keys"]
        for r in best_streak_distribution(streaks).collect()
    }
    assert dist == {3: 1, 1: 1}


def test_chi2_independent_table_is_zero(spark):
    """A perfectly independent 2x2 table (margins factorize exactly)
    yields chi2_term == 0 in every cell and the total row."""
    from machine_learning_with_spark_streaming_spark.operators.stats_tests import (
        chi2_independence,
    )

    # o(x,y) = rx*cy/n exactly: 10/20 vs 30/60 split, n=120
    rows = (
        [("a", "x")] * 10
        + [("a", "y")] * 30
        + [("b", "x")] * 20
        + [("b", "y")] * 60
    )
    df = spark.createDataFrame(rows, "u string, v string")
    out = chi2_independence(df, "u", "v").collect()
    assert all(r["chi2_term"] == 0.0 for r in out)
    tot = [r for r in out if r["a"] == "__TOTAL__"][0]
    assert tot["o"] == 120 and tot["r_tot"] == 120


def test_chi2_known_statistic(spark):
    """2x2 with a hand-computed statistic: o = [[10, 20], [20, 10]],
    e = 15 everywhere, chi2 = 4 * 25/15 = 6.666667 (6dp)."""
    from machine_learning_with_spark_streaming_spark.operators.stats_tests import (
        chi2_independence,
    )

    rows = (
        [("a", "x")] * 10
        + [("a", "y")] * 20
        + [("b", "x")] * 20
        + [("b", "y")] * 10
    )
    df = spark.createDataFrame(rows, "u string, v string")
    out = chi2_independence(df, "u", "v").collect()
    cells = {(r["a"], r["b"]): r["chi2_term"] for r in out}
    assert cells[("a", "x")] == round(25 / 15, 6)
    assert cells[("__TOTAL__", "")] == round(4 * round(25 / 15, 6), 6)


def test_chi2_zero_count_cell(spark):
    """A (margin x margin) combination with no observed rows appears as
    o=0 via the grid left-join (same full-grid rule as v20's bins)."""
    from machine_learning_with_spark_streaming_spark.operators.stats_tests import (
        chi2_independence,
    )

    rows = [("a", "x")] * 5 + [("b", "y")] * 5
    df = spark.createDataFrame(rows, "u string, v string")
    out = {
        (r["a"], r["b"]): r for r in chi2_independence(df, "u", "v").collect()
    }
    assert out[("a", "y")]["o"] == 0
    assert out[("a", "y")]["chi2_term"] == 2.5  # (0-2.5)^2/2.5
    assert out[("__TOTAL__", "")]["chi2_term"] == 10.0


def test_blocked_editdist_known_pairs(spark):
    """Blocking on the last token: 'red bolt'~'old bolt' (dist 2) pair
    within the 'bolt' block; 'red widget' is alone in its block; pairs
    above max_dist are cut; row support counts carry through."""
    from machine_learning_with_spark_streaming_spark.operators.er import (
        blocked_editdist_pairs,
    )

    rows = [
        ("red bolt",),
        ("red bolt",),
        ("old bolt",),
        ("shiny bolt",),
        ("red widget",),
    ]
    df = spark.createDataFrame(rows, "name string")
    out = blocked_editdist_pairs(
        df, "name", lambda c: F.regexp_extract(c, "[^ ]+$", 0), max_dist=3
    ).collect()
    got = {(r["name_a"], r["name_b"]): (r["dist"], r["n_a"], r["n_b"]) for r in out}
    # 'old bolt' vs 'red bolt' = 2 edits; 'shiny bolt' is >3 from both
    assert got == {("old bolt", "red bolt"): (2, 1, 2)}


def test_blocked_editdist_pairs_are_over_distinct_names(spark):
    """Candidate volume is |distinct names|-bounded: 1000 duplicate rows
    of one name generate zero self-pairs and no blowup."""
    from machine_learning_with_spark_streaming_spark.operators.er import (
        blocked_editdist_pairs,
    )

    df = spark.createDataFrame([("same bolt",)] * 1000, "name string")
    out = blocked_editdist_pairs(
        df, "name", lambda c: F.regexp_extract(c, "[^ ]+$", 0)
    )
    assert out.count() == 0


def test_rolling_median_known_frame(spark):
    """Hand-checked 3-row frames: ramp-up frames use the doubled
    two-middle rule ([10] -> 20, [10,30] -> 40), full odd frames are 2x
    the middle order statistic (sorted [10,20,30] -> 2*20); a spike day
    does not drag the median the way it would drag a mean."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.rollstats import (
        rolling_median_x2,
    )

    d = dt.date
    daily = spark.createDataFrame(
        [
            ("a", d(2024, 1, 1), 10),
            ("a", d(2024, 1, 2), 30),
            ("a", d(2024, 1, 3), 20),
            ("a", d(2024, 1, 4), 1000),  # spike
        ],
        "key string, day date, cents long",
    )
    out = {
        r["day"]: r["med_x2"]
        for r in rolling_median_x2(daily, frame_rows=3).collect()
    }
    assert out == {
        d(2024, 1, 1): 20,  # [10]
        d(2024, 1, 2): 40,  # [10,30] -> 10+30
        d(2024, 1, 3): 40,  # [10,20,30] -> 2*20
        d(2024, 1, 4): 60,  # [20,30,1000] -> 2*30: spike shrugged
    }


def test_acf_perfect_alternation(spark):
    """A perfectly alternating series has lag-1 ACF = -1 and lag-2
    ACF = +1 (exact on the +-1 endpoints); a calendar gap drops the
    mis-aligned pair instead of pairing across it."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.rollstats import (
        acf_lags,
    )

    d0 = dt.date(2024, 1, 1)
    rows = [
        ("a", d0 + dt.timedelta(days=i), 100 if i % 2 == 0 else 200)
        for i in range(10)
    ]
    daily = spark.createDataFrame(rows, "key string, day date, cents long")
    out = {r["lag"]: r for r in acf_lags(daily, lags=(1, 2)).collect()}
    assert out[1]["acf"] == -1.0 and out[1]["n_pairs"] == 9
    assert out[2]["acf"] == 1.0 and out[2]["n_pairs"] == 8

    # drop one middle day: lag-1 pairs across the hole are discarded
    daily_gap = daily.filter(daily.day != d0 + dt.timedelta(days=4))
    out_gap = {r["lag"]: r for r in acf_lags(daily_gap, lags=(1,)).collect()}
    assert out_gap[1]["n_pairs"] == 7  # 9 - the two pairs touching day 4


def test_acf_constant_series_is_null(spark):
    """Zero variance -> NULL acf (guarded), not a crash or Inf."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.rollstats import (
        acf_lags,
    )

    d0 = dt.date(2024, 1, 1)
    rows = [("a", d0 + dt.timedelta(days=i), 500) for i in range(6)]
    daily = spark.createDataFrame(rows, "key string, day date, cents long")
    out = acf_lags(daily, lags=(1,)).collect()
    assert len(out) == 1 and out[0]["acf"] is None


def test_knn_separable_clusters(spark):
    """Two tight, well-separated clusters: every probe's neighbors are
    its own cluster, so the confusion matrix is purely diagonal."""
    from machine_learning_with_spark_streaming_spark.operators.knn import knn_confusion

    rows = []
    for i in range(10):
        rows.append((i, [10.0 + (i % 3), 0.0, 1.0], 0))
        rows.append((100 + i, [0.0, 10.0 + (i % 3), 1.0], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = knn_confusion(emb, emb, k=3, dim=3).collect()
    got = {(r["true_label"], r["pred_label"]): r["n"] for r in out}
    assert got == {(0, 0): 10, (1, 1): 10}


def test_knn_vote_tie_breaks_to_smallest_label(spark):
    """k=2 with one neighbor of each label -> 1-1 vote tie -> the
    smaller label wins (the documented argmax rule)."""
    from machine_learning_with_spark_streaming_spark.operators.knn import knn_confusion

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 9),     # probe
            (1, [1.0, 0.01], 5),    # closest, label 5
            (2, [1.0, 0.02], 3),    # second, label 3
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = knn_confusion(emb, emb.filter("vec_id = 0"), k=2, dim=2).collect()
    assert len(out) == 1
    assert (out[0]["true_label"], out[0]["pred_label"]) == (9, 3)


def test_link_prediction_known_graph(spark):
    """Path graph 1-2-3 plus 2-4: unlinked pairs through center 2 are
    (1,3), (1,4), (3,4) each with cn=1; the linked pairs are excluded;
    a high-degree center above the cap contributes nothing."""
    from machine_learning_with_spark_streaming_spark.operators.linkpred import (
        common_neighbor_candidates,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4)], "a long, b long"
    )
    out = common_neighbor_candidates(edges, degree_cap=10, top_k=10).collect()
    got = {(r["a"], r["b"]): r["cn"] for r in out}
    assert got == {(1, 3): 1, (1, 4): 1, (3, 4): 1}

    # cap below center 2's degree (3) -> no wedge centers -> empty
    out2 = common_neighbor_candidates(edges, degree_cap=2, top_k=10).collect()
    assert out2 == []


def test_link_prediction_excludes_existing_edges(spark):
    """A triangle has every 2-hop pair already linked -> empty output."""
    from machine_learning_with_spark_streaming_spark.operators.linkpred import (
        common_neighbor_candidates,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "a long, b long"
    )
    assert common_neighbor_candidates(edges, degree_cap=10).count() == 0


def test_time_travel_resolve_and_isolation(spark, tmp_path):
    """As-of resolution picks the newest version <= asof; reading v1
    after v2 exists still sees exactly v1's rows (snapshot isolation);
    asof below the first version raises."""
    import pytest

    from machine_learning_with_spark_streaming_spark.sources.timetravel import (
        read_asof,
        resolve_asof,
        write_snapshot,
    )

    base = str(tmp_path / "store")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    df2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c")], "k long, v string"
    )
    write_snapshot(df1, base, 1, "k")
    write_snapshot(df2, base, 5, "k")

    assert resolve_asof(spark, base, 1) == 1
    assert resolve_asof(spark, base, 4) == 1   # gap resolves DOWN
    assert resolve_asof(spark, base, 5) == 5
    assert resolve_asof(spark, base, 99) == 5  # future -> latest

    v, snap = read_asof(spark, base, 3)
    assert v == 1
    assert sorted((r["k"], r["v"]) for r in snap.collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    with pytest.raises(ValueError):
        resolve_asof(spark, base, 0)


def test_time_travel_version_collision_refused(spark, tmp_path):
    """Re-writing an existing version errors instead of silently
    rewriting history (errorifexists on the snapshot dir)."""
    import pytest

    from machine_learning_with_spark_streaming_spark.sources.timetravel import (
        write_snapshot,
    )

    base = str(tmp_path / "store")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    write_snapshot(df, base, 1, "k")
    with pytest.raises(Exception):
        write_snapshot(df, base, 1, "k")


def test_winsorized_mean_known_values(spark):
    """10 values 1..9 + outlier 1000 (cents): lo = rank ceil(1.0)=1 ->
    1, hi = rank ceil(9.0)=9 -> 9; clamped sum = 1..9 clamped (no-op)
    + outlier->9 = 45+9 = 54; mean_floor = 5."""
    from machine_learning_with_spark_streaming_spark.operators.stats_tests import (
        winsorized_mean,
    )
    from pyspark.sql import functions as F

    rows = [("g", i) for i in range(1, 10)] + [("g", 1000)]
    df = spark.createDataFrame(rows, "grp string, cents long")
    out = winsorized_mean(df, "grp", F.col("cents")).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["lo_cents"], r["hi_cents"]) == (1, 9)
    assert r["winsorized_sum"] == 54
    assert r["mean_floor"] == 5


def test_event_transitions_known_timeline(spark):
    """Two users: u1 = A,B,A,B and u2 = A,A. Transitions: A->B x2,
    B->A x1, A->A x1; row-conditional ppm from the A margin (3)."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.transitions import (
        event_transitions,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(minutes=i), 1, ty)
        for i, ty in enumerate(["A", "B", "A", "B"])
    ] + [
        (10 + i, t0 + dt.timedelta(minutes=i), 2, "A")
        for i in range(2)
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, ty) for i, (eid, ts, u, ty) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {
        (r["prev_type"], r["next_type"]): (r["n"], r["p_ppm"])
        for r in event_transitions(ev).collect()
    }
    assert out == {
        ("A", "B"): (2, 666666),
        ("A", "A"): (1, 333333),
        ("B", "A"): (1, 1000000),
    }


def test_event_transitions_tie_pinned_by_event_id(spark):
    """Equal timestamps order by event_id, so the bigram is (x, y) not
    (y, x)."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.transitions import (
        event_transitions,
    )

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(1, t0, 7, "x"), (2, t0, 7, "y")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = event_transitions(ev).collect()
    assert len(out) == 1
    assert (out[0]["prev_type"], out[0]["next_type"]) == ("x", "y")


def test_reading_counts_rules(spark):
    """'Hello world. How are you?' -> 5 words, 3 sentences (1 + 2
    terminators), syllables by vowel groups: he-llo(2) wo-rld(1)
    how(1) are(2: a, e) you(1) = 7."""
    from machine_learning_with_spark_streaming_spark.operators.readability import (
        doc_reading_counts,
    )

    df = spark.createDataFrame(
        [("Hello world. How are you?",)], "text string"
    )
    r = doc_reading_counts(df).collect()[0]
    assert r["words"] == 5
    assert r["sentences"] == 3
    assert r["syllables"] == 7


def test_bfs_path_graph_distances(spark):
    """Path 1-2-3-4-5-6 seeded at 1: dists 0,1,2,3 for nodes 1..4 and
    -1 for 5,6 (beyond 3 hops)."""
    from machine_learning_with_spark_streaming_spark.operators.bfs import (
        bfs_distances,
        bfs_histogram,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], "a long, b long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    dists = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, max_hops=3).collect()
    }
    assert dists == {1: 0, 2: 1, 3: 2, 4: 3, 5: -1, 6: -1}
    hist = {
        r["dist"]: r["n_nodes"]
        for r in bfs_histogram(bfs_distances(edges, seeds, 3)).collect()
    }
    assert hist == {0: 1, 1: 1, 2: 1, 3: 1, -1: 2}


def test_bfs_multi_source_takes_nearest_seed(spark):
    """Seeds at both ends of the path: middle node gets the smaller
    distance; a seed id not present in the graph is ignored."""
    from machine_learning_with_spark_streaming_spark.operators.bfs import (
        bfs_distances,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "a long, b long"
    )
    seeds = spark.createDataFrame([(1,), (5,), (999,)], "node long")
    dists = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, max_hops=3).collect()
    }
    assert dists == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_transition_stream_state_stitches_batches(spark, tmp_path):
    """A user timeline split across micro-batches must produce the same
    bigram counts as the one-pass batch operator: the boundary pair
    (last event of batch 1 -> first event of batch 2) comes from state."""
    from machine_learning_with_spark_streaming_spark.streaming.examples import (
        stage_ordered_files,
    )
    from machine_learning_with_spark_streaming_spark.streaming.transitions_stream import (
        transition_stream,
    )

    b1 = spark.createDataFrame(
        [(7, 100, 1, "A"), (7, 200, 2, "B")],
        "user_id long, us long, event_id long, event_type string",
    )
    b2 = spark.createDataFrame(
        [(7, 300, 3, "A"), (7, 400, 4, "A")],
        "user_id long, us long, event_id long, event_type string",
    )
    stage = str(tmp_path / "stage")
    stage_ordered_files([b1, b2], stage)
    stream = (
        spark.readStream.schema(
            "user_id long, us long, event_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        transition_stream(stream)
        .writeStream.format("memory")
        .queryName("trans_test_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import functions as F

    got = {
        (r["prev_type"], r["next_type"]): r["total"]
        for r in spark.table("trans_test_sink")
        .groupBy("prev_type", "next_type")
        .agg(F.sum("n").alias("total"))
        .collect()
    }
    # timeline A,B,A,A -> A->B, B->A (the boundary pair), A->A
    assert got == {("A", "B"): 1, ("B", "A"): 1, ("A", "A"): 1}
    spark.catalog.dropTempView("trans_test_sink")


def test_mode_per_group_tie_to_smallest(spark):
    """Counts tie 2-2 between values 5 and 3 -> mode is 3."""
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.modeagg import (
        mode_per_group,
    )

    df = spark.createDataFrame(
        [("g", 5), ("g", 5), ("g", 3), ("g", 3), ("g", 9)],
        "grp string, v int",
    )
    out = mode_per_group(df, "grp", F.col("v")).collect()
    assert len(out) == 1
    assert (out[0]["mode_value"], out[0]["n_occurrences"]) == (3, 2)


def test_assortativity_star_is_negative(spark):
    """A star graph is maximally disassortative: every edge pairs the
    hub (deg n) with a leaf (deg 1) -> r = -1."""
    from machine_learning_with_spark_streaming_spark.operators.assortativity import (
        degree_assortativity,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5)], "a long, b long"
    )
    r = degree_assortativity(edges).collect()[0]
    assert r["n_edges"] == 4
    assert r["assortativity"] == -1.0


def test_assortativity_regular_graph_is_null(spark):
    """A cycle is degree-regular (zero variance) -> NULL, not NaN."""
    from machine_learning_with_spark_streaming_spark.operators.assortativity import (
        degree_assortativity,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "a long, b long"
    )
    r = degree_assortativity(edges).collect()[0]
    assert r["assortativity"] is None


def test_rolling_mad_known_frame(spark):
    """3-row frame [10, 20, 100]: med_x2 = 40, devs (doubled) =
    |2x-40| = [20, 0, 160] -> sorted [0, 20, 160] -> mad_x4 = 20+20 =
    40 (= 4*MAD, MAD = 10)."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.rollstats import (
        rolling_mad_x4,
    )

    d = dt.date
    daily = spark.createDataFrame(
        [
            ("a", d(2024, 1, 1), 10),
            ("a", d(2024, 1, 2), 20),
            ("a", d(2024, 1, 3), 100),
        ],
        "key string, day date, cents long",
    )
    out = {
        r["day"]: (r["med_x2"], r["mad_x4"])
        for r in rolling_mad_x4(daily, frame_rows=3).collect()
    }
    assert out[d(2024, 1, 1)] == (20, 0)      # [10]
    assert out[d(2024, 1, 2)] == (30, 20)     # [10,20]: med 15, MAD 5
    assert out[d(2024, 1, 3)] == (40, 40)     # [10,20,100]: med 20, MAD 10


def test_expire_snapshots_report_and_physical_delete(spark, tmp_path):
    """keep_last=1 purges older versions' dirs and truncates the log;
    the kept version stays readable and resolve below it now raises."""
    import os

    import pytest

    from machine_learning_with_spark_streaming_spark.sources.timetravel import (
        expire_snapshots,
        read_asof,
        resolve_asof,
        write_snapshot,
    )

    base = str(tmp_path / "store")
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    df2 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    write_snapshot(df1, base, 1, "k")
    write_snapshot(df2, base, 2, "k")

    report = expire_snapshots(spark, base, keep_last=1)
    assert report == [(1, "purged", 1), (2, "kept", 2)]
    assert not os.path.exists(os.path.join(base, "v=1"))
    v, snap = read_asof(spark, base, 99)
    assert v == 2 and snap.count() == 2
    with pytest.raises(ValueError):
        resolve_asof(spark, base, 1)


def test_knn_calibration_unanimous_clusters(spark):
    """Tight separable clusters -> every probe's k neighbors vote
    unanimously -> one calibration row at votes=k with acc_ppm=1e6."""
    from machine_learning_with_spark_streaming_spark.operators.knn import knn_calibration

    rows = []
    for i in range(8):
        rows.append((i, [10.0 + (i % 3), 0.0, 1.0], 0))
        rows.append((100 + i, [0.0, 10.0 + (i % 3), 1.0], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = knn_calibration(emb, emb, k=3, dim=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["votes"], r["n_probes"], r["n_correct"], r["acc_ppm"]) == (
        3,
        16,
        16,
        1000000,
    )


def test_python_datasource_partitions_and_corrupt_lines(spark, tmp_path):
    """The custom JSONL source plans one partition per file, parses
    executor-side, and flags (not kills) malformed lines."""
    import json as _json

    from machine_learning_with_spark_streaming_spark.sources.pydatasource import (
        JsonlDataSource,
    )

    spark.dataSource.register(JsonlDataSource)
    d = tmp_path / "feed"
    d.mkdir()
    (d / "00.jsonl").write_text(
        _json.dumps({"k": 1, "s": "a"}) + "\nNOT JSON\n"
    )
    (d / "01.jsonl").write_text(_json.dumps({"k": 2, "s": "b"}) + "\n")
    df = (
        spark.read.format("mlwss_jsonl")
        .schema("k long, s string, _corrupt boolean")
        .option("path", str(d))
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    rows = sorted(
        ((r["k"], r["s"], r["_corrupt"]) for r in df.collect()),
        key=lambda t: (t[0] is None, t[0] or 0),
    )
    assert rows == [(1, "a", False), (2, "b", False), (None, None, True)]


def test_merge_into_semantics_and_isolation(spark, tmp_path):
    """Hand-checked merge: delete k=1, update k=2, insert k=4 — and the
    pre-merge version still reads back byte-identical."""
    from machine_learning_with_spark_streaming_spark.sources.timetravel import (
        merge_into_snapshot,
        read_asof,
        write_snapshot,
    )

    base = str(tmp_path / "store")
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    write_snapshot(v1, base, 1, "k")
    changes = spark.createDataFrame(
        [(1, None, "D"), (2, "B2", "U"), (4, "d", "I")],
        "k long, v string, op string",
    )
    new_v = merge_into_snapshot(base, changes, "k")
    assert new_v == 2

    _, after = read_asof(spark, base, 2)
    assert sorted((r["k"], r["v"]) for r in after.collect()) == [
        (2, "B2"),
        (3, "c"),
        (4, "d"),
    ]
    _, before = read_asof(spark, base, 1)
    assert sorted((r["k"], r["v"]) for r in before.collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]


def test_robust_stl_reconstruction_identity(spark):
    """4*cents == 2*med_x2 + seasonal_x4 + remainder_x4 holds on every
    row by construction, and a constant series decomposes to zero
    seasonal and zero remainder."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.rollstats import robust_stl

    d0 = dt.date(2024, 1, 1)
    rows = [("a", d0 + dt.timedelta(days=i), 100 + (i % 7) * 10) for i in range(28)]
    daily = spark.createDataFrame(rows, "key string, day date, cents long")
    out = robust_stl(daily).collect()
    assert len(out) == 28
    for r in out:
        assert 4 * r["cents"] == 2 * r["med_x2"] + r["seasonal_x4"] + r["remainder_x4"]

    flat = spark.createDataFrame(
        [("a", d0 + dt.timedelta(days=i), 500) for i in range(14)],
        "key string, day date, cents long",
    )
    for r in robust_stl(flat).collect():
        assert r["seasonal_x4"] == 0 and r["remainder_x4"] == 0


def test_curation_funnel_monotone_and_gates(spark):
    """Funnel mass is monotone non-increasing; a short doc fails the
    word gate; exact duplicate texts collapse to one canonical doc."""
    from machine_learning_with_spark_streaming_spark.operators.curation_v4 import (
        curation_funnel,
    )

    long_text = " ".join(["table scan row batch"] * 15)  # 60 words
    docs = spark.createDataFrame(
        [
            (1, long_text),
            (2, long_text),          # exact dup of 1
            (3, "too short"),        # fails MIN_WORDS
            (4, long_text + " extra word tail here"),
        ],
        "doc_id long, text string",
    )
    out = {r["stage"]: (r["n_docs"], r["word_mass"]) for r in curation_funnel(docs).collect()}
    assert out["1_ingested"][0] == 4
    assert out["2_readable"][0] == 3        # doc 3 gated out
    assert out["3_canonical"][0] == 2       # dup 2 collapsed onto 1
    assert out["1_ingested"][1] >= out["2_readable"][1] >= out["3_canonical"][1]


def test_diverse_seeds_picks_orthogonal_clusters(spark):
    """Three orthogonal clusters + near-dups of seed 0: farthest-first
    never picks a near-dup while an unseen cluster remains."""
    from machine_learning_with_spark_streaming_spark.operators.diverse import diverse_seeds

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # near-dup of 0
        (2, [0.998, 0.02, 0.0]),   # near-dup of 0
        (10, [0.0, 1.0, 0.0]),     # cluster B
        (20, [0.0, 0.0, 1.0]),     # cluster C
    ]
    emb = spark.createDataFrame(
        [(i, v, 0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    )
    out = diverse_seeds(emb, k=3, dim=3).collect()
    picked = [r["vec_id"] for r in sorted(out, key=lambda r: r["round"])]
    assert picked[0] == 0            # smallest id seeds
    assert set(picked[1:]) == {10, 20}   # both orthogonal clusters
    # round-1/2 picks are orthogonal to everything chosen before
    assert all(r["max_cos"] == 0.0 for r in out if r["round"] > 0)


def test_max_drawdown_known_series(spark):
    """Series 10, -4, +2, -5, +20 (cum 10,6,8,3,23): peak path
    10,10,10,10,23 -> drawdowns 0,4,2,7,0 -> max 7 at the day of cum=3;
    negative-free series has drawdown 0 at the first day."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.rollstats import max_drawdown

    d0 = dt.date(2024, 1, 1)
    deltas = [10, -4, 2, -5, 20]
    daily = spark.createDataFrame(
        [("a", d0 + dt.timedelta(days=i), c) for i, c in enumerate(deltas)],
        "key string, day date, cents long",
    )
    r = max_drawdown(daily).collect()[0]
    assert r["max_drawdown"] == 7
    assert r["trough_day"] == d0 + dt.timedelta(days=3)

    up = spark.createDataFrame(
        [("a", d0 + dt.timedelta(days=i), 5) for i in range(4)],
        "key string, day date, cents long",
    )
    r2 = max_drawdown(up).collect()[0]
    assert r2["max_drawdown"] == 0 and r2["trough_day"] == d0


def test_interval_coverage_merge_rules(spark):
    """Overlap merges, adjacency merges, a 2-day gap does not:
    [1-3] + [3-5] + [6-8] merge to [1-8] (8 days); [11-12] stands
    alone (2 days) -> total 10."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.intervals import (
        interval_coverage,
    )

    d = dt.date
    iv = spark.createDataFrame(
        [
            (1, d(2024, 1, 1), d(2024, 1, 3)),
            (1, d(2024, 1, 3), d(2024, 1, 5)),   # overlap
            (1, d(2024, 1, 6), d(2024, 1, 8)),   # adjacent -> merges
            (1, d(2024, 1, 11), d(2024, 1, 12)),  # 2-day gap -> new island
        ],
        "key long, s date, e date",
    )
    out = interval_coverage(iv).collect()
    assert len(out) == 1 and out[0]["covered_days"] == 10


def test_interval_coverage_contained_interval(spark):
    """An interval fully inside a longer earlier one can't reopen an
    island (the running-max-end rule, not lag(e))."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.intervals import (
        interval_coverage,
    )

    d = dt.date
    iv = spark.createDataFrame(
        [
            (1, d(2024, 1, 1), d(2024, 1, 20)),
            (1, d(2024, 1, 2), d(2024, 1, 3)),   # contained
            (1, d(2024, 1, 5), d(2024, 1, 6)),   # contained after short one
        ],
        "key long, s date, e date",
    )
    out = interval_coverage(iv).collect()
    assert out[0]["covered_days"] == 20


def test_pr_curve_known_points(spark):
    """Scores 3,2,1 with labels 1,0,1: thresholds 3/2/1 give
    (tp, fp, fn) = (1,0,1), (1,1,1), (2,1,0) and the matching ppm."""
    from machine_learning_with_spark_streaming_spark.ml.metrics import pr_curve

    df = spark.createDataFrame(
        [(1, 3), (0, 2), (1, 1)], "y int, score_e6 long"
    )
    out = {r["threshold_e6"]: r for r in pr_curve(df).collect()}
    assert (out[3]["tp"], out[3]["fp"], out[3]["fn"]) == (1, 0, 1)
    assert out[3]["prec_ppm"] == 1000000 and out[3]["rec_ppm"] == 500000
    assert (out[2]["tp"], out[2]["fp"], out[2]["fn"]) == (1, 1, 1)
    assert out[2]["prec_ppm"] == 500000
    assert (out[1]["tp"], out[1]["fp"], out[1]["fn"]) == (2, 1, 0)
    assert out[1]["rec_ppm"] == 1000000


def test_hard_negatives_cross_label_only(spark):
    """The mined negative is the nearest DIFFERENT-label row even when
    same-label rows are closer."""
    from machine_learning_with_spark_streaming_spark.operators.knn import hard_negatives

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 7),       # probe, label 7
            (1, [0.999, 0.01], 7),    # closest but same label
            (2, [0.9, 0.1], 3),       # nearest cross-label
            (3, [0.0, 1.0], 3),       # far cross-label
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = hard_negatives(emb, emb.filter("vec_id = 0"), dim=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["query_id"], r["neighbor_id"], r["neg_label"]) == (0, 2, 3)


def test_join_cardinality_identity(spark):
    """Sum of per-key count products equals the materialized join size;
    the top key is the heaviest (ties to smallest key)."""
    from machine_learning_with_spark_streaming_spark.operators.joindiag import (
        join_cardinality,
    )

    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "k long"
    )
    right = spark.createDataFrame(
        [(1,), (2,), (2,), (2,), (9,)], "k long"
    )
    r = join_cardinality(left, right, "k").collect()[0]
    actual = left.join(right, "k").count()
    assert r["join_rows"] == actual == 5  # 2*1 + 1*3
    assert r["n_keys_matched"] == 2
    assert (r["top_key"], r["top_key_rows"]) == (2, 3)


def test_monotonic_violations_counts(spark):
    """key 1: 3,1,2 along the sequence -> one backward step; key 2 is
    clean; NULL values never pair."""
    from machine_learning_with_spark_streaming_spark.operators.stats_tests import (
        monotonic_violations,
    )

    df = spark.createDataFrame(
        [
            (1, 10, 3),
            (1, 20, 1),   # backward
            (1, 30, 2),
            (2, 10, 5),
            (2, 20, 5),   # equal is NOT a violation
            (2, 30, None),
        ],
        "k long, seq long, v long",
    )
    r = monotonic_violations(df, "k", "seq", "v").collect()[0]
    assert r["n_keys_checked"] == 2
    assert r["n_keys_violating"] == 1
    assert r["n_pairs"] == 3  # (3,1),(1,2) for k1; (5,5) for k2
    assert r["n_violations"] == 1


def test_merge_stream_versions_ledger(spark, tmp_path):
    """Each micro-batch commits exactly one version; intermediate
    states remain readable (the history IS the batch ledger)."""
    from machine_learning_with_spark_streaming_spark.sources.timetravel import (
        merge_into_snapshot,
        read_asof,
        write_snapshot,
    )
    from machine_learning_with_spark_streaming_spark.streaming.examples import (
        stage_ordered_files,
    )

    base = str(tmp_path / "store")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    write_snapshot(v1, base, 1, "k")

    b1 = spark.createDataFrame([(3, "c", "I")], "k long, v string, op string")
    b2 = spark.createDataFrame([(1, None, "D")], "k long, v string, op string")
    stage = str(tmp_path / "stage")
    stage_ordered_files([b1, b2], stage)

    stream = (
        spark.readStream.schema("k long, v string, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )

    def apply_batch(df, _bid):
        if not df.isEmpty():
            merge_into_snapshot(base, df, "k")

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    states = {}
    for ver in (1, 2, 3):
        v, snap = read_asof(spark, base, ver)
        states[ver] = sorted((r["k"], r["v"]) for r in snap.collect())
    assert states[1] == [(1, "a"), (2, "b")]
    assert states[2] == [(1, "a"), (2, "b"), (3, "c")]
    assert states[3] == [(2, "b"), (3, "c")]


def test_pca_residual_zero_for_in_subspace_vector(spark):
    """A vector equal to mean + alpha*axis0 has (near-)zero residual;
    a vector orthogonal to all axes has residual ~= its full centered
    energy — ranks strictly above."""
    from machine_learning_with_spark_streaming_spark.functions.pca_artifacts import (
        PCA_COMPONENTS,
        PCA_MEAN,
    )
    from machine_learning_with_spark_streaming_spark.operators.residuals import (
        pca_residual_nano,
    )
    from pyspark.sql import functions as F

    dim = len(PCA_MEAN)
    in_sub = [m + 3.0 * c for m, c in zip(PCA_MEAN, PCA_COMPONENTS[0])]
    # off-manifold: mean + big bump in one coordinate direction (not an
    # exact axis) — residual must dominate
    bump = list(PCA_MEAN)
    bump[0] += 50.0
    df = spark.createDataFrame(
        [(1, in_sub, 0), (2, bump, 0)],
        f"vec_id long, embedding array<double>, label int",
    )
    out = {
        r["vec_id"]: r["r"]
        for r in df.select(
            "vec_id", pca_residual_nano().alias("r")
        ).collect()
    }
    # the frozen axes are orthonormal to ~1e-7 float precision, so the
    # in-subspace residual is tiny but not exactly 0 at alpha=3
    assert abs(out[1]) < 100_000       # < 1e-4 energy in nano units
    assert out[2] > out[1] + 10**9     # clearly off-manifold


def test_equi_depth_bins_balanced_and_ordered(spark):
    """8 rows, 4 bins -> exactly 2 rows per bin; bin ranges are
    non-overlapping and ordered."""
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.depthhist import (
        equi_depth_histogram,
    )

    df = spark.createDataFrame(
        [("g", v) for v in [5, 1, 9, 3, 7, 2, 8, 4]], "grp string, c long"
    )
    out = sorted(
        equi_depth_histogram(df, "grp", F.col("c")).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["n_rows"] for r in out] == [2, 2, 2, 2]
    assert [(r["lo"], r["hi"]) for r in out] == [
        (1, 2),
        (3, 4),
        (5, 7),
        (8, 9),
    ]


def test_funnel_latency_known_deltas(spark):
    """Three converters with deltas 10, 20, 100 us; one non-converter
    (purchase before view) excluded. median_x2 = 40, p90 = rank
    ceil(2.7)=3 -> 100."""
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.sessions import (
        funnel_latency,
    )

    t0 = dt.datetime(2024, 1, 1)
    us = lambda k: t0 + dt.timedelta(microseconds=k)  # noqa: E731
    rows = []
    for u, d in [(1, 10), (2, 20), (3, 100)]:
        rows += [(u, "view", us(0)), (u, "purchase", us(d))]
    rows += [(4, "purchase", us(0)), (4, "view", us(5))]  # backward
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    r = funnel_latency(ev).collect()[0]
    assert r["n_converters"] == 3
    assert r["median_x2_us"] == 40
    assert r["p90_us"] == 100 and r["max_us"] == 100


def test_fisher_separating_dimension_wins(spark):
    """dim 0 separates the classes perfectly (values 0 vs 1), dim 1 is
    identical noise -> dim 0 tops the ranking with a huge ratio, dim 1
    has sb == 0."""
    from machine_learning_with_spark_streaming_spark.operators.fisher import fisher_scores

    rows = [(i, [0.0, 0.5], 0) for i in range(10)] + [
        (100 + i, [1.0, 0.5], 1) for i in range(10)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = fisher_scores(emb, top_k=2).collect()
    # dim 0: within-class variance 0 -> sw == 0 -> fisher NULL (guarded),
    # dim 1: sb == 0
    by_dim = {r["dim"]: r for r in out}
    assert by_dim[0]["sw"] == 0 and by_dim[0]["fisher"] is None
    assert by_dim[0]["sb"] > 0
    assert by_dim[1]["sb"] == 0 and by_dim[1]["sw"] == 0


def test_wap_rejected_write_leaves_store_unchanged(spark, tmp_path):
    """A gated-out write leaves no version, no staging dir, no log row;
    a clean retry then publishes as version 1."""
    import os

    from machine_learning_with_spark_streaming_spark.sources.timetravel import (
        read_asof,
        write_audit_publish,
    )

    base = str(tmp_path / "store")
    bad = spark.createDataFrame([(None, "x"), (1, "y")], "k long, v string")
    good = spark.createDataFrame([(1, "y"), (2, "z")], "k long, v string")

    def gate(staged):
        n_null = staged.filter("k IS NULL").count()
        return n_null == 0, "ok" if n_null == 0 else "null keys"

    ok, ver, reason = write_audit_publish(bad, base, "k", gate)
    assert (ok, ver, reason) == (False, None, "null keys")
    assert not os.path.exists(f"{base}_log")
    assert not os.path.exists(os.path.join(base, "v=1"))

    ok2, ver2, _ = write_audit_publish(good, base, "k", gate)
    assert ok2 and ver2 == 1
    v, snap = read_asof(spark, base, 99)
    assert v == 1 and snap.count() == 2


def test_triplets_pick_nearest_positive_and_negative(spark):
    """Anchor label 7: positive = nearest same-label, negative =
    nearest cross-label; margin_e6 is their rounded-cos difference."""
    from machine_learning_with_spark_streaming_spark.operators.knn import (
        contrastive_triplets,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 7),
            (1, [0.999, 0.01], 7),    # nearest positive
            (2, [0.5, 0.5], 7),       # farther positive
            (3, [0.9, 0.1], 3),       # nearest negative
            (4, [0.0, 1.0], 3),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = contrastive_triplets(emb, emb.filter("vec_id = 0"), dim=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["anchor"], r["positive_id"], r["negative_id"]) == (0, 1, 3)
    assert r["margin_e6"] > 0


def test_sql_scalar_function_inlines(spark, sf_dir):
    """The SQL UDF result equals the inlined expression and the plan
    contains no Python eval node (it is a Catalyst-inlined function)."""
    from machine_learning_with_spark_streaming_spark.operators.sqlfront import (
        q_sql_scalar_function,
    )

    df = q_sql_scalar_function(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = {r["l_returnflag"]: r["revenue_e4"] for r in df.collect()}
    assert len(rows) == 3 and all(v > 0 for v in rows.values())


def test_variant_matches_get_json_object(spark):
    """variant_get typed extraction agrees with the stringly
    get_json_object path on the same payloads, including a missing key
    (both NULL)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [('{"k": 3}',), ('{"k": 41}',), ('{"other": 9}',)], "props string"
    )
    out = df.select(
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("v"),
        F.get_json_object("props", "$.k").cast("int").alias("g"),
    ).collect()
    assert all(r["v"] == r["g"] for r in out)


def test_history_unified_read_nulls_old_versions(spark, tmp_path):
    """Unified history read: the added column is NULL on version-1 rows
    and populated on version-2 rows; version recovered from the path."""
    from machine_learning_with_spark_streaming_spark.sources.timetravel import (
        read_history_unified,
        write_snapshot,
    )

    base = str(tmp_path / "store")
    write_snapshot(
        spark.createDataFrame([(1,), (2,)], "k long"), base, 1, "k"
    )
    write_snapshot(
        spark.createDataFrame([(3, "x")], "k long, extra string"), base, 2, "k"
    )
    hist = read_history_unified(spark, base)
    rows = {(r["v"], r["k"]): r["extra"] for r in hist.collect()}
    assert rows == {(1, 1): None, (1, 2): None, (2, 3): "x"}
