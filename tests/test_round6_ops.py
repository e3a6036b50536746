"""Semantic unit tests for the round-6 operators (OHLC resample,
word entropy, k-anonymity gate, matryoshka truncate+renorm, hive
partition pruning). Cross-engine value certification is verify_all's
job; these pin the operator semantics on tiny controlled inputs."""

import math
from datetime import datetime

from pyspark.sql import functions as F


def test_ohlc_resample_bar_semantics(spark):
    from machine_learning_with_spark_streaming_spark.operators.reshape import ohlc_resample

    t = lambda m, s=0: datetime(2024, 1, 1, 10, m, s)  # noqa: E731
    rows = [
        # (key, ts, id, value) — one hourly bucket for key "a"
        ("a", t(5), 1, 3.0),    # open (earliest ts)
        ("a", t(30), 2, 9.0),   # high
        ("a", t(40), 3, 1.0),   # low
        ("a", t(59), 4, 5.0),   # close (latest ts)
        # same-ts tie: event_id breaks it deterministically
        ("b", t(0), 10, 2.0),   # open (tie on ts, lower id)
        ("b", t(0), 11, 7.0),
        ("b", t(50), 12, 4.0),  # close
        # null value rows are excluded
        ("b", t(55), 13, None),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    out = {
        r.event_type: r
        for r in ohlc_resample(df, "event_type", "ts", "value").collect()
    }
    a, b = out["a"], out["b"]
    assert (a.open, a.high, a.low, a.close, a.n_events) == (3.0, 9.0, 1.0, 5.0, 4)
    assert a.value_sum == 18.0
    assert (b.open, b.close, b.n_events) == (2.0, 4.0, 3)


def test_word_entropy_values(spark):
    from machine_learning_with_spark_streaming_spark.operators.text import word_entropy

    rows = [
        (1, "spam spam spam spam"),        # one word: entropy 0
        (2, "alpha beta gamma delta"),     # uniform 4: ln(4)
        (3, "  "),                         # no words: drops out
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in word_entropy(df).collect()}
    assert set(got) == {1, 2}
    assert got[1].entropy == 0.0
    assert got[1].n_words == 4 and got[1].n_distinct == 1
    assert got[1].distinct_ratio == 0.25
    assert abs(got[2].entropy - round(math.log(4), 6)) < 1e-9
    assert got[2].distinct_ratio == 1.0


def test_k_anonymity_gate_suppresses_small_groups(spark):
    from machine_learning_with_spark_streaming_spark.operators.pii import k_anonymity_gate

    rows = [("us", "A")] * 5 + [("us", "B")] * 2 + [("de", "A")] * 1
    df = spark.createDataFrame(rows, "country string, seg string")
    out = k_anonymity_gate(df, ["country", "seg"], k=3).collect()
    rel = [r for r in out if r.verdict == "released"]
    sup = [r for r in out if r.verdict == "suppressed"]
    assert len(rel) == 1 and (rel[0].country, rel[0].seg, rel[0].n_rows) == (
        "us", "A", 5,
    )
    assert len(sup) == 1
    assert sup[0].country is None and sup[0].seg is None
    assert (sup[0].n_rows, sup[0].n_groups) == (3, 2)  # 2 + 1 rows, 2 groups

    # all-released edge: the suppressed accounting row is still emitted
    out2 = k_anonymity_gate(df, ["country", "seg"], k=1).collect()
    sup2 = [r for r in out2 if r.verdict == "suppressed"]
    assert len(sup2) == 1 and (sup2[0].n_rows, sup2[0].n_groups) == (0, 0)


def test_truncate_renormalize_known_vectors(spark):
    from machine_learning_with_spark_streaming_spark.operators.similarity import (
        truncate_renormalize,
    )

    v_ones = [1.0] * 16 + [0.0] * 48     # prefix norm 4, all energy kept
    v_tail = [0.0] * 16 + [2.0] * 48     # zero prefix: guarded checksum
    df = spark.createDataFrame(
        [(1, v_ones), (2, v_tail)], "vec_id long, embedding array<float>"
    )
    got = {r.vec_id: r for r in truncate_renormalize(df).collect()}
    assert got[1].prefix_norm == 4.0
    assert got[1].energy_ratio == 1.0
    assert got[1].renorm_checksum == 4.0  # sum 16 / norm 4
    assert got[2].prefix_norm == 0.0
    assert got[2].energy_ratio == 0.0
    assert got[2].renorm_checksum == 0.0  # zero-norm guard


def test_hive_partitioned_scan_prunes(spark, sf_dir, tmp_path):
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    tbl = str(tmp_path / "orders_part")
    load_table(spark, sf_dir, "orders").write.partitionBy(
        "o_orderpriority"
    ).parquet(tbl)
    part = spark.read.parquet(tbl).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plan = part._jdf.queryExecution().executedPlan().toString()
    # the partition predicate prunes at planning time, it is not a
    # post-scan data filter
    assert "PartitionFilters" in plan
    assert "o_orderpriority" in plan.split("PartitionFilters")[1].split("]")[0]
    # pruned read returns exactly the partition's rows
    n_all = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).count()
    assert part.count() == n_all


def test_fk_orphan_report_counts(spark):
    from machine_learning_with_spark_streaming_spark.operators.validation import fk_orphan_report

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (99,), (None,)], "k long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "p long")
    out = fk_orphan_report([("rel", child, "k", parent, "p")]).collect()
    assert len(out) == 1
    r = out[0]
    # 99 (x2 rows) is an orphan key; the NULL row counts as an orphan
    # row but not an orphan key
    assert (r.n_child_rows, r.n_orphan_rows, r.n_orphan_keys, r.passed) == (
        6, 3, 1, False,
    )

    clean = spark.createDataFrame([(1,), (2,)], "k long")
    r2 = fk_orphan_report([("ok", clean, "k", parent, "p")]).collect()[0]
    assert (r2.n_orphan_rows, r2.n_orphan_keys, r2.passed) == (0, 0, True)


def test_malformed_jsonl_accounting(spark):
    import __spark_entry__ as E

    r = E.queries()["s20_malformed_jsonl"](spark, "unused").collect()[0]
    assert (r.n_lines, r.n_good, r.n_corrupt) == (12, 8, 4)
    assert r.qty_cents == 4125  # corrupt lines contribute nothing
    assert r.n_tags == 4


def test_time_weighted_avg_step_function(spark):
    from machine_learning_with_spark_streaming_spark.operators.windows import time_weighted_avg

    t = lambda h: datetime(2024, 3, 1, h, 0)  # noqa: E731
    rows = [
        # value 10 holds 06:00-18:00 (12h), value 30 holds 18:00-24:00
        # (6h): twap = (10*12 + 30*6)/18 = 16.666667
        ("a", t(6), 1, 10.0),
        ("a", t(18), 2, 30.0),
        # single observation holds to midnight: twap = its value
        ("b", t(12), 3, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    got = {
        r.event_type: r
        for r in time_weighted_avg(df, "event_type", "ts", "value").collect()
    }
    assert got["a"].twap == 16.666667
    assert got["a"].n_events == 2
    assert got["b"].twap == 5.0


def test_sign_binarize_and_hamming(spark):
    from machine_learning_with_spark_streaming_spark.operators.similarity import (
        hamming_topk,
        sign_binarize,
    )

    base = [1.0] * 32 + [-1.0] * 32          # lo all ones, hi zero
    flip2 = list(base)
    flip2[0] = -1.0                           # flip bit 0 of lo
    flip2[40] = 1.0                           # flip bit 8 of hi
    far = [-x for x in base]                  # all 64 bits differ
    df = spark.createDataFrame(
        [(0, base), (1, flip2), (2, far)],
        "vec_id long, embedding array<float>",
    )
    sig = sign_binarize(df)
    s = {r.vec_id: (r.sig_lo, r.sig_hi) for r in sig.collect()}
    assert s[0] == (0xFFFFFFFF, 0)            # 32 sign bits set, none above
    top = hamming_topk(sig, sig.filter(F.col("vec_id") == 0), k=2).collect()
    assert [(r.rank, r.neighbor_id, r.hamming) for r in top] == [
        (1, 1, 2),
        (2, 2, 64),
    ]


def test_cube_grouping_margins(spark):
    import __spark_entry__ as E

    out = E.queries()["a18_cube_grouping"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    # grand total: both flags set, exactly once, counts everything
    gt = [r for r in rows if (r.g_seg, r.g_nat) == (1, 1)]
    assert len(gt) == 1
    total = gt[0].n_rows
    # one-way margins each re-sum to the grand total
    seg_margin = [r for r in rows if (r.g_seg, r.g_nat) == (0, 1)]
    nat_margin = [r for r in rows if (r.g_seg, r.g_nat) == (1, 0)]
    assert sum(r.n_rows for r in seg_margin) == total
    assert sum(r.n_rows for r in nat_margin) == total
    assert sum(r.bal_cents for r in seg_margin) == gt[0].bal_cents
    # detail slices re-sum too
    detail = [r for r in rows if (r.g_seg, r.g_nat) == (0, 0)]
    assert sum(r.n_rows for r in detail) == total


def test_linear_trend_exact_line(spark):
    from machine_learning_with_spark_streaming_spark.ml.examples import linear_trend

    # y = 2x + 3 exactly, x in whole days since the origin
    rows = [
        ("a", datetime(2024, 1, 1 + d), i, 2.0 * d + 3.0)
        for i, d in enumerate([0, 1, 2, 5, 10])
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    r = linear_trend(df, "event_type", "ts", "value").collect()[0]
    assert (r.n, r.slope_per_day, r.intercept) == (5, 2.0, 3.0)


def test_percentile_normalize_ties(spark):
    from machine_learning_with_spark_streaming_spark.operators.windows import (
        percentile_normalize,
    )

    rows = [("a", 1, 10.0), ("a", 2, 10.0), ("a", 3, 20.0), ("a", 4, 30.0),
            ("b", 5, 7.0)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    got = {r.event_id: r.pctile for r in
           percentile_normalize(df, "event_type", "value").collect()}
    # ties share the rank regardless of row order; (rank-1)/(n-1)
    assert got[1] == got[2] == 0.0
    assert got[3] == 0.666667
    assert got[4] == 1.0
    assert got[5] == 0.0  # singleton group


def test_ks_drift_planted_distributions(spark):
    from machine_learning_with_spark_streaming_spark.operators.validation import ks_drift

    rows = [(float(v), True) for v in (1, 2, 3, 4)] + [
        (float(v), False) for v in (3, 4, 5, 6)
    ]
    df = spark.createDataFrame(rows, "value double, old boolean")
    r = ks_drift(df, "value", F.col("old")).collect()[0]
    # max ECDF gap is 0.5 (at v=2 and v=4); integer numerator 2*4-0*4=8
    assert (r.n_old, r.n_new, r.d_num, r.ks_d) == (4, 4, 8, 0.5)

    same = spark.createDataFrame(
        [(float(v), b) for v in (1, 2, 3) for b in (True, False)],
        "value double, old boolean",
    )
    r2 = ks_drift(same, "value", F.col("old")).collect()[0]
    assert (r2.d_num, r2.ks_d) == (0, 0.0)


def test_poisson_bootstrap_deterministic_and_sane(spark):
    from machine_learning_with_spark_streaming_spark.operators.sampling import (
        poisson_bootstrap_weights,
    )

    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    w = poisson_bootstrap_weights(docs, n_replicates=2)
    rows = w.collect()
    again = {(r.doc_id, r.replicate): r.weight for r in w.collect()}
    for r in rows:  # pure function of (key, replicate)
        assert again[(r.doc_id, r.replicate)] == r.weight
    import collections

    per_rep = collections.Counter()
    for r in rows:
        per_rep[r.replicate] += r.weight
    # Poisson(1): total weight ~ n within a few percent at n=2000
    for rep in (0, 1):
        assert abs(per_rep[rep] - 2000) < 2000 * 0.1
    # replicates differ from each other
    assert any(
        again[(d, 0)] != again[(d, 1)] for d in range(100)
    )


def test_multiline_json_array_roundtrip(spark):
    import __spark_entry__ as E

    rows = {r.tag: r for r in
            E.queries()["s21_multiline_json_array"](spark, "unused").collect()}
    assert rows["alpha"].n_rows == 3
    assert rows["alpha"].qty_cents == 1315  # 2.50 + 1.25 + 9.40
    assert rows["beta"].qty_cents == 710
    assert rows["gamma"].qty_cents == 75


def test_eval_holdout_populations_disjoint_and_complete(spark):
    import __spark_entry__ as E

    rows = {r.split: r for r in
            E.queries()["pipeline_eval_holdout"](spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) <= {"train", "val", "test", "contaminated", "eval"}
    import duckdb

    total = duckdb.sql(
        "select count(*), sum(n_chars) from "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchall()[0]
    # the five populations partition the corpus exactly
    assert sum(r.n_docs for r in rows.values()) == total[0]
    assert sum(r.sum_chars for r in rows.values()) == total[1]
    assert rows["eval"].n_docs > 0


def test_cluster_stats_masses_reconcile(spark):
    import __spark_entry__ as E

    q = E.queries()
    hist = q["dedup_cluster_stats"](spark, "/root/testdata/sf0.001").collect()
    cc = q["dedup_connected_components"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    # histogram doc mass == component table rows; cluster count matches
    assert sum(r.n_docs for r in hist) == len(cc)
    assert sum(r.n_clusters for r in hist) == len({r.component for r in cc})
    # the duplicate-injected corpus has at least one multi-doc cluster
    assert any(r.cluster_size > 1 for r in hist)


def test_ewma_smooth_known_series(spark):
    from machine_learning_with_spark_streaming_spark.operators.windows import ewma_smooth

    # one event per day, values 10, 20, 40: EWMA weights renormalize
    # over the present lags
    rows = [
        ("a", datetime(2024, 1, 1, 12), 10.0),
        ("a", datetime(2024, 1, 2, 12), 20.0),
        ("a", datetime(2024, 1, 3, 12), 40.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = {str(r.day): r.ewma for r in
           ewma_smooth(df, "event_type", "ts", "value").collect()}
    assert got["2024-01-01"] == 10.0                      # only itself
    assert got["2024-01-02"] == round((2 * 20 + 10) / 3, 6)
    assert got["2024-01-03"] == round((4 * 40 + 2 * 20 + 10) / 7, 6)


def test_dynamic_partition_overwrite_is_surgical(spark, sf_dir, tmp_path):
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    tbl = str(tmp_path / "part")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderpriority").parquet(tbl)
    before = {
        r.o_orderpriority: r.n
        for r in spark.read.parquet(tbl)
        .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # dynamic overwrite touching ONLY 1-URGENT
    (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderstatus") != "F")
        )
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderpriority")
        .parquet(tbl)
    )
    after = {
        r.o_orderpriority: r.n
        for r in spark.read.parquet(tbl)
        .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # untouched partitions byte-identical in count; urgent shrank
    for p in before:
        if p != "1-URGENT":
            assert after[p] == before[p]
    assert after["1-URGENT"] < before["1-URGENT"]
    # in STATIC mode the same write WOULD have wiped the others
    assert set(after) == set(before)


def test_langid_confusion_reconciles(spark):
    import __spark_entry__ as E

    rows = E.queries()["text_langid_confusion"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    import duckdb

    total = duckdb.sql(
        "select count(*) from read_parquet("
        "'/root/testdata/sf0.001/documents.parquet')"
    ).fetchall()[0][0]
    assert sum(r.n_docs for r in rows) == total
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    # diagonal cells are exactly their n_docs; off-diagonal are 0 correct
    for r in rows:
        assert r.n_correct == (r.n_docs if r.true_lang == r.pred_lang else 0)
