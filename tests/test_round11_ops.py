"""Round-11 additions.

1) SQL front door over the reference's signature shapes (VERDICT r10
   item 3): the DAX rollup grand-total flag, the +/-15% QC verdict, and
   the ABC Pareto classifier as PURE ``spark.sql`` text whose identical
   ANSI statement is also the DuckDB oracle. The front door is what's
   under test — view registration + SQL text parsing + Catalyst
   lowering — so each test checks oracle equality AND that the plan is
   the expected one (Expand for rollup, zero Python eval nodes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sql_rollup_matches_oracle_and_uses_expand(spark, sf_dir, oracle_con):
    from machine_learning_with_spark_streaming_spark.operators.sqlfront import (
        _SQL_ROLLUP,
        q_sql_rollup,
    )

    df = q_sql_rollup(spark, sf_dir)
    plan = _plan(df)
    # ROLLUP lowers to one Expand + a single-shuffle hash aggregate, and
    # the GROUPING() flag stays JVM-side.
    assert "Expand" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert_matches_oracle(df, oracle_con, _SQL_ROLLUP)
    rows = df.collect()
    # exactly one grand-total row, flagged
    gt = [r for r in rows if r["is_grand_total"]]
    assert len(gt) == 1
    assert gt[0]["o_orderstatus"] is None and gt[0]["o_orderpriority"] is None


def test_sql_qc_verdict_matches_oracle_and_edge_rules(spark, sf_dir, oracle_con):
    from machine_learning_with_spark_streaming_spark.operators.sqlfront import (
        _SQL_QC,
        q_sql_qc_verdict,
    )

    df = q_sql_qc_verdict(spark, sf_dir)
    assert "BatchEvalPython" not in _plan(df) and "ArrowEvalPython" not in _plan(df)
    assert_matches_oracle(df, oracle_con, _SQL_QC)
    rows = {r["priority"]: r for r in df.collect()}
    # the 0-baseline edge: 5-LOW is removed from the baseline year, so
    # its verdict must be FAIL with NULL pct_diff (qualitycheck.py:175-180)
    low = rows["5-LOW"]
    assert low["qc"] == "FAIL" and low["pct_diff"] is None
    assert low["baseline_value"] == 0.0


def test_sql_abc_matches_dataframe_form(spark, sf_dir, oracle_con):
    """The SQL-text ABC agrees with the DataFrame-form w1_abc_classify
    row for row — same semantics, second surface."""
    from machine_learning_with_spark_streaming_spark.operators.sqlfront import (
        _SQL_ABC,
        q_sql_abc,
    )
    from machine_learning_with_spark_streaming_spark.operators.windows import q_abc

    df = q_sql_abc(spark, sf_dir)
    assert_matches_oracle(df, oracle_con, _SQL_ABC)
    sql_rows = {(r["brand"], r["partkey"]): (r["revenue"], r["abc"]) for r in df.collect()}
    w1_rows = {
        (r["brand"], r["partkey"]): (r["revenue"], r["abc"])
        for r in q_abc(spark, sf_dir).collect()
    }
    assert sql_rows == w1_rows


# ---------------------------------------------- histogram-bucketed AUC


def test_auc_bucketed_bounds_window_input_on_continuous_scores(spark):
    """Near-continuous scores (all distinct): auc_rank's histogram has
    one row per score, the bucketed form's is capped by range/width —
    and with bins wide enough to merge nothing's ORDER, the rank-sum
    identity keeps the same AUC."""
    from machine_learning_with_spark_streaming_spark.ml.metrics import (
        auc_rank,
        auc_rank_bucketed,
    )
    from pyspark.sql import functions as F

    n = 5000
    # scores 0..n-1 (all distinct); positives are the top 10%
    df = spark.range(n).select(
        F.col("id").cast("long").alias("score_e6"),
        (F.col("id") >= n - n // 10).cast("int").alias("y"),
    )
    exact = auc_rank(df).collect()[0]
    # bin width 1: identical grouping -> identical AUC
    same = auc_rank_bucketed(df, bin_w_e6=1).collect()[0]
    assert (same["n_pos"], same["n_neg"], same["auc_e6"]) == (
        exact["n_pos"],
        exact["n_neg"],
        exact["auc_e6"],
    )
    # wide bins: the histogram the window sorts is capped at range/width
    binned = auc_rank_bucketed(df, bin_w_e6=100)
    row = binned.collect()[0]
    assert row["n_pos"] == exact["n_pos"] and row["n_neg"] == exact["n_neg"]
    # perfectly separable in units of 100 -> AUC still ~1 (ties only
    # inside bins; positives occupy the top bins exclusively except one
    # boundary bin), so bucketed AUC is within one bin's tie mass
    assert abs(row["auc_e6"] - exact["auc_e6"]) < 2_000


def test_auc_bucketed_partition_invariant_and_engine_deterministic(spark):
    """The bucketed statistic is a pure function of (data, bin width):
    repartitioning the input must not move it by a single ppm."""
    from machine_learning_with_spark_streaming_spark.ml.metrics import (
        auc_rank_bucketed,
    )
    from pyspark.sql import functions as F

    df = spark.range(3000).select(
        (F.xxhash64("id") % 1_000_000).alias("score_e6"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(3)) == 0).cast("int").alias("y"),
    )
    a = auc_rank_bucketed(df).collect()[0]
    b = auc_rank_bucketed(df.repartition(17)).collect()[0]
    c = auc_rank_bucketed(df.coalesce(1)).collect()[0]
    assert tuple(a) == tuple(b) == tuple(c)


def test_auc_bucketed_single_class_is_null(spark):
    from machine_learning_with_spark_streaming_spark.ml.metrics import (
        auc_rank_bucketed,
    )
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id").alias("score_e6"), F.lit(1).alias("y")
    )
    row = auc_rank_bucketed(df).collect()[0]
    assert row["auc_e6"] is None and row["n_neg"] == 0


# ------------------------------------------------ distributed xlsx scan


def test_xlsx_datasource_partitions_per_file_and_coerces(spark, tmp_path):
    """mlwss_xlsx plans one InputPartition per workbook, skips headers,
    truncates xlsx floats back into integer fields, and NULL-pads
    missing trailing cells."""
    from machine_learning_with_spark_streaming_spark.sources.pydatasource import (
        XlsxDataSource,
    )
    from machine_learning_with_spark_streaming_spark.sources.xlsx import write_xlsx

    spark.dataSource.register(XlsxDataSource)
    d = str(tmp_path / "books")
    import os

    os.makedirs(d)
    write_xlsx(f"{d}/a.xlsx", [["k", "name", "v"], [1, "x", 1.5], [2, "y", 2.5]])
    # second file: a row with a missing trailing cell
    write_xlsx(f"{d}/b.xlsx", [["k", "name", "v"], [3, "z"]])
    df = (
        spark.read.format("mlwss_xlsx")
        .schema("k long, name string, v double")
        .option("path", d)
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    rows = {r["k"]: (r["name"], r["v"]) for r in df.collect()}
    assert rows == {1: ("x", 1.5), 2: ("y", 2.5), 3: ("z", None)}
    # integer field came back as int despite xlsx storing numerics as floats
    assert all(isinstance(k, int) for k in rows)


def test_xlsx_datasource_sheet_by_name_and_no_header(spark, tmp_path):
    from machine_learning_with_spark_streaming_spark.sources.pydatasource import (
        XlsxDataSource,
    )
    from machine_learning_with_spark_streaming_spark.sources.xlsx import write_xlsx

    spark.dataSource.register(XlsxDataSource)
    d = str(tmp_path / "books2")
    import os

    os.makedirs(d)
    write_xlsx(f"{d}/only.xlsx", [[10, "a"], [20, "b"]], sheet_name="Data")
    df = (
        spark.read.format("mlwss_xlsx")
        .schema("k long, name string")
        .option("path", d)
        .option("sheet", "Data")
        .option("header", "false")
        .load()
    )
    assert sorted((r["k"], r["name"]) for r in df.collect()) == [(10, "a"), (20, "b")]


# ---------------------------------------------- manifest fetch-to-lake


def test_fetch_manifest_to_lake_side_outputs_failures(spark, tmp_path):
    """file:// and plain-path URIs fetch executor-side; a dead URI lands
    in the error side output with the exception text, not a job kill;
    blank lines and # comments in the manifest are skipped."""
    import os

    from machine_learning_with_spark_streaming_spark.sources.fetchlake import (
        fetch_manifest_to_lake,
    )

    store = tmp_path / "store"
    os.makedirs(store)
    (store / "a.bin").write_bytes(b"\x00\x01payload")
    (store / "b.txt").write_text("hello")
    manifest = tmp_path / "m.txt"
    manifest.write_text(
        f"# comment\n\n{store}/a.bin\nfile://{store}/b.txt\n{store}/nope.bin\n"
    )
    data, errors = fetch_manifest_to_lake(
        spark, str(manifest), str(tmp_path / "lake")
    )
    got = {r["uri"].split("/")[-1]: bytes(r["payload"]) for r in data.collect()}
    assert got == {"a.bin": b"\x00\x01payload", "b.txt": b"hello"}
    errs = errors.collect()
    assert len(errs) == 1
    assert errs[0]["uri"].endswith("nope.bin")
    assert "FileNotFoundError" in errs[0]["err"]
    # the lake copies persist past the call — downstream reads hit parquet
    assert spark.read.parquet(str(tmp_path / "lake" / "data")).count() == 2


def test_fetch_datasource_one_partition_per_uri(spark, tmp_path):
    import os

    from machine_learning_with_spark_streaming_spark.sources.fetchlake import (
        FetchDataSource,
    )

    spark.dataSource.register(FetchDataSource)
    store = tmp_path / "s"
    os.makedirs(store)
    paths = []
    for i in range(5):
        p = store / f"f{i}.txt"
        p.write_text(str(i))
        paths.append(str(p))
    manifest = tmp_path / "m.txt"
    manifest.write_text("\n".join(paths))
    df = spark.read.format("mlwss_fetch").option("manifest", str(manifest)).load()
    assert df.rdd.getNumPartitions() == 5
    assert df.filter("fetched").count() == 5


def test_publish_lake_to_store_writes_files_and_rejects_traversal(spark, tmp_path):
    """Accepted resources land as files whose bytes match the receipt;
    the traversal name is rejected BEFORE any write (no file appears
    anywhere), and no temp files are left behind."""
    import hashlib
    import os

    from machine_learning_with_spark_streaming_spark.sources.fetchlake import (
        publish_lake_to_store,
    )

    store = tmp_path / "store"
    os.makedirs(store)
    df = spark.createDataFrame(
        [
            ("a.txt", bytearray(b"alpha")),
            ("b.bin", bytearray(b"\x00\xff")),
            ("../evil.txt", bytearray(b"x")),
            ("sub/dir.txt", bytearray(b"x")),
            (".hidden", bytearray(b"x")),
        ],
        "resource string, payload binary",
    )
    rows = {r["resource"]: r for r in publish_lake_to_store(df, str(store)).collect()}
    assert rows["a.txt"]["published"] and rows["b.bin"]["published"]
    for bad in ("../evil.txt", "sub/dir.txt", ".hidden"):
        assert not rows[bad]["published"]
        assert rows[bad]["err"] == "unsafe resource name"
    assert (store / "a.txt").read_bytes() == b"alpha"
    assert (store / "b.bin").read_bytes() == b"\x00\xff"
    assert rows["a.txt"]["md5"] == hashlib.md5(b"alpha").hexdigest()
    assert rows["b.bin"]["n_bytes"] == 2
    # nothing escaped the store root; nothing else was created
    assert sorted(os.listdir(store)) == ["a.txt", "b.bin"]
    assert not (tmp_path / "evil.txt").exists()


def test_pr_curve_bucketed_is_pr_curve_of_snapped_scores(spark):
    """Edge-snapping then pr_curve equals pr_curve_bucketed by
    construction; recall is monotone decreasing in threshold and the
    curve row count is capped by range/width."""
    from machine_learning_with_spark_streaming_spark.ml.metrics import (
        pr_curve,
        pr_curve_bucketed,
    )
    from pyspark.sql import functions as F

    df = spark.range(2000).select(
        (F.xxhash64("id") % 100_000).alias("score_e6"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(4)) == 0).cast("int").alias("y"),
    )
    w = 10_000
    curve = pr_curve_bucketed(df, bin_w_e6=w).collect()
    assert 0 < len(curve) <= (200_000 // w) + 1
    lo = df.agg(F.min("score_e6")).first()[0]
    snapped = df.select(
        "y",
        (F.lit(lo) + ((F.col("score_e6") - lo) / w).cast("long") * w)
        .cast("long")
        .alias("score_e6"),
    )
    # snapped scores are non-negative-shifted so int-div == floor here
    direct = pr_curve(snapped).collect()
    assert [tuple(r) for r in curve] == [tuple(r) for r in direct]
    recs = [r["rec_ppm"] for r in curve]
    assert recs == sorted(recs, reverse=True)


# --------------------------------------------------- KMV set algebra


def test_kmv_set_ops_matches_oracle(spark, sf_dir, oracle_con):
    from machine_learning_with_spark_streaming_spark.operators.kmv import _KMV_ORACLE, q_kmv_set_ops

    df = q_kmv_set_ops(spark, sf_dir)
    assert "CartesianProduct" not in _plan(df)
    assert_matches_oracle(df, oracle_con, _KMV_ORACLE)


def test_kmv_sketch_invariant_to_shards_and_partitioning(spark):
    """k smallest is k smallest: NSHARDS (the phase-1 fan-out) and the
    input partitioning must not change a single sketch row."""
    from machine_learning_with_spark_streaming_spark.operators.kmv import kmv_sketch

    df = spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("grp"), F.col("id").alias("uid")
    )
    base = sorted(
        tuple(r) for r in kmv_sketch(df, "grp", "uid", k=32, nshards=64).collect()
    )
    for variant in (
        kmv_sketch(df, "grp", "uid", k=32, nshards=7),
        kmv_sketch(df.repartition(13, "uid"), "grp", "uid", k=32, nshards=64),
    ):
        assert sorted(tuple(r) for r in variant.collect()) == base
    per_key = {}
    for grp, _h in base:
        per_key[grp] = per_key.get(grp, 0) + 1
    assert all(v == 32 for v in per_key.values())


def test_kmv_unsaturated_sketch_is_exact(spark):
    """Below k distinct ids the estimator must return EXACT counts —
    including the intersection (rho over an exact union)."""
    from machine_learning_with_spark_streaming_spark.operators.kmv import (
        kmv_pair_estimates,
        kmv_sketch,
    )

    rows = [("a", i) for i in range(20)] + [("b", i) for i in range(10, 40)]
    df = spark.createDataFrame(rows, "key string, uid long")
    out = kmv_pair_estimates(kmv_sketch(df, "key", "uid")).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["est_a"], r["est_b"]) == (20, 30)
    assert r["est_union"] == 40 and r["est_common"] == 10
    assert r["jaccard_ppm"] == 10 * 1_000_000 // 40


def test_kmv_estimate_within_bound_when_saturated(spark):
    """k=64 on 1000-distinct keys: the (k-1)/u_k estimate lands within
    the ~3/sqrt(k) relative band (38% at k=64; observed ~5%)."""
    from machine_learning_with_spark_streaming_spark.operators.kmv import (
        kmv_pair_estimates,
        kmv_sketch,
    )

    rows = [("a", i) for i in range(1000)] + [("b", i) for i in range(500, 1500)]
    df = spark.createDataFrame(rows, "key string, uid long")
    r = kmv_pair_estimates(kmv_sketch(df, "key", "uid")).collect()[0]
    for est, truth in ((r["est_a"], 1000), (r["est_b"], 1000), (r["est_union"], 1500)):
        assert abs(est - truth) / truth < 0.38, (est, truth)


# ------------------------------------------------ binned calibration


def test_calibration_bins_matches_oracle(spark, sf_dir, oracle_con):
    from machine_learning_with_spark_streaming_spark.ml.calibration import (
        _CALIBRATION_ORACLE,
        q_calibration_bins,
    )

    df = q_calibration_bins(spark, sf_dir)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert_matches_oracle(df, oracle_con, _CALIBRATION_ORACLE)
    # all-BIGINT surface: the exactness contract is no doubles at all
    assert all(f.dataType.simpleString() == "bigint" for f in df.schema.fields)


def test_calibration_total_row_is_ece_of_curve(spark):
    from machine_learning_with_spark_streaming_spark.ml.calibration import calibration_bins

    df = spark.range(4000).select(
        (F.pmod(F.xxhash64("id"), F.lit(2)) == 0).cast("int").alias("y"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(4_000_001)) - 2_000_000)
        .cast("long")
        .alias("margin_e6"),
    )
    rows = {r["bin"]: r for r in calibration_bins(df).collect()}
    curve = [r for b, r in rows.items() if b >= 0]
    total = rows[-1]
    n = sum(r["n"] for r in curve)
    assert total["n"] == n == 4000
    assert total["n_pos"] == sum(r["n_pos"] for r in curve)
    assert total["gap_e6"] == sum(r["n"] * r["gap_e6"] for r in curve) // n


def test_calibration_perfectly_calibrated_input_has_near_zero_ece(spark):
    """y drawn to match the algebraic-sigmoid probability bin-for-bin
    (deterministic hash draw): every bin's gap collapses, so ECE is
    small while a miscalibrated scorer's is not."""
    from machine_learning_with_spark_streaming_spark.ml.calibration import calibration_bins

    base = spark.range(20000).select(
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(4_000_001)) - 2_000_000)
        .cast("long")
        .alias("margin_e6"),
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(1_000_000)).alias("u"),
    )
    p = F.expr("500000 + (margin_e6 * 500000) div (1000000 + abs(margin_e6))")
    good = base.select((F.col("u") < p).cast("int").alias("y"), "margin_e6")
    bad = base.select(F.lit(1).alias("y"), "margin_e6")
    ece_good = {r["bin"]: r for r in calibration_bins(good).collect()}[-1]["gap_e6"]
    ece_bad = {r["bin"]: r for r in calibration_bins(bad).collect()}[-1]["gap_e6"]
    assert ece_good < 25_000  # < 2.5 pp from a 20k hash draw
    assert ece_bad > 10 * ece_good


def test_kmv_rollup_merge_equals_direct_sketch(spark):
    """k-min composability: merging day partials must reproduce the
    direct month sketch row-for-row (the identity the a25 oracle
    certifies cross-engine; here proven engine-side on synthetic data
    where users deliberately span many days)."""
    from machine_learning_with_spark_streaming_spark.operators.kmv import kmv_merge, kmv_sketch

    rows = [
        ("a", f"2024-01-{(i % 28) + 1:02d}", i % 300) for i in range(3000)
    ] + [("b", f"2024-02-{(i % 28) + 1:02d}", i % 150) for i in range(1500)]
    df = spark.createDataFrame(rows, "key string, day string, uid long").select(
        "key", F.to_date("day").alias("day"), "uid"
    )
    daily = kmv_sketch(df, ["key", "day"], "uid", k=32)
    merged = kmv_merge(
        daily.withColumn("month", F.date_trunc("month", "day").cast("date")),
        ["key", "month"],
        k=32,
    )
    direct = kmv_sketch(
        df.withColumn("month", F.date_trunc("month", "day").cast("date")),
        ["key", "month"],
        "uid",
        k=32,
    )
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in direct.select("key", "month", "h").collect()
    )


def test_kmv_merge_idempotent(spark):
    from machine_learning_with_spark_streaming_spark.operators.kmv import kmv_merge, kmv_sketch

    df = spark.range(500).select(
        F.lit("k").alias("key"), F.col("id").alias("uid")
    )
    sk = kmv_sketch(df, "key", "uid", k=16)
    twice = kmv_merge(sk.unionByName(sk), ["key"], k=16)
    assert sorted(tuple(r) for r in twice.collect()) == sorted(
        tuple(r) for r in sk.collect()
    )


def test_kmv_stream_state_is_batching_invariant(spark, sf_dir, oracle_con):
    """The registered 4-batch run's FINAL version must equal the batch
    KMV of all events (oracle certifies every prefix; this pins the
    engine-side identity explicitly too)."""
    from machine_learning_with_spark_streaming_spark.operators.kmv import _est, kmv_sketch
    from machine_learning_with_spark_streaming_spark.schemas import load_table
    from machine_learning_with_spark_streaming_spark.streaming.kmv_stream import (
        _KMV_STREAM_ORACLE,
        q_kmv_distinct_stream,
    )

    out = q_kmv_distinct_stream(spark, sf_dir)
    assert_matches_oracle(out, oracle_con, _KMV_STREAM_ORACLE)
    final = {
        (r["key"],): (r["sketch_rows"], r["est_users"])
        for r in out.collect()
        if r["version"] == 4
    }
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_id").isNotNull()
    )
    batch = (
        kmv_sketch(events, "event_type", "user_id")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("h").alias("kth"))
        .select("key", "cnt", _est(F.col("cnt"), "kth", 64).alias("est"))
    )
    for r in batch.collect():
        assert final[(r["key"],)] == (r["cnt"], r["est"])


# -------------------------------------- prefix-filtered Jaccard join


def test_prefix_filter_equals_inverted_index_pairs(spark, sf_dir):
    """Lossless pruning: identical (id_a, id_b, jaccard) rows as the
    plain inverted-index path on the duplicated corpus."""
    from machine_learning_with_spark_streaming_spark.operators.dedup import (
        corpus_with_duplicates,
        jaccard_pairs,
    )
    from machine_learning_with_spark_streaming_spark.operators.ppjoin import (
        prefix_filtered_jaccard_pairs,
    )

    corpus = corpus_with_duplicates(spark, sf_dir)
    base = sorted(tuple(r) for r in jaccard_pairs(corpus).collect())
    pref = sorted(
        tuple(r) for r in prefix_filtered_jaccard_pairs(corpus).collect()
    )
    assert pref == base and len(base) > 0


def test_prefix_filter_shrinks_candidates(spark, sf_dir):
    from machine_learning_with_spark_streaming_spark.operators.dedup import (
        corpus_with_duplicates,
        jaccard_candidates,
        shingle_table,
    )
    from machine_learning_with_spark_streaming_spark.operators.ppjoin import prefix_candidates

    sh = shingle_table(corpus_with_duplicates(spark, sf_dir))
    full = jaccard_candidates(sh).count()
    pref = prefix_candidates(sh, 0.8).count()
    assert pref < full / 10, (pref, full)


def test_prefix_filter_recall_on_skewed_df_corpus(spark):
    """Near-dup pairs whose shared shingles are dominated by one hot
    boilerplate shingle: the stop-shingle cut path can drop such pairs
    (documented recall caveat); the prefix filter must NOT — its
    prefixes favor rare shingles but the theorem guarantees a shared
    prefix element for every qualifying pair."""
    from machine_learning_with_spark_streaming_spark.operators.ppjoin import (
        prefix_filtered_jaccard_pairs,
    )

    boiler = "terms of service apply to all users always"
    rows = []
    for i in range(30):
        body = f"unique text block number {i} says thing {i * 7} and {i * 13}"
        rows.append((2 * i, f"{boiler} {body}"))
        rows.append((2 * i + 1, f"{boiler} {body}"))  # exact near-dup
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = prefix_filtered_jaccard_pairs(df).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    for i in range(30):
        assert (2 * i, 2 * i + 1) in found


def test_bloom_write_size_delta_and_dictionary_interaction(spark, sf_dir):
    """The filter bytes must land when dictionary encoding is off, and
    parquet-mr must SKIP them for fully dict-encoded chunks (the
    documented small-scale trap)."""
    import glob
    import os
    import tempfile

    from machine_learning_with_spark_streaming_spark.schemas import load_table
    from machine_learning_with_spark_streaming_spark.sources.bloomwrite import write_with_bloom

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).coalesce(1)
    w = tempfile.mkdtemp(prefix="mlwss_k13t_")

    def size(p):
        return sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(p, "part-*.parquet"))
        )

    li.write.mode("overwrite").option(
        "parquet.enable.dictionary", "false"
    ).parquet(f"{w}/plain")
    write_with_bloom(li, f"{w}/bloom", ["l_orderkey"])
    assert size(f"{w}/bloom") > size(f"{w}/plain")

    li.write.mode("overwrite").parquet(f"{w}/dict_plain")
    write_with_bloom(li, f"{w}/dict_bloom", ["l_orderkey"], dictionary=True)
    assert size(f"{w}/dict_bloom") == size(f"{w}/dict_plain")

    back = spark.read.parquet(f"{w}/bloom")
    assert back.count() == li.count()


def test_curation_v5_funnel_monotone_and_dedup_cuts(spark, sf_dir, oracle_con):
    from machine_learning_with_spark_streaming_spark.operators.curation_v5 import (
        _V5_ORACLE,
        q_curation_v5,
    )

    df = q_curation_v5(spark, sf_dir)
    assert_matches_oracle(df, oracle_con, _V5_ORACLE)
    rows = {r["stage"]: r for r in df.collect()}
    a, b = rows["1_ingested"], rows["2_near_dedup"]
    # injected near/exact copies must be cut, never grown
    assert b["n_docs"] < a["n_docs"]
    assert b["word_mass"] < a["word_mass"]
    assert 0 < b["est_vocab"] <= a["est_vocab"]
    assert all(
        f.dataType.simpleString() in ("bigint", "string")
        for f in df.schema.fields
    )
