"""Property tests for deterministic hash sampling (operators/sampling.py)."""

from pyspark.sql import functions as F

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


def test_cap_per_group_deterministic(spark):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [("a", i, i % 3) for i in range(9)] + [("b", 100, 0)],
        "g string, id long, prio long",
    )
    out = cap_per_group(df, ["g"], [F.col("prio").desc(), F.col("id")], 2)
    got = sorted((r["g"], r["id"]) for r in out.collect())
    # group a: prio 2 rows are ids 2,5,8 -> keep 2,5; group b: only row
    assert got == [("a", 2), ("a", 5), ("b", 100)]


def test_pack_token_budget_chunks(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from machine_learning_with_spark_streaming_spark.operators.sampling import pack_token_budget

    df = spark.createDataFrame(
        [(i, "s", 300) for i in range(5)], "doc_id long, source string, t long"
    )
    out = {r["doc_id"]: r["chunk_id"] for r in pack_token_budget(df, 1000, "t").collect()}
    # exclusive cumsums: 0,300,600,900,1200 -> chunks 0,0,0,0,1
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 1}


def test_pack_token_budget_exact_greedy_reset(spark):
    from machine_learning_with_spark_streaming_spark.operators.sampling import (
        pack_token_budget_exact,
    )

    df = spark.createDataFrame(
        [
            (0, "s", 400),
            (1, "s", 400),
            (2, "s", 400),   # 400+400=800, +400 > 1000 -> reset
            (3, "s", 1500),  # over-budget doc gets its own chunk
            (4, "s", 100),
        ],
        "doc_id long, source string, t long",
    )
    out = {
        r["doc_id"]: r["chunk_id"]
        for r in pack_token_budget_exact(df, 1000, "t").collect()
    }
    assert out == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3}


def test_shard_assignment_deterministic_and_balanced(spark, sf_dir):
    from machine_learning_with_spark_streaming_spark.operators.sampling import shard_assignment
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {
        r["doc_id"]: r["shard"]
        for r in shard_assignment(docs, 8).select("doc_id", "shard").collect()
    }
    # partitioning-invariant: same assignment from a repartitioned frame
    b = {
        r["doc_id"]: r["shard"]
        for r in shard_assignment(docs.repartition(7), 8)
        .select("doc_id", "shard")
        .collect()
    }
    assert a == b
    assert set(a.values()) <= set(range(8))
    # roughly balanced: no shard more than 2x the ideal share
    from collections import Counter

    counts = Counter(a.values())
    assert max(counts.values()) <= 2 * (len(a) / 8)


def test_write_shards_layout_and_membership(spark, sf_dir, tmp_path):
    import os

    from machine_learning_with_spark_streaming_spark.operators.sampling import (
        shard_assignment,
        write_shards,
    )
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    write_shards(docs, out, n_shards=4)
    dirs = sorted(
        d for d in os.listdir(out) if d.startswith("shard=")
    )
    assert dirs == [f"shard={k}" for k in range(4)]
    back = spark.read.parquet(out)
    expected = shard_assignment(docs, 4).select("doc_id", "shard")
    got = back.select("doc_id", "shard")
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in expected.collect()
    }


def test_assign_split_group_atomic_and_deterministic(spark, sf_dir):
    import pytest
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.sampling import assign_split
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = assign_split(docs, key_col="source")
    # group-atomic: every source maps to exactly one split
    multi = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert multi == 0
    # deterministic across partitionings
    a = {tuple(r) for r in out.select("doc_id", "split").collect()}
    b = {
        tuple(r)
        for r in assign_split(docs.repartition(5), key_col="source")
        .select("doc_id", "split")
        .collect()
    }
    assert a == b
    assert {r["split"] for r in out.select("split").distinct().collect()} <= {
        "train",
        "val",
        "test",
    }
    with pytest.raises(ValueError):
        assign_split(docs, weights={"train": 0.5, "val": 0.1})


def test_rebalance_sqrt_temperature_rates(spark, sf_dir):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.sampling import (
        rebalance_sqrt_temperature,
    )
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    before = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    kept = rebalance_sqrt_temperature(docs)
    after = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    min_n = min(before.values())
    for lang, n in before.items():
        expected_rate = (min_n / n) ** 0.5
        got = after.get(lang, 0) / n
        # md5-gate realization noise around the target rate
        assert abs(got - expected_rate) < 0.25, (lang, got, expected_rate)
    # rarest stratum keeps everything (threshold == _BUCKETS)
    rare = min(before, key=before.get)
    assert after[rare] == before[rare]
    # deterministic across partitionings
    a = {r["doc_id"] for r in kept.select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in rebalance_sqrt_temperature(docs.repartition(6))
        .select("doc_id")
        .collect()
    }
    assert a == b


def test_range_shard_assignment_nonoverlapping(spark, sf_dir):
    from machine_learning_with_spark_streaming_spark.operators.sampling import range_shard_assignment

    df = load_table(spark, sf_dir, "orders").select("o_totalprice")
    per = (
        range_shard_assignment(df, "o_totalprice", n_shards=4)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("shard")
        .collect()
    )
    assert [r["shard"] for r in per] == [0, 1, 2, 3]
    total = df.count()
    assert sum(r["n"] for r in per) == total
    # equal-frequency: every shard within 2x of the ideal quarter
    assert all(total / 8 <= r["n"] <= total / 2 for r in per)
    # ranges strictly ordered and non-overlapping
    for a, b in zip(per, per[1:]):
        assert a["hi"] <= b["lo"]


def test_write_range_sorted_layout(spark, tmp_path):
    import os

    from machine_learning_with_spark_streaming_spark.operators.sampling import write_range_sorted

    df = spark.range(0, 10000).select(
        (F.col("id") * 37 % 10007).alias("k"), F.col("id")
    )
    # scale path: the plan must range-partition (sampled boundaries),
    # not hash-partition
    plan = df.repartitionByRange(4, F.col("k"))._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()

    out = str(tmp_path / "sorted")
    write_range_sorted(df, out, "k", n_shards=4)
    files = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert len(files) == 4
    spans = []
    for fp in files:
        rows = [r["k"] for r in spark.read.parquet(fp).collect()]
        assert rows == sorted(rows)  # sortWithinPartitions held per file
        spans.append((min(rows), max(rows)))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo  # file key ranges never overlap -> prunable


def test_zorder_improves_secondary_dimension_skipping(spark, tmp_path):
    import os

    from machine_learning_with_spark_streaming_spark.operators.sampling import zorder_frame

    # grid data where partkey and suppkey are independent: sorting by
    # partkey alone leaves suppkey spanning its full range in EVERY
    # file; z-order must shrink the per-file suppkey span
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("l_partkey"),
        (F.col("id") / 64).cast("long").alias("l_suppkey"),
    )

    def spans(out_dir, order_col):
        files = [
            os.path.join(out_dir, f)
            for f in os.listdir(out_dir)
            if f.endswith(".parquet")
        ]
        total = 0.0
        for fp in files:
            rows = spark.read.parquet(fp).agg(
                F.min("l_suppkey"), F.max("l_suppkey")
            ).collect()[0]
            total += rows[1] - rows[0]
        return total / len(files)

    plain = str(tmp_path / "plain")
    df.repartitionByRange(16, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.parquet(plain)

    zed = str(tmp_path / "zorder")
    zorder_frame(df, "l_partkey", "l_suppkey").repartitionByRange(
        16, "zval"
    ).sortWithinPartitions("zval").drop("zval").write.parquet(zed)

    span_plain = spans(plain, "l_partkey")
    span_z = spans(zed, "zval")
    # partkey-sorted files see ~the full 0-63 suppkey range; z-ordered
    # files must cut that span at least in half
    assert span_z <= span_plain / 2, (span_z, span_plain)


def test_weighted_sample_without_replacement_properties(spark, sf_dir):
    from machine_learning_with_spark_streaming_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    a = {r["doc_id"] for r in
         weighted_sample_without_replacement(docs, 30, "n_chars").collect()}
    b = {r["doc_id"] for r in
         weighted_sample_without_replacement(
             docs.repartition(7), 30, "n_chars").collect()}
    assert len(a) == 30 and a == b  # no replacement + partition-invariant
    c = {r["doc_id"] for r in
         weighted_sample_without_replacement(docs, 30, "n_chars", seed=1).collect()}
    assert a != c  # seed changes the draw
    # weight bias: sampled docs skew long (mean above corpus mean)
    stats = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    corpus_mean = sum(stats.values()) / len(stats)
    sample_mean = sum(stats[d] for d in a) / len(a)
    assert sample_mean > corpus_mean


def test_sample_negatives_contract(spark):
    """Negatives are different-label, deterministic, and partitioning-
    invariant; each anchor gets at most k."""
    from machine_learning_with_spark_streaming_spark.operators.sampling import sample_negatives

    rows = [(i, i % 3) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, label int")
    anchors = df.filter(F.col("vec_id") < 6)
    out = sample_negatives(anchors, df, k=3).collect()
    labels = dict(rows)
    by_anchor: dict[int, list[int]] = {}
    for r in out:
        assert labels[r.neg_id] != labels[r.anchor_id]
        assert r.neg_id != r.anchor_id
        by_anchor.setdefault(r.anchor_id, []).append(r.neg_id)
    assert all(len(v) <= 3 for v in by_anchor.values())
    # deterministic under a different partitioning
    again = sample_negatives(anchors.repartition(7), df.repartition(5), k=3)
    assert sorted((r.anchor_id, r.rank, r.neg_id) for r in again.collect()) == \
        sorted((r.anchor_id, r.rank, r.neg_id) for r in out)


def test_epoch_shuffle_is_deterministic_and_epoch_distinct(spark, sf_dir):
    from machine_learning_with_spark_streaming_spark.operators.sampling import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(200)
    e0 = epoch_shuffle(docs, epoch=0)
    # a total order: every doc exactly once, pos dense from 0 per shard
    rows = e0.collect()
    assert len(rows) == 200
    assert len({r.doc_id for r in rows}) == 200
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    # determinism: identical under a different partitioning
    again = {
        (r.doc_id): (r.shard, r.pos)
        for r in epoch_shuffle(docs.repartition(7), epoch=0).collect()
    }
    assert {r.doc_id: (r.shard, r.pos) for r in rows} == again
    # a different epoch is a genuinely different permutation
    e1 = {r.doc_id: (r.shard, r.pos) for r in epoch_shuffle(docs, epoch=1).collect()}
    moved = sum(1 for d, sp in again.items() if e1[d] != sp)
    assert moved > 100  # ~all docs move; a seed leak would keep them put
