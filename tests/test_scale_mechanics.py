"""Scale mechanics: salted joins/aggregates equal their unsalted
counterparts, and partitioned writes prune at planning time."""

from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from machine_learning_with_spark_streaming_spark.schemas import load_table
from machine_learning_with_spark_streaming_spark.sources.files import write_partitioned


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    salted = salted_join(
        li, part, ["l_partkey"], salt_from=["l_orderkey", "l_linenumber"], n_salts=4
    )
    plain = li.join(part, ["l_partkey"])
    assert salted.count() == plain.count()
    s = salted.groupBy("p_brand").agg(F.round(F.sum("l_quantity"), 2).alias("q"))
    p = plain.groupBy("p_brand").agg(F.round(F.sum("l_quantity"), 2).alias("q"))
    assert {(r.p_brand, r.q) for r in s.collect()} == {
        (r.p_brand, r.q) for r in p.collect()
    }


def test_salted_aggregate_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = salted_aggregate(
        li,
        keys=["l_returnflag"],
        aggs={
            "n": F.count(F.lit(1)),
            "qty": F.sum(F.col("l_quantity").cast("decimal(18,2)")),
        },
        salt_from=["l_orderkey", "l_linenumber"],
        n_salts=4,
    )
    exp = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
    )
    assert {(r.l_returnflag, r.n, r.qty) for r in got.collect()} == {
        (r.l_returnflag, r.n, r.qty) for r in exp.collect()
    }


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "snapshot", F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM")
    )
    path = str(tmp_path / "fact")
    write_partitioned(orders, path, ["snapshot"])

    snaps = [r.snapshot for r in spark.read.parquet(path).select("snapshot").distinct().collect()]
    target = sorted(snaps)[0]
    q = spark.read.parquet(path).filter(F.col("snapshot") == target)

    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "snapshot" in plan
    # pruned scan reads only the one partition's rows
    expected = orders.filter(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM") == target
    ).count()
    assert q.count() == expected


def test_asof_join_single_shuffle_plan(spark, sf_dir):
    """The as-of join must cost exactly one hash-partitioning exchange
    (the union shuffle on the key) — a range-join or per-key nested-loop
    formulation would show more/other exchanges or BNLJ nodes."""
    from machine_learning_with_spark_streaming_spark.operators.joins import asof_join
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    orders = load_table(spark, sf_dir, "orders")
    out = asof_join(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        orders.select("o_custkey", "o_orderdate", "o_totalprice"),
        on=["o_custkey"],
        left_time="o_orderdate",
        right_time="o_orderdate",
        value_cols={"o_totalprice": "prev_price"},
        strict=True,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_interval_join_no_nested_loop_plan(spark, sf_dir):
    """The bucketed interval join must plan as an equi-join (hash/SMJ),
    never a per-key nested loop or cartesian product."""
    from machine_learning_with_spark_streaming_spark.operators.joins import q_interval_join

    out = q_interval_join(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan), plan


def test_salted_join_query_plan_broadcasts_replicated_dim(spark, sf_dir):
    """j12's salt-replicated dimension must broadcast: the fact side
    joins with NO fact-side exchange before the join."""
    from machine_learning_with_spark_streaming_spark.operators.skew import q_salted_skew_join

    out = q_salted_skew_join(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # the only hash exchanges are the post-join aggregate + sort
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_salted_two_phase_agg_plan_has_salt_then_key_exchange(spark, sf_dir):
    """a15 must shuffle twice: once on (key, salt) partials, once on the
    key finals — never a single key-only exchange of raw rows."""
    from machine_learning_with_spark_streaming_spark.operators.skew import (
        q_salted_two_phase_agg,
    )

    out = q_salted_two_phase_agg(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan, plan
    # (key,salt) exchange + key exchange + orderBy range exchange
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_rollup_merge_plan_moves_group_sized_relations(spark, sf_dir):
    """a16's full-outer merge must join two *aggregated* relations —
    both join inputs carry partial-aggregate outputs, not fact rows."""
    from machine_learning_with_spark_streaming_spark.operators.rollup_maintenance import (
        q_incremental_rollup,
    )

    out = q_incremental_rollup(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    # aggregation happens below the join on both sides: 2 partial+final pairs
    assert plan.count("HashAggregate") >= 4, plan


def test_frozen_ml_scoring_plan_shape(spark, sf_dir):
    """Frozen-artifact scoring must broadcast the literal weight table
    and prune the per-class fan-out to top-1 BEFORE the exchange
    (WindowGroupLimit): the shuffle carries one row per vector, not one
    per (vector x class)."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["ml_logreg_embeddings"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_inlist_pushdown_reaches_fact_scan(spark, sf_dir):
    """Below the cap the dim keys must appear as an In() filter in the
    parquet scan's PushedFilters (row-group skipping); above the cap
    the operator must degrade to a broadcast left-semi join."""
    from machine_learning_with_spark_streaming_spark.operators.joins import inlist_pushdown_filter
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    pushed, mode = inlist_pushdown_filter(li, dim, "l_orderkey")
    assert mode == "inlist"
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_orderkey" in plan

    capped, mode2 = inlist_pushdown_filter(li, dim, "l_orderkey", max_keys=3)
    assert mode2 == "semi_join"
    plan2 = capped._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan2 and "Broadcast" in plan2
    assert pushed.count() == capped.count()


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """Catalyst's InjectRuntimeFilter adds a bloom-filter semi-filter on
    the fact side of a selective shuffle join (`might_contain(...)` fed
    by a `bloom_filter_agg` subquery on the filtered dim) — the runtime
    row-pruning that matters when the fact scan is 100 TB and the dim
    filter keeps 20%. Default thresholds target cluster-sized inputs
    (applicationSideScanSizeThreshold 10 GB), so the test lowers them;
    at real scale the defaults fire on their own. Broadcast is disabled
    to force the shuffle-join shape the filter exists for."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        od = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(od, li["l_orderkey"] == od["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
        # and the filtered plan still computes the right answer
        n = j.collect()[0]["count"]
        expected = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders").filter(
                    F.col("o_orderpriority") == "1-URGENT"
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n == expected
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """Joining a date-partitioned fact to a dim filtered on a NON-join
    column must inject a dynamicpruning subquery into the fact scan's
    PartitionFilters — at 100 TB this is the mechanism that turns
    "join to this quarter's dim rows" into "read only this quarter's
    fact partitions", with no literal filter anywhere in user code."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_month", F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM")
    )
    path = str(tmp_path / "fact_dpp")
    orders.write.partitionBy("o_month").parquet(path)
    fact = spark.read.parquet(path)

    dim = (
        orders.select("o_month").distinct()
        .withColumn("quarter", F.concat(F.substring("o_month", 1, 4),
                                        F.lit("-Q"),
                                        ((F.substring("o_month", 6, 2).cast("int") - 1)
                                         / 3 + 1).cast("int")))
    )
    target_q = dim.orderBy("quarter").first()["quarter"]
    j = fact.join(F.broadcast(dim.filter(F.col("quarter") == target_q)), "o_month")

    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the pruned join still returns exactly the quarter's rows
    expected = orders.join(
        dim.filter(F.col("quarter") == target_q), "o_month"
    ).count()
    assert j.count() == expected > 0


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's runtime skew handling — the automatic counterpart of the
    manual salting in operators/skew.py: with one key holding half the
    fact, the finalized adaptive plan marks the join `skew=true` and the
    hot partition's AQEShuffleRead `skewed` (split into subpartitions,
    each joined against a replicated dim read). Thresholds are lowered
    to fire at test scale; the 10-GB-partition defaults fire on their
    own at cluster scale. Coalescing is disabled so the skew reader's
    decision is observable in isolation."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(400000).select(
            F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload_" * 5), F.col("id")).alias("p"),
        )
        dim = spark.range(40000).select(
            F.col("id").alias("k"), F.lit("d").alias("dval")
        )
        j = fact.join(dim, "k").select(F.count(F.lit(1)).alias("n"))
        n = j.collect()[0]["n"]
        # key 0: 200k fact rows x 1 dim row; keys 1..39999 odd: ~20k matches
        assert n == 200000 + sum(1 for x in range(1, 40000) if x % 2 == 1)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:1500]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_exchange_reuse_on_self_joined_aggregate(spark, sf_dir):
    """Self-joining an aggregate must plan ONE shuffle + ReusedExchange,
    not two identical shuffles — Catalyst's subplan dedup, which is what
    keeps self-comparison analytics (v2 totals-compare, drift reports,
    the ANN recall report's two arms sharing a scan) from paying twice
    at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(F.sum("l_quantity").alias("q"))
    j = (
        per_part.alias("a")
        .join(per_part.alias("b"), F.col("a.q") == F.col("b.q"))
        .select(F.count(F.lit(1)).alias("n"))
    )
    assert j.collect()[0]["n"] > 0
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan[:1500]


def test_length_batches_has_no_global_window(spark, sf_dir):
    """r3's length_bucketed_batches put the corpus through one
    Exchange SinglePartition window (global ntile). The redesign
    (percentile-boundary broadcast + per-sub-partition row_number +
    array-fold rank offsets) must keep every SinglePartition exchange
    fed by map-side aggregate partials only, and every Window
    partitioned."""
    import __spark_entry__ as entry

    from machine_learning_with_spark_streaming_spark.planaudit import (
        parse_plan_tree,
        unbounded_single_partition_windows,
    )

    df = entry.queries()["sample_length_batches"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert unbounded_single_partition_windows(plan) == []
    # every Window node must declare a partition spec (no global sort)
    for node in parse_plan_tree(plan):
        if node.label.startswith("Window"):
            assert "windowspecdefinition(" in node.label
            spec = node.label.split("windowspecdefinition(", 1)[1]
            # first argument of the spec is the partition column list;
            # a global window starts the spec with the order columns
            # only — ours must partition by the fine sub-bucket
            assert spec.startswith("__sub"), node.label[:200]


def test_pq_adc_plan_broadcasts_lut_and_codebook(spark, sf_dir):
    """PQ serving must never shuffle on the lookup side: the 128-row
    codebook join (encode) and the M×K LUT join (scoring) both plan as
    BroadcastHashJoin; the only SortMergeJoin-free corpus-sized work is
    the per-(id, m) argmin exchange and the map-side-combinable ADC
    sum."""
    import __spark_entry__ as entry

    df = entry.queries()["sim_pq_adc_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cbo_join_reorder_from_analyzed_stats(spark, sf_dir, tmp_path):
    """Stats-driven planning (the cluster companion to AQE's runtime
    re-plan): ANALYZE TABLE + CBO must reorder a deliberately bad join
    order — without stats Catalyst keeps the written fact-first order;
    with per-column stats the optimizer joins the two small relations
    first and brings the fact in last, and cardinalities propagate
    (the root aggregate's rowCount equals the dim's group count)."""
    import uuid

    sfx = uuid.uuid4().hex[:6]
    fact, mid, dim = (f"cbo_{n}_{sfx}" for n in ("fact", "mid", "dim"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    li.write.saveAsTable(fact)
    spark.range(1000).select(
        F.col("id").alias("l_partkey"), (F.col("id") % 7).alias("grp")
    ).write.saveAsTable(mid)
    spark.range(7).select(
        F.col("id").alias("grp"), F.concat(F.lit("g"), F.col("id")).alias("name")
    ).write.saveAsTable(dim)
    q = (
        f"SELECT d.name, sum(f.l_quantity) q FROM {fact} f "
        f"JOIN {mid} m ON f.l_partkey = m.l_partkey "
        f"JOIN {dim} d ON m.grp = d.grp GROUP BY d.name"
    )

    def first_join_keys(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        joins = [ln for ln in plan.splitlines() if "Join Inner" in ln]
        return joins[-1]  # innermost (deepest) join = executed first

    try:
        assert "l_partkey" in first_join_keys(spark.sql(q))  # written order
        for t in (fact, mid, dim):
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
        orig_cbo = spark.conf.get("spark.sql.cbo.enabled")
        orig_reorder = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        try:
            df = spark.sql(q)
            # reordered: the innermost join is now the small mid x dim
            assert "grp" in first_join_keys(df)
            stats = df._jdf.queryExecution().optimizedPlan().stats()
            assert stats.rowCount().get() == 7  # |dim| groups propagate
        finally:
            spark.conf.set("spark.sql.cbo.enabled", orig_cbo)
            spark.conf.set("spark.sql.cbo.joinReorder.enabled", orig_reorder)
    finally:
        for t in (fact, mid, dim):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """AQE runtime bloom-filter join pruning: with a selective dim
    filter and a non-broadcastable join, Spark injects a
    ``might_contain(bloom)`` filter on the FACT side keyed by the dim's
    join keys — rows that cannot match die at the scan instead of
    traveling the shuffle. At cluster scale this triggers by default
    (fact side > 10 GB); locally the application-side size threshold
    must be zeroed to see the plan, which is exactly what this test
    pins. The session's AQE + this mechanism are the runtime half of
    the static PushedFilters/DPP evidence."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        # and the filtered result is still correct
        got = {r.o_orderpriority: r.n for r in j.collect()}
        want = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .count()
        )
        assert got["1-URGENT"] == want
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
