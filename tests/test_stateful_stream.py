"""applyInPandasWithState: running per-key totals across micro-batches
must converge to the batch aggregate (stream-batch parity) and show
state carried between batches (monotone updates)."""

import pytest
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.schemas import load_table
from machine_learning_with_spark_streaming_spark.streaming.stateful import running_totals


def test_running_totals_stream_batch_parity(spark, sf_dir, tmp_path):
    events_dir = str(tmp_path / "events_us")
    # µs-precision replay copy (the source parquet stores ns timestamps)
    # 4 files -> 4 micro-batches (maxFilesPerTrigger=1), so state must
    # actually carry across batches for parity to hold
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(events_dir)
    batch = spark.read.parquet(events_dir)

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = running_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update-mode memory sink appends one row per key per batch; the last
    # row per key is the final running total
    hist = spark.sql(
        "select key, n_events, value_sum from running_totals"
    ).collect()
    final: dict[str, tuple] = {}
    for r in hist:  # memory sink preserves batch order
        final[r.key] = (r.n_events, r.value_sum)

    expected = {
        r.event_type: (r.n, r.s)
        for r in batch.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
        )
        .collect()
    }
    assert set(final) == set(expected)
    for k, (n, s) in final.items():
        assert n == expected[k][0]
        assert s == pytest.approx(expected[k][1], abs=1e-6)

    # state must be carried: totals per key never decrease across updates
    seen: dict[str, int] = {}
    for r in hist:
        assert r.n_events >= seen.get(r.key, 0)
        seen[r.key] = r.n_events


def test_streaming_packer_carries_cursor_across_batches(spark, tmp_path):
    """Two ordered micro-batches; the second batch's first doc must join
    the chunk the first batch left open (state carry), and the full
    assignment must equal the batch walk."""
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.sampling import pack_token_budget_exact
    from machine_learning_with_spark_streaming_spark.streaming.examples import stage_ordered_files
    from machine_learning_with_spark_streaming_spark.streaming.stateful import streaming_packer

    rows = [
        # source A: 300+150 (batch 1), then 50 fits the open chunk 0,
        # then 400 forces chunk 1 — the carry is observable
        (1, "A", 300), (2, "A", 150),
        (3, "B", 500),
        (10, "A", 50), (11, "A", 400),
        (12, "B", 100),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    stage = stage_ordered_files(
        [df.filter(F.col("doc_id") < 10), df.filter(F.col("doc_id") >= 10)],
        str(tmp_path / "stage"),
    )
    stream = (
        spark.readStream.schema("doc_id bigint, source string, n_tokens bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    sink = "pack_carry_test"
    q = (
        streaming_packer(stream, budget=512)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.doc_id: r.chunk_id for r in spark.table(sink).collect()
    }
    spark.catalog.dropTempView(sink)
    expect = {
        r.doc_id: r.chunk_id
        for r in pack_token_budget_exact(df, 512, "n_tokens").collect()
    }
    assert got == expect
    assert got[10] == 0  # joined the chunk batch 1 left open (300+150+50)
    assert got[11] == 1  # 400 would overflow 512 -> new chunk


def test_streaming_packer_survives_multi_chunk_arrow_delivery(spark, tmp_path):
    """When a key's batch group exceeds arrow.maxRecordsPerBatch, the
    rows reach the state function as MULTIPLE pandas chunks in
    arbitrary shuffle order. The packer must concatenate before its
    sorted greedy walk — per-chunk walks diverge from the batch oracle
    exactly when groups get big (r3 advice finding). Forced here with
    a 4-row Arrow chunk size against a 30-doc group."""
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.sampling import pack_token_budget_exact
    from machine_learning_with_spark_streaming_spark.streaming.examples import stage_ordered_files
    from machine_learning_with_spark_streaming_spark.streaming.stateful import streaming_packer

    rows = [(i, "A", 60 + (i * 37) % 140) for i in range(1, 31)]
    rows += [(i, "B", 80 + (i * 53) % 200) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    # shuffle row order inside the staged file so arrival order is not
    # already sorted — the walk must impose the id order itself
    staged = df.orderBy(F.xxhash64("doc_id", "source"))
    stage = stage_ordered_files([staged], str(tmp_path / "stage"))
    stream = (
        spark.readStream.schema("doc_id bigint, source string, n_tokens bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    orig = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        sink = "pack_multichunk_test"
        q = (
            streaming_packer(stream, budget=512)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {(r.source, r.doc_id): r.chunk_id for r in spark.table(sink).collect()}
        spark.catalog.dropTempView(sink)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", orig)
    expect = {
        (r.source, r.doc_id): r.chunk_id
        for r in pack_token_budget_exact(df, 512, "n_tokens").collect()
    }
    assert got == expect


def test_streaming_packer_runs_on_rocksdb_state_store(spark, tmp_path):
    """Large-state streaming at scale runs on the RocksDB state store
    (state spills to local disk instead of living on the JVM heap).
    The packer must produce the identical assignment under
    RocksDBStateStoreProvider — pinning that our state schema and
    update pattern don't depend on the default HDFS-backed provider."""
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.sampling import pack_token_budget_exact
    from machine_learning_with_spark_streaming_spark.streaming.examples import stage_ordered_files
    from machine_learning_with_spark_streaming_spark.streaming.stateful import streaming_packer

    rows = [(i, "A", 100 + (i * 31) % 150) for i in range(1, 25)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    stage = stage_ordered_files(
        [df.filter(F.col("doc_id") <= 12), df.filter(F.col("doc_id") > 12)],
        str(tmp_path / "stage"),
    )
    stream = (
        spark.readStream.schema("doc_id bigint, source string, n_tokens bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    orig = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        sink = "pack_rocksdb_test"
        q = (
            streaming_packer(stream, budget=512)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {r.doc_id: r.chunk_id for r in spark.table(sink).collect()}
        spark.catalog.dropTempView(sink)
    finally:
        if orig is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, orig)
    expect = {
        r.doc_id: r.chunk_id
        for r in pack_token_budget_exact(df, 512, "n_tokens").collect()
    }
    assert got == expect
