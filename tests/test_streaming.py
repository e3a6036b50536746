"""Streaming contract tests: payload parsing (S11), stream-batch parity,
foreachBatch sinks — using the file source with availableNow (the socket
transport shares the same parse expressions)."""

import json

import pytest
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.streaming.pipeline import (
    foreach_batch_upsert,
    run_available_now,
    sessionized_aggregate,
    windowed_event_aggregate,
)
from machine_learning_with_spark_streaming_spark.streaming.source import (
    features_as_vector,
    parse_feature_lines,
    read_feature_stream_files,
)

N_FEATURES = 4


def _payload_line(start: int, n_rows: int) -> str:
    return json.dumps(
        {
            str(i): {
                **{f"feature{j}": float(i * 10 + j) for j in range(N_FEATURES)},
                "label": float(i % 3),
            }
            for i in range(start, start + n_rows)
        }
    )


@pytest.fixture()
def payload_dir(tmp_path):
    d = tmp_path / "payload"
    d.mkdir()
    # 3 producer sends (batches) of 5 rows each — Dataset/stream.py cadence
    for b in range(3):
        (d / f"batch_{b}.jsonl").write_text(_payload_line(b * 5, 5) + "\n")
    return d


def test_parse_feature_lines_batch(spark, payload_dir):
    lines = spark.read.text(str(payload_dir))
    rows = parse_feature_lines(lines, N_FEATURES)
    out = rows.orderBy("row_idx").collect()
    assert len(out) == 15
    assert out[0]["row_idx"] == 0
    assert out[0]["feature0"] == 0.0
    assert out[14]["feature3"] == 143.0
    assert out[14]["label"] == 2.0


def test_feature_vector_packing(spark, payload_dir):
    lines = spark.read.text(str(payload_dir))
    rows = features_as_vector(parse_feature_lines(lines, N_FEATURES), N_FEATURES)
    r = rows.orderBy("row_idx").first()
    assert r["features"] == [0.0, 1.0, 2.0, 3.0]
    assert set(rows.columns) == {"row_idx", "label", "features"}


def test_stream_batch_parity_feature_payload(spark, payload_dir, tmp_path):
    """The same parse over readStream yields exactly the batch result."""
    stream = read_feature_stream_files(spark, str(payload_dir), N_FEATURES)
    assert stream.isStreaming
    sink_path = str(tmp_path / "sink")
    run_available_now(
        stream,
        lambda df, _id: df.write.mode("append").parquet(sink_path),
        checkpoint=str(tmp_path / "ckpt"),
    )
    streamed = spark.read.parquet(sink_path)
    batch = parse_feature_lines(spark.read.text(str(payload_dir)), N_FEATURES)
    assert streamed.count() == 15
    assert (
        streamed.exceptAll(batch).count() == 0 and batch.exceptAll(streamed).count() == 0
    )


def test_windowed_aggregate_stream_batch_parity(spark, sf_dir, tmp_path):
    """Tumbling-window agg over a streamed events table == batch result."""
    # the source parquet stores ns timestamps, which the streaming parquet
    # reader rejects; replay a µs-precision copy (same rows)
    from machine_learning_with_spark_streaming_spark.schemas import load_table

    events_dir = str(tmp_path / "events_us")
    load_table(spark, sf_dir, "events").write.parquet(events_dir)
    batch_events = spark.read.parquet(events_dir)
    expected = sorted(
        (r["window_start"], r["event_type"], r["n_events"], r["value_sum"])
        for r in windowed_event_aggregate(batch_events, "1 hour").collect()
    )

    stream_events = spark.readStream.schema(batch_events.schema).parquet(events_dir)
    agg = windowed_event_aggregate(stream_events, "1 hour", watermark="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["window_start"], r["event_type"], r["n_events"], r["value_sum"])
        for r in spark.sql("select * from win_agg").collect()
    )
    assert got == expected


def test_session_window_batch(spark):
    rows = [
        ("2024-01-01 00:00:00", 1, 1.0),
        ("2024-01-01 00:02:00", 1, 2.0),
        ("2024-01-01 00:30:00", 1, 4.0),
        ("2024-01-01 00:03:00", 2, 8.0),
    ]
    df = spark.createDataFrame(rows, ["ts_s", "user_id", "value"]).withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    out = sessionized_aggregate(df, gap="5 minutes").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2  # two sessions: 00:00-00:07, 00:30-00:35
    assert len(by_user[2]) == 1
    first = min(by_user[1], key=lambda r: r["session_start"])
    assert first["n_events"] == 2 and first["value_sum"] == 3.0


def test_foreach_batch_upsert_only_appends_changes(spark, tmp_path):
    target = str(tmp_path / "upsert_target")
    first = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "v"])
    foreach_batch_upsert(target, ["k"], ["v"])(first, 0)
    # replaying the same rows plus one change writes only the change
    second = spark.createDataFrame([(1, 10.0), (2, 25.0)], ["k", "v"])
    foreach_batch_upsert(target, ["k"], ["v"])(second, 1)
    final = spark.read.parquet(target)
    assert final.count() == 3  # 2 initial + 1 changed row appended
    assert final.filter("k = 2").count() == 2


def test_stream_stream_interval_join_parity(spark, sf_dir, tmp_path):
    """Stream-stream time-range join == the batch interval join on the
    same events (clicks within 30 min before each error)."""
    from machine_learning_with_spark_streaming_spark.schemas import load_table
    from machine_learning_with_spark_streaming_spark.streaming.pipeline import (
        stream_stream_interval_join,
    )

    events_dir = str(tmp_path / "events_us_ssj")
    load_table(spark, sf_dir, "events").write.parquet(events_dir)
    batch = spark.read.parquet(events_dir)

    def split(df):
        errors = df.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("error_id"),
            F.col("user_id"),
            F.col("ts").alias("e_ts"),
        )
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("c_ts"),
        )
        return errors, clicks

    be, bc = split(batch)
    expected = sorted(
        (r["error_id"], r["click_id"])
        for r in stream_stream_interval_join(
            be, bc, "user_id", "e_ts", "c_ts", -1800, 0
        ).collect()
    )
    assert expected  # ground truth non-empty

    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    se, sc = split(stream)
    joined = stream_stream_interval_join(
        se, sc, "user_id", "e_ts", "c_ts", -1800, 0, watermark="1 minute"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["error_id"], r["click_id"])
        for r in spark.sql("select * from ssj").collect()
    )
    assert got == expected


def test_foreach_batch_upsert_latest_wins(spark, tmp_path):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.streaming.pipeline import (
        foreach_batch_upsert_latest,
    )

    target = str(tmp_path / "target")
    sink = foreach_batch_upsert_latest(
        target, pk=["k"], order_cols=["ts", "id"]
    )
    b1 = spark.createDataFrame(
        [(1, "a", 10, 100), (2, "a", 11, 101)], "id bigint, k string, ts bigint, v bigint"
    ).select("id", "k", "ts", "v")
    b2 = spark.createDataFrame(
        [(3, "a", 9, 999), (4, "b", 5, 500)], "id bigint, k string, ts bigint, v bigint"
    )
    sink(b1, 0)
    sink(b2, 1)  # ts=9 is OLDER for k=a -> must not win
    rows = {r["k"]: r for r in spark.read.parquet(target).collect()}
    assert rows["a"]["id"] == 2 and rows["a"]["v"] == 101
    assert rows["b"]["id"] == 4
    # replaying an already-seen batch changes nothing (idempotent merge)
    sink(b2, 2)
    rows2 = {r["k"]: tuple(r) for r in spark.read.parquet(target).collect()}
    assert rows2 == {k: tuple(r) for k, r in rows.items()}


def test_watermark_drops_late_rows_accounted(spark, tmp_path):
    """Late-data contract, observed for real: a row older than the
    gating watermark is DROPPED by the stateful aggregate and the drop
    is visible in numRowsDroppedByWatermark — the accounting a
    production pipeline alerts on.

    Two Spark subtleties this test pins down (measured, Spark 4.1):
    - the watermark GATING batch N is the one computed at the END of
      batch N-1; the value in batch N's progress is end-of-batch-N. A
      straggler therefore survives one extra micro-batch before the
      cutoff applies (watermark dropping is documented best-effort) —
      hence three files: on-time, filler, then the late row.
    - append mode is where expired windows stop accepting input; update
      mode keeps absorbing late rows into still-open state.
    Files replay in mtime order, one per trigger."""
    import json
    import os
    import time

    stage = tmp_path / "stage"
    stage.mkdir()

    def mk(rows):
        return (
            spark.createDataFrame(rows, ["ts_s", "event_type", "value"])
            .withColumn("ts", F.to_timestamp("ts_s"))
            .drop("ts_s")
        )

    batches = [
        mk([("2024-01-01 02:00:00", "click", 1.0),
            ("2024-01-01 02:10:00", "click", 2.0)]),      # advances watermark
        mk([("2024-01-01 02:20:00", "click", 4.0)]),      # filler batch
        mk([("2024-01-01 00:00:00", "click", 100.0)]),    # 2 h late
    ]
    now = time.time()
    for i, df in enumerate(batches, 1):
        f = str(stage / f"b{i}")
        df.coalesce(1).write.parquet(f)
        for root, _d, files in os.walk(f):
            for fn in files:
                os.utime(os.path.join(root, fn), (now - 180 + i * 60,) * 2)

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage) + "/*")
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.sum("value").alias("value_sum"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_acct")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = 0
    for p in q.recentProgress:
        d = json.loads(p.json)
        for op in d.get("stateOperators", []):
            dropped += int(op.get("numRowsDroppedByWatermark", 0))
    assert dropped >= 1, "late row was not dropped by the watermark"
    rows = spark.sql("select * from late_acct").collect()
    # the late row's 100.0 must not appear in any window sum
    assert all(r["value_sum"] < 100.0 for r in rows)


def test_left_outer_stream_join_emits_null_rows(spark, sf_dir):
    """The real-stream LEFT OUTER interval join must (a) equal the
    stateless batch LEFT join and (b) actually contain null-extended
    rows — proving the watermark advanced far enough to flush every
    unmatched click's verdict, not just the matched pairs."""
    from machine_learning_with_spark_streaming_spark.schemas import load_table
    from machine_learning_with_spark_streaming_spark.streaming.examples import (
        q_left_outer_join_stream,
    )

    got = q_left_outer_join_stream(spark, sf_dir).collect()
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    expected = sorted(
        (r["click_id"], r["error_id"])
        for r in clicks.join(
            errors,
            (F.col("user_id") == F.col("e_user"))
            & (F.col("e_ts") >= F.col("c_ts"))
            & (F.col("e_ts") <= F.col("c_ts") + F.expr("INTERVAL 21600 SECONDS")),
            "left_outer",
        ).collect()
    )
    assert sorted((r.click_id, r.error_id) for r in got) == expected
    n_null = sum(1 for r in got if r.error_id is None)
    assert n_null > 0  # unmatched clicks DID get their null verdict
    assert all(r.user_id >= 0 for r in got)  # sentinels filtered out


def test_idempotent_append_survives_batch_retry(spark, tmp_path):
    """Exactly-once append: replaying the SAME batch_id (the
    crash-between-write-and-commit retry) must overwrite that batch's
    partition, not double-append; a new batch_id appends. The plain
    append sink double-appends by design — pinned here as the contrast
    that motivates the idempotent variant."""
    from machine_learning_with_spark_streaming_spark.streaming.pipeline import (
        foreach_batch_append,
        foreach_batch_append_idempotent,
    )

    target = str(tmp_path / "idem")
    sink = foreach_batch_append_idempotent(target)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    sink(b0, 0)
    sink(b0, 0)  # retry of batch 0: must be a no-op overall
    assert spark.read.parquet(target).count() == 2
    b1 = spark.createDataFrame([(3, "c")], "id long, v string")
    sink(b1, 1)
    df = spark.read.parquet(target)
    assert df.count() == 3
    assert set(r.batch_id for r in df.select("batch_id").collect()) == {0, 1}

    plain_target = str(tmp_path / "plain")
    plain = foreach_batch_append(plain_target)
    plain(b0, 0)
    plain(b0, 0)
    assert spark.read.parquet(plain_target).count() == 4  # at-least-once


def test_upsert_latest_concurrent_writers_interleaved(spark, tmp_path):
    """K4 under two WRITERS sharing one target — the first failure mode
    a real multi-stream deployment hits. Two independent
    ``foreach_batch_upsert_latest`` sinks (as two streaming queries
    would hold) interleave serialized batches with overlapping keys;
    because each merge is a pure function of the SET of rows ever seen
    (max over a deterministic total order), the table converges to
    latest-wins over the union regardless of which writer committed
    last, and replays from either writer are no-ops. This pins the
    SERIALIZED-interleaving contract; simultaneous overlapping
    overwrites need a transactional table format (snapshot isolation)
    that plain parquet cannot give — see EXPLAIN.md's Delta/Iceberg
    mapping."""
    from machine_learning_with_spark_streaming_spark.streaming.pipeline import (
        foreach_batch_upsert_latest,
    )

    target = str(tmp_path / "shared")
    schema = "id bigint, k string, ts bigint, v bigint"
    sink_a = foreach_batch_upsert_latest(target, pk=["k"], order_cols=["ts", "id"])
    sink_b = foreach_batch_upsert_latest(target, pk=["k"], order_cols=["ts", "id"])

    a1 = spark.createDataFrame([(1, "x", 10, 100), (2, "y", 10, 200)], schema)
    b1 = spark.createDataFrame([(3, "x", 12, 111), (4, "z", 10, 300)], schema)
    a2 = spark.createDataFrame([(5, "x", 11, 555), (6, "z", 13, 333)], schema)
    b2 = spark.createDataFrame([(7, "y", 9, 999), (8, "w", 10, 400)], schema)

    # interleave: A, B, A, B — each writer's own batch ids are serial
    sink_a(a1, 0)
    sink_b(b1, 0)
    sink_a(a2, 1)
    sink_b(b2, 1)

    rows = {r["k"]: r for r in spark.read.parquet(target).collect()}
    assert rows["x"]["id"] == 3 and rows["x"]["v"] == 111  # B's ts=12 wins
    assert rows["y"]["id"] == 2 and rows["y"]["v"] == 200  # B's ts=9 loses
    assert rows["z"]["id"] == 6 and rows["z"]["v"] == 333  # A's ts=13 wins
    assert rows["w"]["id"] == 8  # key only B wrote survives A's merges

    # replay from EITHER writer (crash-retry of its last batch): no-op
    before = {k: tuple(r) for k, r in rows.items()}
    sink_a(a2, 2)
    sink_b(b2, 2)
    after = {
        r["k"]: tuple(r) for r in spark.read.parquet(target).collect()
    }
    assert after == before
