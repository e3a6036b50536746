"""applyInPandasWithState: running per-key totals across micro-batches
must converge to the batch aggregate (stream-batch parity) and show
state carried between batches (monotone updates)."""

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
            F.round(F.sum("value"), 6).alias("s"),
        )
        .collect()
    }
    got = {k: (n, round(s, 6)) for k, (n, s) in final.items()}
    assert got == expected

    # state must be carried: totals per key never decrease across updates
    seen: dict[str, int] = {}
    for r in hist:
        assert r.n_events >= seen.get(r.key, 0)
        seen[r.key] = r.n_events
