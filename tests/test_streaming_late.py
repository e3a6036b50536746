"""Pin Spark's watermark late-drop mechanics that the
``s11_late_data_stream`` oracle encodes (streaming/examples.py):

- eviction/append-emission in micro-batch k uses ``max(event time over
  batches 0..k-1) - delay``;
- the LATE-ROW FILTER in batch k uses the one-batch-staler value
  (batches 0..k-2), so a row merging into a window evicted in the same
  batch still counts;
- ``availableNow`` runs a final empty batch applying the last advance.

If a Spark upgrade changes any of this, this test fails first and names
the rule that moved — the registered query's oracle must then move too.
"""

from datetime import datetime

from pyspark.sql import functions as F


def _run(spark, batches, tmp_path, name):
    from machine_learning_with_spark_streaming_spark.streaming.examples import (
        stage_ordered_files,
    )

    parts = [
        spark.createDataFrame(v, "ts timestamp, event_type string, value double")
        for v in batches
    ]
    stage = stage_ordered_files(parts, str(tmp_path / "stage"))
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .select(F.col("win.start").alias("ws"), "event_type", "n", "s")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(r.ws, r.event_type): (r.n, r.s) for r in spark.table(name).collect()}
    spark.catalog.dropTempView(name)
    return rows, q.recentProgress


def test_watermark_filter_lags_eviction_by_one_batch(spark, tmp_path):
    T = lambda h, m: datetime(2024, 1, 1, h, m)  # noqa: E731
    batches = [
        [(T(10, 5), "a", 1.0), (T(12, 5), "a", 2.0)],
        # wm in effect now: 11:05 (evicts win10) — but the late filter
        # still uses batch 0's epoch wm, so the 10:30 straggler is
        # merged into win10 in the same batch that evicts it
        [(T(10, 30), "a", 100.0), (T(11, 30), "a", 4.0), (T(13, 5), "a", 8.0)],
        # filter wm is now 11:05: win10 (end 11:00) is genuinely late
        [(T(10, 35), "a", 1000.0)],
        [(T(23, 0), "zz", 0.0)],   # flush 1
        [(T(23, 30), "zz", 0.0)],  # flush 2
    ]
    rows, progress = _run(spark, batches, tmp_path, "late_semantics")
    a = {k[0]: v for k, v in rows.items() if k[1] == "a"}
    # straggler INCLUDED (filter lagged), second straggler DROPPED
    assert a[T(10, 0)] == (2, 101.0)
    assert a[T(11, 0)] == (1, 4.0)
    assert a[T(12, 0)] == (1, 2.0)
    assert a[T(13, 0)] == (1, 8.0)
    # win10 emitted exactly once (append integrity: no duplicate window)
    assert len(a) == 4
    # availableNow ran a trailing empty batch to apply the final advance
    last = progress[-1]
    assert last["numInputRows"] == 0
