"""End-to-end composition: streamed ingest → event-time windowed
aggregate → foreachBatch parquet sink → QC verdict against the batch
run → snapshot-partitioned fact with pruning. One flow through five
engine layers (streaming, operators, validation, sources, session)."""

from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.operators.validation import qc_verdict
from machine_learning_with_spark_streaming_spark.schemas import load_table
from machine_learning_with_spark_streaming_spark.sources.files import write_partitioned
from machine_learning_with_spark_streaming_spark.streaming.pipeline import (
    run_available_now,
    windowed_event_aggregate,
)


def test_stream_to_qc_to_partitioned_fact(spark, sf_dir, tmp_path):
    events_dir = str(tmp_path / "events_us")
    load_table(spark, sf_dir, "events").repartition(3).write.parquet(events_dir)
    batch_events = spark.read.parquet(events_dir)

    # 1) stream → windowed agg → foreachBatch append sink
    stream = (
        spark.readStream.schema(batch_events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    agg_sink = str(tmp_path / "agg")
    # complete-mode rewrite per batch so the final snapshot is the full agg
    run_available_now(
        windowed_event_aggregate(stream, "1 hour", watermark="1 minute"),
        lambda df, _id: df.write.mode("overwrite").parquet(agg_sink),
        checkpoint=str(tmp_path / "ckpt"),
        output_mode="complete",
    )
    streamed_agg = spark.read.parquet(agg_sink)

    # 2) QC: streamed aggregate vs the batch run of the same expressions
    batch_agg = windowed_event_aggregate(batch_events, "1 hour")
    verdicts = qc_verdict(
        streamed_agg.select(F.col("event_type").alias("k"), F.col("value_sum").alias("v")),
        batch_agg.select(F.col("event_type").alias("k"), F.col("value_sum").alias("v")),
        dims=["k"],
        value_col="v",
    )
    rows = verdicts.collect()
    assert rows and all(r.qc == "PASS" for r in rows)

    # 3) land the agg as a snapshot-partitioned fact and read it pruned
    fact_dir = str(tmp_path / "fact")
    fact = streamed_agg.withColumn(
        "snapshot", F.date_format("window_start", "yyyy-MM-dd")
    )
    write_partitioned(fact, fact_dir, ["snapshot"])
    snaps = [
        r.snapshot
        for r in spark.read.parquet(fact_dir).select("snapshot").distinct().collect()
    ]
    one = sorted(snaps)[0]
    pruned = spark.read.parquet(fact_dir).filter(F.col("snapshot") == one)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert (
        pruned.count()
        == fact.filter(F.date_format("window_start", "yyyy-MM-dd") == one).count()
    )
