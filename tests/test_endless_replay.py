"""Endless-replay contract: the reference producer loops the corpus
forever (``Dataset/stream.py:251-255``, ``--endless``), so the consumer
sees the SAME rows again after each loop-around. Two semantics to hold
at the replay boundary:

- keyed dedup (exact ``dropDuplicates`` state) admits each key once
  across replays — a full second pass contributes zero rows;
- watermarked event-time aggregation treats replayed rows as late data:
  once the watermark has passed their event times, a replay does not
  double-count closed windows (append-mode output equals the
  single-pass aggregate).

Both run as REAL multi-micro-batch file streams: one parquet file per
micro-batch with forced modification-time order, so the replay pass
demonstrably arrives after the first pass.
"""

import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from machine_learning_with_spark_streaming_spark.streaming.pipeline import windowed_event_aggregate

SCHEMA_DDL = "user_id bigint, event_type string, ts timestamp"
_TS0 = 1_700_000_000  # epoch seconds; absolute value is irrelevant


def _file(stage: str, idx: int, rows: list[tuple[int, str, int]]) -> None:
    """One micro-batch file; mtime forced to file order so the file
    source replays the stream in the intended sequence."""
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array(
                [(_TS0 + r[2]) * 1_000_000 for r in rows], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tbl, os.path.join(stage, f"b{idx:03d}.parquet"))
    t = time.time() - 1000 + idx  # strictly increasing, all in the past
    os.utime(os.path.join(stage, f"b{idx:03d}.parquet"), (t, t))


_PASS = [  # 3 micro-batches; keys repeat within and across batches
    [(1, "view", 0), (1, "click", 2), (2, "view", 4)],
    [(1, "view", 11), (3, "view", 13), (2, "buy", 15)],
    [(3, "view", 21), (1, "click", 22), (4, "view", 25)],
]
_DISTINCT_KEYS = 6  # (user, event_type) pairs across the pass


def _run_stream(spark, stage: str, ckpt: str, transform):
    stream = (
        spark.readStream.schema(SCHEMA_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    sink = f"replay_{uuid.uuid4().hex[:8]}"
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def test_replay_keyed_dedup_admits_each_key_once(spark, tmp_path):
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    idx = 0
    for rows in _PASS:  # pass 1
        _file(stage, idx, rows)
        idx += 1
    for rows in _PASS:  # endless-replay loop-around: identical rows again
        _file(stage, idx, rows)
        idx += 1

    out = _run_stream(
        spark,
        stage,
        str(tmp_path / "ckpt"),
        lambda s: s.dropDuplicates(["user_id", "event_type"]),
    )
    assert out.count() == _DISTINCT_KEYS  # second pass contributed nothing
    assert (
        out.select("user_id", "event_type").distinct().count() == _DISTINCT_KEYS
    )


def test_replay_is_late_data_for_watermarked_windows(spark, tmp_path):
    """10s tumbling windows, zero-lateness watermark. Pass 1 ends with a
    heartbeat that advances the watermark far past every data window, so
    the entire replay pass is late and must be discarded — emitted
    window counts equal the single-pass aggregate."""
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    idx = 0
    for rows in _PASS:
        _file(stage, idx, rows)
        idx += 1
    _file(stage, idx, [(99, "heartbeat", 1000)])  # watermark -> +1000s
    idx += 1
    for rows in _PASS:  # replay: every ts now far behind the watermark
        _file(stage, idx, rows)
        idx += 1
    _file(stage, idx, [(99, "heartbeat", 2000)])  # flush remaining windows

    out = _run_stream(
        spark,
        stage,
        str(tmp_path / "ckpt"),
        lambda s: windowed_event_aggregate(
            s,
            window_duration="10 seconds",
            watermark="0 seconds",
            keys=["user_id"],
            value_col="user_id",
        ),
    ).localCheckpoint(eager=True)

    # key windows by second-of-hour of their start — valid because the
    # session timezone is pinned to UTC (session.py), so rendered
    # minute/second match the epoch arithmetic; _TS0 is a multiple of
    # 10, so data windows start at offsets 0/10/20 past _TS0's
    # second-of-hour (800 -> 13:20)
    base = _TS0 % 3600
    got = {
        ((r.window_start.minute * 60 + r.window_start.second - base) % 3600,
         r.user_id): r.n_events
        for r in out.collect()
        if r.user_id != 99
    }
    # single-pass truth per (window offset, user): replay added nothing
    expect: dict[tuple[int, int], int] = {}
    for rows in _PASS:
        for uid, _et, sec in rows:
            key = (sec // 10 * 10, uid)
            expect[key] = expect.get(key, 0) + 1
    assert got == expect
