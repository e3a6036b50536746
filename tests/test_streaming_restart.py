"""Checkpoint-recovery contract: a streaming query stopped and
restarted against the SAME checkpoint must (a) not reprocess already
committed micro-batches and (b) restore operator state, so keyed dedup
still admits each key exactly once across the restart boundary.

This is the process-level complement of tests/test_endless_replay.py
(which replays DATA through one continuous query): here the QUERY dies
between passes — the reference consumer's crash/redeploy scenario —
and the durable pieces are the checkpoint (offsets + state store) and a
file sink (the fault-tolerant sink class; the memory sink used by other
tests does not survive restarts by design).
"""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

SCHEMA_DDL = "user_id bigint, event_type string, ts timestamp"
_TS0 = 1_700_000_000


def _file(stage: str, idx: int, rows: list[tuple[int, str, int]]) -> None:
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
    t = time.time() - 1000 + idx
    os.utime(os.path.join(stage, f"b{idx:03d}.parquet"), (t, t))


_PASS1 = [
    [(1, "view", 0), (1, "click", 2), (2, "view", 4)],
    [(3, "view", 11), (2, "view", 13)],  # (2,view) dup within pass 1
]
_PASS2 = [
    # (1,view) and (3,view) duplicate PASS-1 keys -> must NOT re-emit
    # after the restart (their state lives in the checkpoint);
    # (4,view)/(2,buy) are new -> must emit exactly once.
    [(1, "view", 21), (4, "view", 23)],
    [(3, "view", 31), (2, "buy", 33)],
]
_DISTINCT_KEYS = 6  # (1,view)(1,click)(2,view)(3,view)(4,view)(2,buy)


def _run_to_completion(spark, stage: str, ckpt: str, out: str) -> None:
    stream = (
        spark.readStream.schema(SCHEMA_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        stream.dropDuplicates(["user_id", "event_type"])
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    stage = str(tmp_path / "stage")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(stage)

    idx = 0
    for rows in _PASS1:
        _file(stage, idx, rows)
        idx += 1
    _run_to_completion(spark, stage, ckpt, out)  # first life of the query

    first = spark.read.parquet(out)
    assert first.count() == 4  # 4 distinct keys in pass 1

    for rows in _PASS2:
        _file(stage, idx, rows)
        idx += 1
    _run_to_completion(spark, stage, ckpt, out)  # restarted query

    final = spark.read.parquet(out)
    # exactly-once across the restart: every key once, no re-emission of
    # pass-1 keys, no reprocessing of pass-1 files
    assert final.count() == _DISTINCT_KEYS
    assert final.select("user_id", "event_type").distinct().count() == (
        _DISTINCT_KEYS
    )
    # state restored, not rebuilt: the surviving row for a pass-1 key
    # carries its pass-1 event time (first arrival wins)
    row = final.filter(
        (F.col("user_id") == 1) & (F.col("event_type") == "view")
    ).collect()
    assert len(row) == 1
    assert row[0]["ts"].timestamp() == _TS0  # offset 0, not the replay's 21
