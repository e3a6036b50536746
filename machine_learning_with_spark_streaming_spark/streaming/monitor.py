"""Streaming CUSUM level-shift monitor — the production shape of w18.

The batch operator (operators/seasonal.py cusum_changepoints) computes
reference mean and MAD from the full series; a deployed monitor freezes
those from a training window and carries ONLY the running cusum as
per-key state while days stream in. This is that shape, run as a REAL
3-micro-batch ``applyInPandasWithState`` job: the day axis is split into
three staged ranges, per-key integer cusum state crosses the state
store between batches, and every batch emits the key's cumulative
position (days seen, cusum, alarms so far) — the alert feed a
demand-planning deployment tails.

Scale shape: state is three integers per key (sharded across executors,
never on the driver); per batch the work is the key's new days sorted
and integer-cumsummed inside one Arrow group. The frozen reference dict
is bounded by key cardinality (the artifact pattern — at fleet scale it
ships as a broadcast table computed by the training job).

Cross-engine exactness: daily means quantize to integer micro-units per
row; reference and MAD are integer ``div`` aggregates (both engines
truncate toward zero); the cusum is an int64 cumulative sum (numpy
cumsum over int64 is exact integer arithmetic); day-to-batch assignment
is ``(rank * 3) div n_days`` over globally ranked distinct days on both
sides. Every emitted column is an integer or a key string."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from machine_learning_with_spark_streaming_spark.operators.seasonal import CUSUM_H_MULT
from machine_learning_with_spark_streaming_spark.operators.windows import (
    _daily_mean_series,
)
from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table
from machine_learning_with_spark_streaming_spark.streaming.tuning import start_and_await

N_MONITOR_BATCHES = 3

_MONITOR_OUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_days_seen", LongType()),
        StructField("cusum_end", LongType()),
        StructField("n_flagged_total", LongType()),
    ]
)

_MONITOR_STATE = StructType(
    [
        StructField("cusum", LongType()),
        StructField("n_seen", LongType()),
        StructField("n_flagged", LongType()),
    ]
)


def cusum_monitor(stream, ref_mad: dict, h_mult: int = CUSUM_H_MULT):
    """Stateful streaming CUSUM against a frozen per-key (ref, mad)
    dict: processes each key's new days in day order, carries
    (cusum, days_seen, alarms) across micro-batches, emits the
    cumulative position per batch."""
    import numpy as np

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        k = key[0]
        cusum, n_seen, n_flagged = (
            state.get if state.exists else (0, 0, 0)
        )
        ref, mad = ref_mad.get(k, (0, 0))
        pdf = pd.concat(list(pdfs)).sort_values("day")
        dev = pdf["mv"].to_numpy(dtype="int64") - ref
        walk = cusum + np.cumsum(dev)  # exact int64 arithmetic
        n_flagged += int((np.abs(walk) > h_mult * mad).sum())
        n_seen += len(pdf)
        cusum = int(walk[-1]) if len(walk) else cusum
        state.update((cusum, n_seen, n_flagged))
        yield pd.DataFrame(
            {
                "event_type": [k],
                "n_days_seen": [n_seen],
                "cusum_end": [cusum],
                "n_flagged_total": [n_flagged],
            }
        )

    return stream.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=_MONITOR_OUT,
        stateStructType=_MONITOR_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_MONITOR_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
series AS (
  SELECT event_type, day,
         CAST(round(cents / 100.0 / n * 1e6) AS BIGINT) AS mv
  FROM daily
),
ranked AS (
  SELECT day, row_number() OVER (ORDER BY day) - 1 AS rk,
         count(*) OVER () AS nd
  FROM (SELECT DISTINCT day FROM series)
),
batched AS (
  SELECT s.event_type, s.day, s.mv,
         CAST((r.rk * {N_MONITOR_BATCHES}) // r.nd AS BIGINT) AS b
  FROM series s JOIN ranked r USING (day)
),
refs AS (
  SELECT s.event_type,
         max(r.ref) AS ref,
         sum(abs(s.mv - r.ref)) // count(*) AS mad
  FROM series s JOIN (SELECT event_type, sum(mv) // count(*) AS ref
                      FROM series GROUP BY 1) r USING (event_type)
  GROUP BY 1
),
walk1 AS (
  SELECT b.event_type, b.day, b.b, r.mad,
         row_number() OVER w AS rn,
         sum(b.mv - r.ref) OVER w AS cusum
  FROM batched b JOIN refs r USING (event_type)
  WINDOW w AS (PARTITION BY b.event_type ORDER BY b.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
walk2 AS (
  SELECT event_type, day, b, rn, cusum,
         sum(CASE WHEN abs(cusum) > {CUSUM_H_MULT} * mad
                  THEN 1 ELSE 0 END) OVER w AS cumflag
  FROM walk1
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       CAST(arg_max(rn, day) AS BIGINT) AS n_days_seen,
       CAST(arg_max(cusum, day) AS BIGINT) AS cusum_end,
       CAST(arg_max(cumflag, day) AS BIGINT) AS n_flagged_total
FROM walk2 GROUP BY event_type, b
ORDER BY event_type, n_days_seen
"""


@register("s11_cusum_monitor_stream", oracle=_MONITOR_ORACLE)
def q_cusum_monitor_stream(spark, sf_dir):
    """Streaming CUSUM monitor on a REAL 3-micro-batch run: the day
    axis splits into three staged ranges, per-key integer cusum state
    crosses the state store, and each batch emits the key's cumulative
    (days seen, cusum, alarms) — all integers, hash-certified against
    a full recomputation at the same batch boundaries."""
    import shutil
    import tempfile
    import uuid

    from machine_learning_with_spark_streaming_spark.streaming.examples import (
        stage_ordered_files,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = _daily_mean_series(ev, "event_type", "ts", "value").select(
        "event_type",
        "day",
        F.round(F.col("mean_value") * 1e6).cast("long").alias("mv"),
    )

    # frozen per-key reference artifact (bounded by key cardinality)
    refs = (
        daily.groupBy("event_type")
        .agg(F.expr("sum(mv) div count(1)").alias("ref"))
        .join(daily, "event_type")
        .groupBy("event_type")
        .agg(
            F.first("ref").alias("ref"),
            F.expr("sum(abs(mv - ref)) div count(1)").alias("mad"),
        )
        .collect()
    )
    ref_mad = {r["event_type"]: (r["ref"], r["mad"]) for r in refs}

    # distinct days -> N_MONITOR_BATCHES contiguous day ranges. The day
    # domain is calendar-bounded (<= a few thousand rows at any SF), so
    # the rank->batch mapping is built driver-side from the collected
    # distinct days and broadcast back — no global row_number window
    # (the r3 scale-killer shape this staging used to share).
    day_vals = sorted(r["day"] for r in daily.select("day").distinct().collect())
    n_days = len(day_vals)
    assert n_days <= 100_000, f"day domain unexpectedly large: {n_days}"
    day_map = spark.createDataFrame(
        [(d, rk * N_MONITOR_BATCHES // n_days) for rk, d in enumerate(day_vals)],
        "day date, b long",
    )
    batched = daily.join(F.broadcast(day_map), "day")

    work = tempfile.mkdtemp(prefix="mlwss_cusum_mon_")
    stage = f"{work}/stage"
    stage_ordered_files(
        [
            batched.filter(F.col("b") == i).select("event_type", "day", "mv")
            for i in range(N_MONITOR_BATCHES)
        ],
        stage,
    )

    stream = (
        spark.readStream.schema("event_type string, day date, mv long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    sink = f"cusum_mon_{uuid.uuid4().hex[:8]}"
    q = (
        cusum_monitor(stream, ref_mad)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
    )
    start_and_await(q, spark)
    out = spark.table(sink).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    shutil.rmtree(work, ignore_errors=True)
    return out.orderBy("event_type", "n_days_seen")
