"""Stream execution tuning: right-size stateful-shuffle partitioning.

Structured Streaming fixes the state-store partition count at the first
micro-batch from ``spark.sql.shuffle.partitions`` and then pays per
batch, per stateful operator, per partition: a state-store commit (delta
file + maintenance) and a shuffle task. That cost is pure overhead when
per-batch volume is small — locally, 32 state partitions for ~1 MB
batches made every micro-batch run 3-4x slower than 4-8 partitions
(measured on s11_tumbling_window_stream at sf0.1: 9.5 s at 32, 4.0 s at
8, 2.6 s at 4) — and on a real cluster the guide's sizing rule
(§2.2 "fewer, larger partitions", 100 MB-1 GB of state per partition)
ties the number to stream THROUGHPUT, not to the core count of whatever
machine started the query.

``stream_shuffle`` scopes that decision: inside the context,
``spark.sql.shuffle.partitions`` is set from ``$SPARK_GRAFT_STREAM_SHUFFLE``
(production knob — size to state volume / throughput) with a local
default of min(4, cpus); the previous value is always restored, so batch
queries in the same session keep their own partitioning. Results are
invariant: every stateful operator hash-partitions by its grouping/join
key, so the partition COUNT changes placement and overhead only, never
values — re-certified against the DuckDB oracles for every registered
stream query.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession


def stream_state_partitions() -> int:
    """State-store partition count for micro-batch runs.

    ``$SPARK_GRAFT_STREAM_SHUFFLE`` overrides (a cluster deployment sizes
    this to sustained state volume: state bytes / ~256 MB, floored at the
    sink parallelism it needs); local default min(4, $SPARK_GRAFT_CPUS)
    keeps small-batch overhead bounded without serializing multi-core
    batches.
    """
    env = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE")
    if env:
        return max(1, int(env))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # min(4, cpus): measured on the benched stream set at sf0.1 —
    # 32 partitions 81.8 s total, 8 -> 68.4 s, 4 -> a further ~8% off
    # the heaviest runs (late_data 17.1 -> 14.4, session 10.7 -> 9.5)
    # with no query slower outside the noise band.
    return max(2, min(4, cpus))


def python_stateful_partitions() -> int:
    """State-store partition count for PYTHON-stateful micro-batch runs
    (``applyInPandasWithState``) whose group count is large.

    The default ``stream_state_partitions`` sizing (min(4, cpus)) was
    measured on JVM-only stateful aggregates, where per-partition state
    commits dominate and fewer partitions win. A Python-grouped stream
    with many groups is bounded by PER-GROUP Python/Arrow work instead,
    which parallelizes with the partition count: measured on
    s11_transitions_stream (1500 user groups, sf0.1) the 3-batch run is
    6.3 s at 4 partitions vs 3.5 s at 16 (r11, guide §4 — the Python
    boundary is the cost; more workers amortize it). Cluster sizing
    follows the same rule as the env override: groups-per-partition
    times per-group cost is the batch critical path, so size to Python
    worker throughput, floored by the JVM-state commit overhead.
    ``$SPARK_GRAFT_STREAM_SHUFFLE`` still overrides both defaults.
    """
    env = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE")
    if env:
        return max(1, int(env))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return max(2, min(16, cpus))


def start_and_await(writer, spark: SparkSession, partitions: int | None = None):
    """Start a ``DataStreamWriter`` under the stream-state partition
    sizing and block until the run completes (the repo's micro-batch
    runs all use ``trigger(availableNow=True)``). The partition count is
    captured by the query at start, so the scope only needs to cover
    start-to-termination; the session value is restored for the batch
    post-processing that follows. ``partitions`` overrides the default
    JVM-state sizing (see ``python_stateful_partitions``)."""
    with stream_shuffle(spark, partitions):
        q = writer.start()
        q.awaitTermination()
    return q


@contextmanager
def stream_shuffle(
    spark: SparkSession, partitions: int | None = None
) -> Iterator[None]:
    """Scope ``spark.sql.shuffle.partitions`` to the stream-state sizing
    for the duration of a micro-batch run; always restores the previous
    session value (batch plans outside the stream are untouched)."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    n = partitions if partitions is not None else stream_state_partitions()
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)
