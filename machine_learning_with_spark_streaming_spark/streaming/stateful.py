"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only stateful pattern is batch-side "latest snapshot"
(SURVEY §2.10); the engine's superset keeps running per-key state across
micro-batches. State lives in the state store (per key, sharded across
executors) — nothing accumulates on the driver, so key cardinality
scales with the cluster, not the driver heap.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def running_totals(
    stream: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches;
    emits the updated totals for each key seen in a batch."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        # raw double out; consumers round JVM-side (F.round is HALF_UP
        # like the DuckDB oracle — Python round() is banker's and would
        # diverge on exact .xxxxxx5 ties)
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "value_sum": [s]}
        )

    return (
        stream.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


PACK_STREAM_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("chunk_id", LongType()),
    ]
)

_PACK_STATE_SCHEMA = StructType(
    [StructField("chunk", LongType()), StructField("used", LongType())]
)


def streaming_packer(
    stream: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    part_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming sequence packer: the exact greedy token-budget walk of
    ``operators/sampling.py:pack_token_budget_exact``, with the
    (chunk, used) cursor carried in the state store per stream key —
    chunk assignment becomes an *ingest-time* property instead of a
    batch recompute.

    Contract: per key, documents must arrive in ``id_col`` order across
    micro-batches (the staging/partitioning layer's job — e.g. id-range
    files, or Kafka partitions keyed by source with ordered producers);
    within a batch the walk sorts. Under that contract the assignment
    equals the batch walk over the whole corpus — which is exactly what
    the oracle checks.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        chunk, used = state.get if state.exists else (0, 0)
        # A key's batch rows arrive as MULTIPLE Arrow chunks in
        # arbitrary shuffle order once the group exceeds
        # arrow.maxRecordsPerBatch — concatenate before the single
        # sorted walk, or the greedy cursor diverges from the batch
        # walk (and the oracle) exactly when groups get big.
        chunks = list(pdfs)
        if not chunks:  # timeout-triggered invocations carry no rows
            return
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        out = []
        for t in pdf[tokens_col]:
            t = int(t)
            if used > 0 and used + t > budget:
                chunk, used = chunk + 1, 0
            out.append(chunk)
            used += t
        state.update((chunk, used))
        yield pd.DataFrame(
            {
                "source": key[0],
                "doc_id": pdf[id_col],
                "n_tokens": pdf[tokens_col],
                "chunk_id": out,
            }
        )

    return (
        stream.select(part_col, id_col, tokens_col)
        .groupBy(part_col)
        .applyInPandasWithState(
            update,
            outputStructType=PACK_STREAM_SCHEMA,
            stateStructType=_PACK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
