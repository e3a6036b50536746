"""Multimodal-column operators — BASELINE.json north-star: treat
image/audio/video as opaque ``binary`` columns with typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
(``NotImplementedError`` for real codecs, a deterministic fake for the
pipeline path) — but the Spark-side plumbing is real and tested:

- asset schema: ``(asset_id BIGINT, kind STRING, payload BINARY,
  meta STRUCT<width INT, height INT, n_frames INT>)``
- metadata extraction stays JVM-side (``octet_length``/``sha2`` — no
  Python for what the engine can do natively);
- feature extraction runs as **Arrow-batched ``mapInPandas``** — the
  UDF sees ``bytes`` objects per row, vectorizes with numpy inside the
  batch, and emits a typed feature row. Partitioning is inherited from
  the scan; nothing collects to the driver, so the same code shards
  over a 100 TB asset lake.

The synthetic asset table is derived deterministically from
``documents`` (payload = UTF-8 text bytes) so the metadata path is
DuckDB-oracle-checkable; the numpy feature path gets the rows-only check
plus exactness tests in tests/test_multimodal.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table


def assets_from_documents(spark, sf_dir: str) -> DataFrame:
    """Deterministic synthetic asset table: payload = UTF-8 text bytes,
    meta derived from doc stats (fake but stable dimensions)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            ((F.col("n_chars") % 64) + 16).cast("int").alias("width"),
            ((F.col("n_chars") % 48) + 16).cast("int").alias("height"),
            ((F.col("doc_id") % 30) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires a codec library absent from this
    container. The pipeline uses :func:`fake_decode_stats` instead."""
    raise NotImplementedError(
        "image codecs (PIL/opencv) are not installed in this environment; "
        "swap in a real decoder here on a full cluster image"
    )


def decode_audio(payload: bytes) -> "object":
    raise NotImplementedError(
        "audio codecs are not installed in this environment"
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("mean_byte", DoubleType()),
        StructField("max_byte", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sampled_frames", IntegerType()),
    ]
)

FRAME_SAMPLE_EVERY = 5


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payloads.

    The deterministic fake stands in for decode+resize+frame-sample:
    byte statistics play the role of pixel statistics, and frame
    sampling takes every FRAME_SAMPLE_EVERY-th fake frame. Batch shape,
    schema, and partition behavior are exactly what a real decoder
    UDF would use.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            stats = [
                (
                    len(p),
                    float(np.frombuffer(p, dtype=np.uint8).mean()) if len(p) else 0.0,
                    int(np.frombuffer(p, dtype=np.uint8).max()) if len(p) else 0,
                )
                for p in pdf["payload"]
            ]
            arr = pd.DataFrame(stats, columns=["n_bytes", "mean_byte", "max_byte"])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "n_bytes": arr["n_bytes"].astype("int32"),
                    "mean_byte": arr["mean_byte"].round(6),
                    "max_byte": arr["max_byte"].astype("int32"),
                    "width": pdf["width"].astype("int32"),
                    "height": pdf["height"].astype("int32"),
                    "sampled_frames": (
                        (pdf["n_frames"] + FRAME_SAMPLE_EVERY - 1)
                        // FRAME_SAMPLE_EVERY
                    ).astype("int32"),
                }
            )

    flat = assets.select(
        "asset_id", "payload", "meta.width", "meta.height", "meta.n_frames"
    )
    return flat.mapInPandas(batches, FEATURE_SCHEMA)


_META_ORACLE = """
SELECT CAST(doc_id AS BIGINT) AS asset_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       sha256(text) AS payload_sha,
       CAST((n_chars % 64) + 16 AS INT) AS width,
       CAST((n_chars % 48) + 16 AS INT) AS height,
       CAST((doc_id % 30) + 1 AS INT) AS n_frames
FROM documents ORDER BY asset_id
"""


@register("mm_asset_metadata", oracle=_META_ORACLE)
def q_asset_metadata(spark, sf_dir):
    """JVM-side metadata over binary payloads: size, sha256, typed meta."""
    assets = assets_from_documents(spark, sf_dir)
    return assets.select(
        "asset_id",
        "kind",
        F.octet_length("payload").cast("int").alias("n_bytes"),
        F.lower(F.sha2("payload", 256)).alias("payload_sha"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
    ).orderBy("asset_id")


@register("mm_extract_features")  # numpy byte stats: not DuckDB-expressible
def q_extract_features(spark, sf_dir):
    """mapInPandas feature extraction (deterministic fake decode)."""
    assets = assets_from_documents(spark, sf_dir)
    return extract_features(assets).orderBy("asset_id")
