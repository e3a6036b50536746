"""Multimodal-column operators — BASELINE.json north-star: treat
image/audio/video as opaque ``binary`` columns with typed metadata.

The container has no compressed-format codec libraries, so PNG/JPEG/MP3
decode stays gated behind ``NotImplementedError`` — but uncompressed
BMP and PCM WAV decode for real via pure-stdlib parsers
(operators/codecs.py, queries ``mm_decode_bmp``/``mm_decode_wav``), and
the generic feature pipeline uses a deterministic fake decode whose
byte statistics are oracle-checked. The Spark-side plumbing is real and
tested throughout:

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
plus exactness tests in tests/test_llm_data_ops.py.
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


def decode_image(payload: bytes) -> dict:
    """Image decode. Uncompressed 24-bit BMP parses for real via the
    stdlib ``struct`` codec (operators/codecs.py, backing the
    ``mm_decode_bmp`` query); compressed formats (PNG/JPEG) need a codec
    library absent from this container."""
    if payload[:2] == b"BM":
        from machine_learning_with_spark_streaming_spark.operators.codecs import decode_bmp

        return decode_bmp(payload)
    raise NotImplementedError(
        "compressed image codecs (PIL/opencv) are not installed in this "
        "environment; only uncompressed BMP decodes here"
    )


def decode_audio(payload: bytes) -> dict:
    """Audio decode. PCM WAV parses for real via the stdlib ``wave``
    codec (operators/codecs.py, backing ``mm_decode_wav``); compressed
    formats (MP3/OGG) need codec libraries absent from this container."""
    if payload[:4] == b"RIFF":
        from machine_learning_with_spark_streaming_spark.operators.codecs import decode_wav

        return decode_wav(payload)
    raise NotImplementedError(
        "compressed audio codecs are not installed in this environment; "
        "only PCM WAV decodes here"
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
                    # raw double; rounding happens JVM-side below — Python
                    # round() is banker's and diverges from DuckDB's
                    # half-up on exact .xxxxxx5 ties
                    "mean_byte": arr["mean_byte"],
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
    return flat.mapInPandas(batches, FEATURE_SCHEMA).withColumn(
        "mean_byte", F.round("mean_byte", 6)
    )


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


# Per-byte BLOB access in ANSI SQL: hex() the payload once, then a
# list_transform over byte indices decodes each hex pair to its int
# value. Sums are exact (integers < 2^53), so mean = sum/n is the same
# double in both engines — numpy's uint8 mean upcasts to float64 with
# an exact integer sum too.
_HEX_BYTES = """
         list_transform(range(1, n + 1), i ->
           (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
           + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)"""

_FEATURES_ORACLE = f"""
WITH h AS (
  SELECT doc_id, n_chars, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
),
b AS (
  SELECT doc_id, n_chars, n, {_HEX_BYTES} AS bytes
  FROM h
)
SELECT CAST(doc_id AS BIGINT) AS asset_id,
       CAST(n AS INT) AS n_bytes,
       CASE WHEN n = 0 THEN 0.0
            ELSE round(CAST(list_sum(bytes) AS DOUBLE) / n, 6) END AS mean_byte,
       CAST(CASE WHEN n = 0 THEN 0 ELSE list_aggregate(bytes, 'max') END AS INT)
         AS max_byte,
       CAST((n_chars % 64) + 16 AS INT) AS width,
       CAST((n_chars % 48) + 16 AS INT) AS height,
       CAST(CAST(((doc_id % 30) + 1 + 4) AS BIGINT) // 5 AS INT) AS sampled_frames
FROM b ORDER BY asset_id
"""


@register("mm_extract_features", oracle=_FEATURES_ORACLE)
def q_extract_features(spark, sf_dir):
    """mapInPandas feature extraction (deterministic fake decode); the
    oracle replays the byte statistics via hex-pair decoding in SQL."""
    assets = assets_from_documents(spark, sf_dir)
    return extract_features(assets).orderBy("asset_id")


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset", IntegerType()),
        StructField("frame_mean_byte", DoubleType()),
    ]
)


def sample_frames(assets: DataFrame, every: int = FRAME_SAMPLE_EVERY) -> DataFrame:
    """1→N frame expansion over video payloads (Arrow-batched).

    The deterministic fake treats the payload as ``n_frames`` equal
    byte slices and emits every ``every``-th slice's statistics — the
    row-expansion contract (UDTF shape) a real frame decoder would use.
    Output cardinality = Σ ceil(n_frames/every) per video asset; the
    expansion happens inside the executor batch, so a 100 TB asset lake
    fans out without any driver involvement.
    """

    def expand(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [],
                "frame_idx": [],
                "frame_offset": [],
                "frame_mean_byte": [],
            }
            for aid, payload, n_frames in zip(
                pdf["asset_id"], pdf["payload"], pdf["n_frames"]
            ):
                n = max(int(n_frames), 1)
                buf = np.frombuffer(payload, dtype=np.uint8)
                frame_len = max(len(buf) // n, 1)
                for idx in range(0, n, every):
                    chunk = buf[idx * frame_len : (idx + 1) * frame_len]
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(idx)
                    out["frame_offset"].append(idx * frame_len)
                    out["frame_mean_byte"].append(
                        float(chunk.mean()) if len(chunk) else 0.0
                    )
            yield pd.DataFrame(out)

    videos = assets.filter(F.col("kind") == "video").select(
        "asset_id", "payload", F.col("meta.n_frames").alias("n_frames")
    )
    return videos.mapInPandas(expand, FRAME_SCHEMA).withColumn(
        "frame_mean_byte", F.round("frame_mean_byte", 6)
    )


_FRAMES_ORACLE = f"""
WITH h AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n,
         CAST((doc_id % 30) + 1 AS INT) AS n_frames
  FROM documents WHERE doc_id % 3 = 2
),
b AS (
  SELECT doc_id, n, n_frames,
         greatest(n // n_frames, 1) AS frame_len,
         {_HEX_BYTES} AS bytes
  FROM h
),
frames AS (
  SELECT doc_id, frame_len,
         CAST(u.frame_idx AS INT) AS frame_idx,
         list_slice(bytes, frame_idx * frame_len + 1,
                    (frame_idx + 1) * frame_len) AS chunk
  FROM b, unnest(range(0, CAST(n_frames AS BIGINT), {FRAME_SAMPLE_EVERY}))
           AS u(frame_idx)
)
SELECT CAST(doc_id AS BIGINT) AS asset_id,
       frame_idx,
       CAST(frame_idx * frame_len AS INT) AS frame_offset,
       CASE WHEN len(chunk) = 0 THEN 0.0
            ELSE round(CAST(list_sum(chunk) AS DOUBLE) / len(chunk), 6)
       END AS frame_mean_byte
FROM frames ORDER BY asset_id, frame_idx
"""


@register("mm_sample_frames", oracle=_FRAMES_ORACLE)
def q_sample_frames(spark, sf_dir):
    """Every-5th-frame sampling over the video assets (1→N expansion);
    the oracle replays the slice arithmetic over hex-decoded bytes."""
    assets = assets_from_documents(spark, sf_dir)
    return sample_frames(assets).orderBy("asset_id", "frame_idx")
