"""Micro-batch JSON payload ingestion (S11).

The reference's producer (``Dataset/stream.py:150-201``) sends one JSON
object per line over TCP ``localhost:6100`` every 5 s:

    {"0": {"feature0": 1.0, ..., "featureN": 2.1, "label": 4},
     "1": {...}}

i.e. a map row_idx -> feature struct, ``batch_size`` rows per line. The
Spark-side contract is: ``from_json`` with an explicit
``MapType(String, Struct)`` schema, ``explode`` the map to rows, cast the
key to the row index. Works identically over the socket source (live) and
the file source (tests/replay) — the parse is a pure column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from machine_learning_with_spark_streaming_spark.schemas import feature_payload_schema

DEFAULT_PORT = 6100  # Dataset/stream.py:24-36


def payload_map_schema(n_features: int, with_label: bool = True) -> T.MapType:
    return T.MapType(T.StringType(), feature_payload_schema(n_features, with_label))


def parse_feature_lines(
    lines: DataFrame,
    n_features: int,
    with_label: bool = True,
    line_col: str = "value",
) -> DataFrame:
    """One JSON line -> N feature rows (row_idx, feature0.., label).

    Works on both static and streaming DataFrames (same expressions).
    """
    schema = payload_map_schema(n_features, with_label)
    parsed = lines.select(F.from_json(F.col(line_col), schema).alias("batch"))
    exploded = parsed.select(F.explode("batch").alias("row_idx", "row"))
    return exploded.select(
        F.col("row_idx").cast("long").alias("row_idx"), F.col("row.*")
    )


def features_as_vector(df: DataFrame, n_features: int) -> DataFrame:
    """MLlib-ready shape: pack feature columns into ``array<double>``
    (the VectorAssembler convention without the mllib dependency in the
    hot path)."""
    arr = F.array(*[F.col(f"feature{i}") for i in range(n_features)])
    keep = [c for c in df.columns if not c.startswith("feature")]
    return df.select(*keep, arr.alias("features"))


def read_feature_stream_socket(
    spark: SparkSession,
    n_features: int,
    host: str = "localhost",
    port: int = DEFAULT_PORT,
    with_label: bool = True,
) -> DataFrame:
    """Live contract: TCP socket source (the reference's transport)."""
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return parse_feature_lines(lines, n_features, with_label)


def read_feature_stream_files(
    spark: SparkSession,
    path: str,
    n_features: int,
    with_label: bool = True,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Replay/test contract: file source, one payload line per file-line.
    ``maxFilesPerTrigger=1`` reproduces the producer's batch cadence."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.text(path)
    return parse_feature_lines(lines, n_features, with_label)
