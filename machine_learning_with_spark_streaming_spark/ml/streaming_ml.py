"""ML on micro-batch streams — the reference repo's namesake capability.

The reference ships only the producer half (``Dataset/stream.py:16``
says the consumer is "a Spark Streaming Context"; CIFAR/sentiment/spam
payloads imply per-batch train/predict). This module supplies the
consumer: MLlib pipelines driven through ``foreachBatch``.

Two per-batch regimes (both distributed — ``fit`` runs on executors,
only the coefficient vector lives on the driver):

- ``train_per_batch``: refit on each micro-batch (the classic
  "ML with Spark Streaming" classroom loop) and append one metrics row
  per batch to a parquet sink.
- ``predict_per_batch``: score each micro-batch with a model fitted
  up-front (train-once / infer-forever), appending predictions.

At 100 TB the same ``foreachBatch`` bodies apply: each micro-batch is a
bounded DataFrame, so every batch op (fit, transform, write) shards
across the cluster; state that must persist between batches is the
fitted model object only.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_feature_vector(df: DataFrame, array_col: str = "features") -> DataFrame:
    """array<float|double> -> MLlib VectorUDT (JVM conversion, no UDF)."""
    return df.withColumn("features_vec", array_to_vector(F.col(array_col)))


def fit_logreg(
    train: DataFrame,
    label_col: str = "label",
    features_col: str = "features_vec",
    max_iter: int = 25,
    reg_param: float = 0.01,
):
    lr = LogisticRegression(
        maxIter=max_iter,
        regParam=reg_param,
        featuresCol=features_col,
        labelCol=label_col,
    )
    model = lr.fit(train)
    # Detach the training summary: it back-references the SparkSession,
    # so a model captured in a foreachBatch/task closure would drag the
    # session into task serialization — which fails outright once
    # anything has initialized the session's ObservationManager (any
    # Observation user, e.g. observe_metrics). Nothing here consumes
    # the summary; a caller who needs it can refit without this helper.
    try:
        model._java_obj.setSummary(
            train.sparkSession._jvm.scala.Option.empty()
        )
    except Exception:
        pass  # future-Spark guard: keep the model usable regardless
    return model


def accuracy_of(pred: DataFrame, label_col: str = "label") -> DataFrame:
    """One-row accuracy frame (aggregate stays distributed)."""
    return pred.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.avg((F.col("prediction") == F.col(label_col)).cast("double")), 6
        ).alias("accuracy"),
    )


def train_per_batch(
    stream_features: DataFrame,
    metrics_path: str,
    label_col: str = "label",
    array_col: str = "features",
):
    """foreachBatch body: refit on the batch, append metrics row.

    Returns the sink function for ``writeStream.foreachBatch``.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        vec = with_feature_vector(batch_df, array_col)
        model = fit_logreg(vec, label_col=label_col)
        pred = model.transform(vec)
        metrics = accuracy_of(pred, label_col).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        metrics.write.mode("append").parquet(metrics_path)

    return _sink


def predict_per_batch(
    model,
    predictions_path: str,
    array_col: str = "features",
):
    """foreachBatch body: score the batch with a pre-fitted model."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        vec = with_feature_vector(batch_df, array_col)
        pred = model.transform(vec).select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            "row_idx",
            F.col("prediction").cast("int").alias("prediction"),
        )
        pred.write.mode("append").parquet(predictions_path)

    return _sink
