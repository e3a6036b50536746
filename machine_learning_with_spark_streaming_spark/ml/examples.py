"""Registered batch-mode ML queries over the ``embeddings`` table.

Model outputs aren't SQL-expressible, so these take the driver's
rows-only check; the determinism/quality assertions live in
tests/test_ml.py, and stream-batch parity for the per-batch loop is
proven in tests/test_streaming_ml.py.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.ml.streaming_ml import (
    accuracy_of,
    fit_logreg,
    with_feature_vector,
)
from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table


@register("ml_logreg_embeddings")  # model output: rows-only driver check
def q_logreg_embeddings(spark, sf_dir):
    """Train/test logistic regression on the embedding vectors
    (vec_id % 5 == 0 held out); returns the one-row accuracy frame."""
    emb = with_feature_vector(
        load_table(spark, sf_dir, "embeddings"), "embedding"
    )
    train = emb.filter(F.col("vec_id") % 5 != 0)
    test = emb.filter(F.col("vec_id") % 5 == 0)
    model = fit_logreg(train)
    return accuracy_of(model.transform(test))


@register("ml_kmeans_embeddings")  # model output: rows-only driver check
def q_kmeans_embeddings(spark, sf_dir):
    """KMeans (k=4, fixed seed) over embeddings; cluster cardinalities."""
    emb = with_feature_vector(
        load_table(spark, sf_dir, "embeddings"), "embedding"
    )
    model = KMeans(k=4, seed=42, featuresCol="features_vec").fit(emb)
    out = model.transform(emb)
    return (
        out.groupBy(F.col("prediction").alias("cluster"))
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("cluster")
    )
