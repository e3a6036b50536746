"""ML-on-stream tests: per-batch train/predict through foreachBatch over
the reference's payload contract (Dataset/stream.py), plus the batch
MLlib queries' quality floors."""

import json

import pytest
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.ml.streaming_ml import (
    accuracy_of,
    fit_logreg,
    predict_per_batch,
    train_per_batch,
    with_feature_vector,
)
from machine_learning_with_spark_streaming_spark.schemas import load_table
from machine_learning_with_spark_streaming_spark.streaming.pipeline import run_available_now
from machine_learning_with_spark_streaming_spark.streaming.source import (
    features_as_vector,
    parse_feature_lines,
    read_feature_stream_files,
)

N_FEATURES = 4


def _separable_payload(start: int, n_rows: int) -> str:
    """Linearly separable rows: label = 1 iff feature0 > 0."""
    out = {}
    for i in range(start, start + n_rows):
        sign = 1.0 if i % 2 == 0 else -1.0
        out[str(i)] = {
            "feature0": sign * (1.0 + i % 7),
            "feature1": float(i % 5),
            "feature2": -float(i % 3),
            "feature3": 0.5,
            "label": 1.0 if sign > 0 else 0.0,
        }
    return json.dumps(out)


@pytest.fixture()
def payload_dir(tmp_path):
    d = tmp_path / "payload"
    d.mkdir()
    for b in range(3):
        (d / f"batch_{b}.jsonl").write_text(_separable_payload(b * 20, 20) + "\n")
    return d


def test_train_per_batch_metrics(spark, payload_dir, tmp_path):
    stream = features_as_vector(
        read_feature_stream_files(spark, str(payload_dir), N_FEATURES), N_FEATURES
    )
    metrics_path = str(tmp_path / "metrics")
    run_available_now(
        stream,
        train_per_batch(stream, metrics_path),
        checkpoint=str(tmp_path / "ckpt"),
    )
    metrics = spark.read.parquet(metrics_path).orderBy("batch_id").collect()
    assert len(metrics) >= 1  # availableNow may coalesce file batches
    assert sum(m.n_rows for m in metrics) == 60
    # separable data: per-batch refit must fit its own batch near-perfectly
    assert all(m.accuracy >= 0.95 for m in metrics)


def test_predict_per_batch_parity_with_batch_scoring(spark, payload_dir, tmp_path):
    batch_rows = features_as_vector(
        parse_feature_lines(spark.read.text(str(payload_dir)), N_FEATURES),
        N_FEATURES,
    )
    model = fit_logreg(with_feature_vector(batch_rows))
    pred_path = str(tmp_path / "preds")
    stream = features_as_vector(
        read_feature_stream_files(spark, str(payload_dir), N_FEATURES), N_FEATURES
    )
    run_available_now(
        stream,
        predict_per_batch(model, pred_path),
        checkpoint=str(tmp_path / "ckpt"),
    )
    streamed = spark.read.parquet(pred_path)
    assert streamed.count() == 60
    # stream-batch parity: same model, same rows -> same predictions
    batch_pred = model.transform(with_feature_vector(batch_rows)).select(
        "row_idx", F.col("prediction").cast("int").alias("prediction")
    )
    diff = streamed.select("row_idx", "prediction").exceptAll(batch_pred)
    assert diff.count() == 0


def test_logreg_embeddings_quality(spark, sf_dir):
    emb = with_feature_vector(load_table(spark, sf_dir, "embeddings"), "embedding")
    train = emb.filter(F.col("vec_id") % 5 != 0)
    test = emb.filter(F.col("vec_id") % 5 == 0)
    model = fit_logreg(train)
    # synthetic labels are noise, so held-out accuracy is chance-level;
    # the model must still *fit* its training set beyond the class floor
    # (64-dim LR on a few hundred rows separates noise easily)
    n_labels = emb.select("label").distinct().count()
    train_acc = accuracy_of(model.transform(train)).first().accuracy
    assert train_acc > 1.5 / n_labels
    r = accuracy_of(model.transform(test)).first()
    assert 0.0 <= r.accuracy <= 1.0
    assert r.n_rows == test.count()


def test_model_closure_survives_observation_manager_init(spark, tmp_path):
    """Regression: once anything initializes the session's
    ObservationManager (any Observation user, e.g. observe_metrics), a
    model whose trainingSummary back-references the SparkSession can no
    longer be serialized into a task closure — fit_logreg must hand out
    a summary-detached model so ML sinks keep working in any order."""
    from machine_learning_with_spark_streaming_spark.operators.validation import (
        observe_metrics,
        observed_gate_metrics,
    )

    # poison first: initialize the ObservationManager on this session
    df = spark.range(10).withColumn("n_chars", F.col("id") * 10)
    observed, obs = observe_metrics(
        df, "poison", observed_gate_metrics(F.col("n_chars") >= 50)
    )
    observed.count()
    assert obs.get["n_rows"] == 10

    # then serialize a freshly fitted model into a foreachBatch closure
    train = spark.createDataFrame(
        [([1.0, 0.0, 0.0, 0.0], 1.0), ([-1.0, 0.0, 0.0, 0.0], 0.0)] * 10,
        "features array<double>, label double",
    ).withColumn("row_idx", F.monotonically_increasing_id())
    model = fit_logreg(with_feature_vector(train))
    stage = str(tmp_path / "stage")
    train.coalesce(1).write.parquet(stage)
    stream = spark.readStream.schema(
        "features array<double>, label double, row_idx long"
    ).parquet(stage)
    run_available_now(
        stream,
        predict_per_batch(model, str(tmp_path / "preds")),
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert spark.read.parquet(str(tmp_path / "preds")).count() == 20
