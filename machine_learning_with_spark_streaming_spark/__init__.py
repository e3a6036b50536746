"""machine_learning_with_spark_streaming_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``UshaHorapeti/Machine-Learning-with-Spark-Streaming`` (a pandas
+ DAX + T-SQL demand-planning ETL plus a TCP micro-batch streaming producer),
re-expressed Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes; no hand scheduling),
- broadcast joins for dimension enrichment, window functions for the
  sort+cumsum+self-join patterns, ``rollup``/``grouping()`` for DAX subtotals,
- Structured Streaming for the micro-batch JSON payload contract,
- plus large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) designed for 100 TB scale.

Layout:
    session      SparkSession factory (AQE + Arrow on)
    schemas      canonical fact schema + testdata schemas
    sources/     file readers with schema gates, JDBC-shaped IO
    functions/   scalar expression toolkit (cleaning, dates, keys, text, vectors)
    operators/   joins, aggregates, windows, reshape, validation, dedup, similarity
    plans/       declarative JobSpec -> DataFrame pipeline (the reference's
                 JobConfig idea reborn; pipeline/lib.py:167-185)
    streaming/   micro-batch JSON ingest + event-time windowed aggregation,
                 stateful operators (applyInPandasWithState)
    ml/          per-batch MLlib train/predict (foreachBatch consumers)
"""

from machine_learning_with_spark_streaming_spark.session import get_session

__all__ = ["get_session"]
