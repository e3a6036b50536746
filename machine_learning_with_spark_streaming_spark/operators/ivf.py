"""IVF (inverted-file) approximate nearest neighbor over embeddings.

The classic two-level ANN: a coarse quantizer (KMeans centroids)
partitions the corpus into cells; a query probes only its ``nprobe``
nearest cells and ranks candidates exactly. Complements the sign-LSH
variant (operators/similarity.py) — IVF adapts to the data distribution
where LSH is data-independent.

Scale shape: the centroid table is tiny (k rows — broadcast); corpus
cell assignment is one MLlib transform (executor-parallel); the
candidate join is an equi-join on cell id, so a query touches
``nprobe/k`` of the corpus instead of all of it. At 100 TB the corpus
would be *stored* partitioned by cell id, making the probe a partition-
pruned scan.

KMeans output isn't SQL-expressible — driver check is rows-only; recall
floors and duplicate-recovery are asserted in tests/test_llm_data_ops.py.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.functions.vectors import as_double_array, cosine_similarity
from machine_learning_with_spark_streaming_spark.operators.similarity import TOP_K, N_QUERIES
from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table

N_CELLS = 16
N_PROBE = 2


def build_ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = N_CELLS,
    seed: int = 42,
):
    """Fit the coarse quantizer and assign every corpus vector a cell.

    Returns (assigned_corpus, centroids_df); centroids_df has
    (cell, centroid: array<double>) — k rows, always broadcastable.
    """
    vec = corpus.withColumn("__v", array_to_vector(as_double_array(vec_col)))
    km = KMeans(k=n_cells, seed=seed, featuresCol="__v", predictionCol="cell")
    model = km.fit(vec)
    assigned = model.transform(vec).select(
        F.col(id_col).alias("id"),
        as_double_array(vec_col).alias("v"),
        F.col("cell").cast("int").alias("cell"),
    )
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    return assigned, centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = N_CELLS,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """ANN top-k: probe the query's ``nprobe`` nearest cells, rank
    candidates by exact cosine."""
    assigned, centroids = build_ivf_index(corpus, id_col, vec_col, n_cells)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    )
    # nearest nprobe centroids per query: k-row broadcast cross join
    qc = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("sim", cosine_similarity(F.col("qv"), F.col("centroid")))
        .withColumn(
            "cr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cell"))
            ),
        )
        .filter(F.col("cr") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    scored = (
        assigned.join(qc, "cell")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            cosine_similarity(F.col("qv"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
            F.round("cos", 6).alias("cos"),
        )
    )


@register("sim_topk_ivf")  # KMeans quantizer: not DuckDB-expressible
def q_ivf_topk(spark, sf_dir):
    """IVF ANN top-5 for the first 8 vectors (nprobe=2 of 16 cells)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < N_QUERIES)).orderBy(
        "query_id", "rank"
    )
