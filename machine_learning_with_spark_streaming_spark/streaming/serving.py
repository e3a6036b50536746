"""Stream-side ANN serving: per-micro-batch IVF probe with recall
accounting.

The sign-LSH serving stream (operators/similarity.py
q_ann_serving_stream) answers arriving queries from a data-independent
index; this is its IVF sibling with the missing production half —
QUALITY accounting. Embeddings stream in (the reference's TCP
micro-batch cadence re-expressed on files), each micro-batch probes the
FROZEN IVF index (pretrained centroids + cell-assigned corpus), and
every batch also audits itself: recall@k of the probe against exact
brute-force over the same batch's queries, the per-batch quality signal
a serving deployment alerts on (ann-benchmarks protocol, applied
online).

Scale shape per batch: the query batch is small and broadcast in both
arms; the corpus scan is partition-parallel and, at 100 TB, stored
partitioned by cell id so the IVF arm prunes to nprobe/k of it. The
brute-force audit arm is the expensive one — production samples it
(audit every batch at cert scale here; every Nth batch, or a query
subsample, at fleet scale) — and its per-batch cost is bounded by
|batch| × corpus with no state carried between batches, so a slow audit
never backs up the probe path.

Certification: batches are deterministic vec_id ranges staged as ordered
files, both arms are deterministic (ties broken by neighbor id), and the
per-batch report is integer (hit counts, per-mille recall), so the DuckDB
oracle recomputes the whole run from the same vec_id buckets — a REAL
multi-micro-batch streaming run, hash-certified. Retry idempotence:
batch_id-partitioned dynamic overwrite (foreach_batch_append_idempotent
pattern)."""

from __future__ import annotations

from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.functions.artifacts import (
    IVF_CENTROIDS,
)
from machine_learning_with_spark_streaming_spark.operators.ivf import (
    N_PROBE,
    _centroid_values,
    _cosd,
)
from machine_learning_with_spark_streaming_spark.operators.similarity import TOP_K
from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table
from machine_learning_with_spark_streaming_spark.streaming.tuning import start_and_await

N_SERVE_QUERIES = 12
QUERIES_PER_BATCH = 4


_ANN_SERVING_ORACLE = f"""
WITH centroids(cell, centroid) AS (VALUES
  {_centroid_values(IVF_CENTROIDS)}
),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, emb AS qv,
         CAST(vec_id // {QUERIES_PER_BATCH} AS BIGINT) AS batch_idx
  FROM v WHERE vec_id < {N_SERVE_QUERIES}
),
brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, v.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_cosd('q.qv', 'v.emb')} DESC, v.vec_id
           ) AS rank
    FROM q JOIN v ON v.vec_id <> q.query_id
  ) WHERE rank <= {TOP_K}
),
assigned AS (
  SELECT vec_id, emb, cell FROM (
    SELECT v.vec_id, v.emb, c.cell,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_cosd('v.emb', 'c.centroid')} DESC, c.cell
           ) AS rn
    FROM v CROSS JOIN centroids c
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_cosd('q.qv', 'c.centroid')} DESC, c.cell
           ) AS cr
    FROM q CROSS JOIN centroids c
  ) WHERE cr <= {N_PROBE}
),
ivf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY p.query_id
             ORDER BY {_cosd('p.qv', 'a.emb')} DESC, a.vec_id
           ) AS rank
    FROM probes p
    JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
  ) WHERE rank <= {TOP_K}
),
hits AS (
  SELECT b.query_id, count(i.neighbor_id) AS h
  FROM brute b
  LEFT JOIN ivf i
    ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
  GROUP BY 1
)
SELECT q.batch_idx,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(h.h) AS BIGINT) AS n_hits,
       CAST((1000 * sum(h.h)) // (count(*) * {TOP_K}) AS BIGINT)
         AS recall_permille
FROM q JOIN hits h ON h.query_id = q.query_id
GROUP BY 1 ORDER BY 1
"""


@register("s11_ivf_serving_stream", oracle=_ANN_SERVING_ORACLE)
def q_ivf_serving_stream(spark, sf_dir):
    """IVF ANN serving on a REAL 3-micro-batch embedding stream: each
    batch of 4 query vectors probes the frozen index (nprobe=2/16) and
    audits its own recall@5 against exact brute-force — per batch the
    report is (n_queries, n_hits, recall_permille), all integers."""
    import shutil
    import tempfile
    import uuid

    from machine_learning_with_spark_streaming_spark.streaming.examples import (
        stage_ordered_files,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qset = emb.filter(F.col("vec_id") < N_SERVE_QUERIES)

    work = tempfile.mkdtemp(prefix="mlwss_annserve_")
    stage, out_dir = f"{work}/stage", f"{work}/out"
    stage_ordered_files(
        [
            qset.filter(
                (F.col("vec_id") >= b * QUERIES_PER_BATCH)
                & (F.col("vec_id") < (b + 1) * QUERIES_PER_BATCH)
            )
            for b in range(N_SERVE_QUERIES // QUERIES_PER_BATCH)
        ],
        stage,
    )
    spark.createDataFrame(
        [], "n_queries long, n_hits long, recall_permille long, batch_id long"
    ).write.partitionBy("batch_id").parquet(out_dir)

    sf_dir_local, k = sf_dir, TOP_K

    def sink(batch_df, batch_id):
        from machine_learning_with_spark_streaming_spark.operators.ivf import (
            ivf_topk_pretrained,
        )
        from machine_learning_with_spark_streaming_spark.operators.similarity import (
            topk_cosine,
        )

        ss = batch_df.sparkSession
        corpus = load_table(ss, sf_dir_local, "embeddings").select(
            "vec_id", "embedding"
        )
        brute = topk_cosine(corpus, batch_df, k, dim=64)
        approx = ivf_topk_pretrained(corpus, batch_df, k)
        per_q = (
            brute.alias("b")
            .join(
                approx.alias("a"),
                (F.col("b.query_id") == F.col("a.query_id"))
                & (F.col("b.neighbor_id") == F.col("a.neighbor_id")),
                "left",
            )
            .groupBy(F.col("b.query_id").alias("query_id"))
            .agg(F.count(F.col("a.neighbor_id")).alias("__h"))
        )
        report = (
            per_q.agg(
                F.count(F.lit(1)).cast("long").alias("n_queries"),
                F.sum("__h").cast("long").alias("n_hits"),
                F.expr(f"(1000 * sum(__h)) div (count(1) * {k})")
                .cast("long")
                .alias("recall_permille"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .localCheckpoint(eager=True)
        )
        prev = ss.conf.get("spark.sql.sources.partitionOverwriteMode")
        ss.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            report.write.mode("overwrite").partitionBy("batch_id").parquet(
                out_dir
            )
        finally:
            ss.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    q = (
        spark.readStream.schema(qset.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{work}/ckpt_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
    )
    start_and_await(q, spark)
    out = (
        spark.read.schema(
            "n_queries long, n_hits long, recall_permille long, batch_id long"
        )
        .parquet(out_dir)
        .select(
            F.col("batch_id").cast("long").alias("batch_idx"),
            "n_queries",
            "n_hits",
            "recall_permille",
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(work, ignore_errors=True)
    return out.orderBy("batch_idx")
