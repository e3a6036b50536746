"""Distributed model training + evaluation metrics as pure aggregation
plans — multinomial Naive Bayes and rank-statistic ROC-AUC.

Unlike the frozen-artifact serving queries (ml/examples.py), Naive Bayes
*training* is itself nothing but counting, so the full train→score→
evaluate loop is one declarative plan the driver can hash-certify
end-to-end — the distributed-training story the reference's
`Dataset/stream.py` MLlib fits (NaiveBayes/LogisticRegression consumers)
tell, re-expressed without any Python in the hot path.

Exactness contract (cross-engine): every per-token log-weight is
6-dp-stabilized at source — ``round(ln(p) * 1e6)`` as BIGINT — so the
per-document class scores are *integer sums*, immune to float summation
order; argmax ties break to the lexicographically smallest class in both
engines. AUC is computed from the Mann–Whitney rank-sum identity in pure
BIGINT arithmetic (doubled rank sums keep tie-averaged ranks integral),
with the final ratio emitted as truncating integer division at 1e-6
resolution.

Scale shape:
- NB training shuffles the *vocabulary*, not the corpus: token counts
  are map-side-combined ``groupBy(class, word)``; the weight table is
  |V|·|C| rows (bounded by vocabulary size, classes ≤ a handful).
- Scoring joins the exploded corpus to the weight table on ``word`` — a
  standard shuffle join whose payload per row is one BIGINT, followed by
  a per-(doc, class) partial sum. No step materializes per-class state
  on the driver.
- AUC's global cumulative window runs on the *distinct-score histogram*
  (``groupBy(score_e6)``), not the corpus — bounded by score resolution,
  so the single-partition window sort is over a small aggregate table
  (same shape as the equi-width-histogram operator a17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.functions.ml_artifacts import LOGREG_WEIGHTS
from machine_learning_with_spark_streaming_spark.functions.vectors import as_double_array, dot
from machine_learning_with_spark_streaming_spark.operators.text import _NORM, words
from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table

E6 = 1_000_000

# --------------------------------------------------------- Naive Bayes


def naive_bayes_confusion(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    class_col: str = "lang",
) -> DataFrame:
    """Train multinomial NB (Laplace +1) on ``docs`` and score the same
    corpus; return the confusion matrix (lang, pred, n_docs).

    The token table feeds three consumers (class-word counts, the
    vocabulary, the scoring join), so it is persisted once — the
    cluster-scale analog is a tokenized temp table (same rationale as
    the shingle-table persist in operators/dedup.py).
    """
    from pyspark.storagelevel import StorageLevel

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.col(class_col).alias("y"),
        F.explode(words(text_col)).alias("w"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    classes = docs.groupBy(F.col(class_col).alias("c")).agg(
        F.count(F.lit(1)).alias("n_docs_c")
    )
    total = docs.agg(F.count(F.lit(1)).alias("n_docs_all"))
    priors = classes.crossJoin(F.broadcast(total)).select(
        "c",
        F.round(F.log(F.col("n_docs_c") / F.col("n_docs_all")) * E6, 0)
        .cast("long")
        .alias("prior_e6"),
    )

    wc = toks.groupBy("y", "w").agg(F.count(F.lit(1)).alias("cnt"))
    nc = wc.groupBy("y").agg(F.sum("cnt").alias("n_tok_c"))
    # |V| from the (class, word) aggregate, not the raw token table —
    # wc is already vocabulary-sized, the token table is corpus-sized
    vsize = wc.select("w").distinct().agg(F.count(F.lit(1)).alias("v_size"))

    # Smoothed log-likelihoods for OBSERVED (word, class) pairs only,
    # plus a per-class Laplace FLOOR ln(1/(N_c+V)) for everything else.
    # The naive formulation materializes the |V|x|C| full grid and fans
    # the scoring join out to tokens x |C| rows; this complement algebra
    # — score(id,c) = Σ observed loglik + (n_tokens − n_matched)·floor_c
    # — produces bit-identical integers (unseen pairs' weight IS the
    # floor) while joining tokens only to pairs that exist (~1-2 of C
    # classes for language-specific words). Measured 64x-docs stress:
    # 108.9 s (grid) → see EXPLAIN round-10 table (complement form).
    obs = (
        wc.withColumnRenamed("y", "c")
        .join(F.broadcast(nc.withColumnRenamed("y", "c")), "c")
        .crossJoin(F.broadcast(vsize))
        .select(
            "w",
            "c",
            F.round(
                F.log((F.col("cnt") + 1) / (F.col("n_tok_c") + F.col("v_size")))
                * E6,
                0,
            )
            .cast("long")
            .alias("loglik_e6"),
        )
    )
    floors = (
        nc.withColumnRenamed("y", "c")
        .crossJoin(F.broadcast(vsize))
        .select(
            "c",
            F.round(F.log(1 / (F.col("n_tok_c") + F.col("v_size"))) * E6, 0)
            .cast("long")
            .alias("floor_e6"),
        )
    )
    doc_stats = toks.groupBy("id", "y").agg(F.count(F.lit(1)).alias("n_toks"))
    # BROADCAST the weight table: it is vocabulary-sized (observed
    # (word, class) pairs ~16 bytes each), while a shuffle join here
    # repartitions the corpus-sized token table on `w` — a key domain
    # of only |V| values, i.e. maximal skew (measured at 64x docs:
    # 17.3M tokens over 1,984 words; the broadcast form removes that
    # exchange entirely and the groupBy partial-aggregates map-side).
    # Corpora whose weight table outgrows broadcast (V*C beyond ~10^8)
    # should drop the hint and salt the join instead.
    matched = (
        toks.join(F.broadcast(obs), "w")
        .groupBy("id", "c")
        .agg(
            F.sum("loglik_e6").alias("ll_obs"),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )
    scored = (
        doc_stats.crossJoin(F.broadcast(classes.select("c")))
        .join(matched, ["id", "c"], "left")
        .join(F.broadcast(floors), "c")
        .join(F.broadcast(priors), "c")
        .select(
            "id",
            "y",
            "c",
            (
                F.coalesce(F.col("ll_obs"), F.lit(0))
                + (F.col("n_toks") - F.coalesce(F.col("n_matched"), F.lit(0)))
                * F.col("floor_e6")
                + F.col("prior_e6")
            ).alias("score"),
        )
    )
    rn = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("c"))
    pred = scored.withColumn("rn", F.row_number().over(rn)).filter("rn = 1")

    out = (
        pred.groupBy(F.col("y").alias("lang"), F.col("c").alias("pred"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "pred")
    )
    return out


_NB_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, lang, {_NORM} AS nrm FROM documents
),
toks AS (
  SELECT doc_id AS id, lang AS y, unnest(string_split(nrm, ' ')) AS w
  FROM corpus
),
classes AS (SELECT lang AS c, count(*) AS n_docs_c FROM corpus GROUP BY 1),
total AS (SELECT count(*) AS n_docs_all FROM corpus),
priors AS (
  SELECT c,
         CAST(round(ln(CAST(n_docs_c AS DOUBLE) / n_docs_all) * 1e6, 0)
              AS BIGINT) AS prior_e6
  FROM classes, total
),
wc AS (SELECT y, w, count(*) AS cnt FROM toks GROUP BY 1, 2),
nc AS (SELECT y, sum(cnt) AS n_tok_c FROM wc GROUP BY 1),
vocab AS (SELECT DISTINCT w FROM toks),
vsize AS (SELECT count(*) AS v_size FROM vocab),
weights AS (
  SELECT vocab.w, classes.c,
         CAST(round(ln((coalesce(wc.cnt, 0) + 1)
                       / CAST(nc.n_tok_c + vsize.v_size AS DOUBLE)) * 1e6, 0)
              AS BIGINT) AS loglik_e6
  FROM vocab
  CROSS JOIN classes
  LEFT JOIN wc ON wc.w = vocab.w AND wc.y = classes.c
  JOIN nc ON nc.y = classes.c
  CROSS JOIN vsize
),
scored AS (
  SELECT t.id, t.y, wt.c, sum(wt.loglik_e6) AS ll_sum
  FROM toks t JOIN weights wt ON wt.w = t.w
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT id, y, c FROM (
    SELECT s.id, s.y, s.c,
           row_number() OVER (
             PARTITION BY s.id
             ORDER BY s.ll_sum + p.prior_e6 DESC, s.c
           ) AS rn
    FROM scored s JOIN priors p ON p.c = s.c
  ) WHERE rn = 1
)
SELECT y AS lang, c AS pred, CAST(count(*) AS BIGINT) AS n_docs
FROM pred GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("ml_naive_bayes", oracle=_NB_ORACLE)
def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier trained AND evaluated
    in one declarative plan over the documents table (reference
    `Dataset/stream.py` NaiveBayes consumer, re-expressed as counting)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return naive_bayes_confusion(docs)


# ------------------------------------------------------------- ROC-AUC


def auc_rank(
    scored: DataFrame, label_col: str = "y", score_col: str = "score_e6"
) -> DataFrame:
    """One-row (n_pos, n_neg, auc_e6) via the Mann–Whitney rank-sum
    identity with tie-averaged ranks, entirely in BIGINT.

    For each distinct score s (ascending) with ``n`` rows of which
    ``n_pos`` positive, the tie-averaged rank is ``cum_before +
    (n + 1) / 2``; doubling keeps it integral:
    ``2·ranksum = Σ n_pos · (2·cum_before + n + 1)``. Then
    ``AUC = (2·ranksum − P(P+1)) / (2·P·N)``, emitted ×1e6 with
    truncating division (NULL when either class is empty, both
    engines).
    """
    g = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(label_col).cast("long")).alias("np"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    terms = g.select(
        "n",
        "np",
        (
            F.col("np")
            * (2 * F.coalesce(F.sum("n").over(w), F.lit(0)) + F.col("n") + 1)
        ).alias("r2"),
    )
    return terms.agg(
        F.sum("np").cast("long").alias("n_pos"),
        (F.sum("n") - F.sum("np")).cast("long").alias("n_neg"),
        F.expr(
            f"(sum(r2) - sum(np) * (sum(np) + 1)) * {E6}"
            " div nullif(2 * sum(np) * (sum(n) - sum(np)), 0)"
        ).alias("auc_e6"),
    )


def _w0_values() -> str:
    w = LOGREG_WEIGHTS[0]
    lit = "[" + ", ".join(repr(x) for x in w[1]) + "]"
    return f"(CAST({lit} AS DOUBLE[]), {w[2]!r})"


_AUC_ORACLE = f"""
WITH w0(w, b) AS (VALUES
  {_w0_values()}
),
scored AS (
  SELECT CASE WHEN label = 0 THEN 1 ELSE 0 END AS y,
         CAST(round(
           (list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                             w0.w) + w0.b) * 1e6, 0) AS BIGINT) AS score_e6
  FROM embeddings, w0
),
g AS (
  SELECT score_e6 AS s, count(*) AS n, sum(y) AS np
  FROM scored GROUP BY 1
),
terms AS (
  SELECT n, np,
         np * (2 * coalesce(sum(n) OVER (
                ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ), 0) + n + 1) AS r2
  FROM g
)
SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       CAST(sum(n) - sum(np) AS BIGINT) AS n_neg,
       CAST((sum(r2) - sum(np) * (sum(np) + 1)) * 1000000
            // nullif(2 * sum(np) * (sum(n) - sum(np)), 0) AS BIGINT)
         AS auc_e6
FROM terms
"""


@register("ml_auc_rank", oracle=_AUC_ORACLE)
def q_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the frozen logreg class-0 margin as a one-vs-rest
    detector for label 0, computed distributively from rank statistics
    (no per-threshold sweep, no collect)."""
    emb = load_table(spark, sf_dir, "embeddings")
    wdf = spark.createDataFrame([LOGREG_WEIGHTS[0]], "class int, w array<double>, b double")
    scored = (
        emb.crossJoin(F.broadcast(wdf))
        .select(
            F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
            F.round(
                (dot(as_double_array("embedding"), F.col("w")) + F.col("b")) * E6, 0
            )
            .cast("long")
            .alias("score_e6"),
        )
    )
    return auc_rank(scored)


# -------------------------------------------------- precision-recall curve


def pr_curve(
    scored: DataFrame, label_col: str = "y", score_col: str = "score_e6"
) -> DataFrame:
    """Full precision-recall curve at EVERY distinct score threshold
    (predict positive iff score >= t), entirely in BIGINT: tp/fp/fn
    from one cumulative window over the distinct-score histogram
    (never the corpus — the auc_rank plan shape), precision/recall as
    truncating-division ppm. The threshold sweep sklearn does with a
    sort+scan, as one aggregation + one bounded window."""
    g = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(label_col).cast("long")).alias("np"),
    )
    w = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = g.select(
        "s",
        F.sum("n").over(w).alias("predp"),
        F.sum("np").over(w).alias("tp"),
    )
    total_pos = F.sum("np").over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    gp = g.select("s", total_pos.alias("__p")).select(F.max("__p").alias("p"))
    return (
        cum.crossJoin(F.broadcast(gp))
        .select(
            F.col("s").alias("threshold_e6"),
            F.col("tp").cast("long").alias("tp"),
            (F.col("predp") - F.col("tp")).cast("long").alias("fp"),
            (F.col("p") - F.col("tp")).cast("long").alias("fn"),
            F.expr("(tp * 1000000) div predp").cast("long").alias("prec_ppm"),
            F.expr("(tp * 1000000) div p").cast("long").alias("rec_ppm"),
        )
        .orderBy("threshold_e6")
    )


_PR_ORACLE = f"""
WITH w0(w, b) AS (VALUES
  {_w0_values()}
),
scored AS (
  SELECT CASE WHEN label = 0 THEN 1 ELSE 0 END AS y,
         CAST(round(
           (list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                             w0.w) + w0.b) * 1e6, 0) AS BIGINT) AS score_e6
  FROM embeddings, w0
),
g AS (
  SELECT score_e6 AS s, count(*) AS n, sum(y) AS np
  FROM scored GROUP BY 1
),
cum AS (
  SELECT s,
         sum(n) OVER (ORDER BY s DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS predp,
         sum(np) OVER (ORDER BY s DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
         (SELECT sum(np) FROM g) AS p
  FROM g
)
SELECT CAST(s AS BIGINT) AS threshold_e6,
       CAST(tp AS BIGINT) AS tp,
       CAST(predp - tp AS BIGINT) AS fp,
       CAST(p - tp AS BIGINT) AS fn,
       CAST((tp * 1000000) // predp AS BIGINT) AS prec_ppm,
       CAST((tp * 1000000) // p AS BIGINT) AS rec_ppm
FROM cum ORDER BY 1
"""


@register("ml_pr_curve", oracle=_PR_ORACLE)
def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve of the frozen logreg class-0 margin at
    every distinct threshold — the thresholded companion to
    ml_auc_rank's rank statistic, all-BIGINT."""
    emb = load_table(spark, sf_dir, "embeddings")
    wdf = spark.createDataFrame(
        [LOGREG_WEIGHTS[0]], "class int, w array<double>, b double"
    )
    scored = (
        emb.crossJoin(F.broadcast(wdf))
        .select(
            F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
            F.round(
                (dot(as_double_array("embedding"), F.col("w")) + F.col("b"))
                * E6,
                0,
            )
            .cast("long")
            .alias("score_e6"),
        )
    )
    return pr_curve(scored)


# --------------------------------------------- histogram-bucketed AUC


AUC_BIN_W_E6 = 50_000  # fixed bin width: 0.05 score units at e6 scale


def auc_rank_bucketed(
    scored: DataFrame,
    label_col: str = "y",
    score_col: str = "score_e6",
    bin_w_e6: int = AUC_BIN_W_E6,
) -> DataFrame:
    """AUC via the same BIGINT rank-sum identity, over a FIXED-WIDTH
    score histogram instead of distinct scores (VERDICT r10 item 6).

    ``auc_rank``'s cumulative window runs on the distinct-score table;
    with e6-quantized scores that is bounded, but near-continuous
    scores at 100 TB would grow the single-partition sort without
    limit. Binning first — ``bin = (score - min_score) div w`` (the
    shift makes the operand non-negative, so truncating ``div`` IS
    floor division in both engines) — caps the window input at
    ``(max-min)/w + 1`` rows regardless of corpus size or score
    cardinality. The result is EXACTLY the tie-averaged AUC of the
    binned scores (the identity stays exact per bin-boundary choice;
    binning only coarsens which scores count as ties), a deterministic
    function of the data and ``bin_w_e6`` — identical across engines
    and partitionings. Two aggregate jobs (global min, then the
    histogram) + one bounded window."""
    lo = scored.agg(F.min(score_col).alias("__lo"))
    binned = scored.crossJoin(F.broadcast(lo)).select(
        F.col(label_col),
        F.expr(f"({score_col} - __lo) div {bin_w_e6}").alias("__bin"),
    )
    return auc_rank(binned, label_col=label_col, score_col="__bin")


_AUC_BUCKETED_ORACLE = f"""
WITH w0(w, b) AS (VALUES
  {_w0_values()}
),
scored AS (
  SELECT CASE WHEN label = 0 THEN 1 ELSE 0 END AS y,
         CAST(round(
           (list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                             w0.w) + w0.b) * 1e6, 0) AS BIGINT) AS score_e6
  FROM embeddings, w0
),
lo AS (SELECT min(score_e6) AS lo FROM scored),
binned AS (
  SELECT y, (score_e6 - lo) // {AUC_BIN_W_E6} AS s FROM scored, lo
),
g AS (
  SELECT s, count(*) AS n, sum(y) AS np
  FROM binned GROUP BY 1
),
terms AS (
  SELECT n, np,
         np * (2 * coalesce(sum(n) OVER (
                ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ), 0) + n + 1) AS r2
  FROM g
)
SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       CAST(sum(n) - sum(np) AS BIGINT) AS n_neg,
       CAST((sum(r2) - sum(np) * (sum(np) + 1)) * 1000000
            // nullif(2 * sum(np) * (sum(n) - sum(np)), 0) AS BIGINT)
         AS auc_e6
FROM terms
"""


@register("ml_auc_bucketed", oracle=_AUC_BUCKETED_ORACLE)
def q_auc_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the frozen logreg class-0 margin from a fixed-width
    score histogram — the 100 TB-safe form of ml_auc_rank: the rank-sum
    window input is capped by (score range / bin width), not by score
    cardinality."""
    emb = load_table(spark, sf_dir, "embeddings")
    wdf = spark.createDataFrame(
        [LOGREG_WEIGHTS[0]], "class int, w array<double>, b double"
    )
    scored = (
        emb.crossJoin(F.broadcast(wdf))
        .select(
            F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
            F.round(
                (dot(as_double_array("embedding"), F.col("w")) + F.col("b"))
                * E6,
                0,
            )
            .cast("long")
            .alias("score_e6"),
        )
    )
    return auc_rank_bucketed(scored)


def pr_curve_bucketed(
    scored: DataFrame,
    label_col: str = "y",
    score_col: str = "score_e6",
    bin_w_e6: int = AUC_BIN_W_E6,
) -> DataFrame:
    """PR curve over fixed-width score bins — ``pr_curve``'s 100 TB
    form: thresholds are the bin LOWER EDGES (``lo + ((s-lo) div w)·w``
    — every row in a bin scores >= its edge, so sweeping edges is
    exactly ``pr_curve`` run on the edge-snapped scores), which caps
    both the cumulative window's input AND the emitted curve at
    range/width rows regardless of score cardinality."""
    lo = scored.agg(F.min(score_col).alias("__lo"))
    snapped = scored.crossJoin(F.broadcast(lo)).select(
        F.col(label_col),
        (
            F.col("__lo")
            + F.expr(f"({score_col} - __lo) div {bin_w_e6}") * F.lit(bin_w_e6)
        )
        .cast("long")
        .alias("__edge"),
    )
    return pr_curve(snapped, label_col=label_col, score_col="__edge")


_PR_BUCKETED_ORACLE = f"""
WITH w0(w, b) AS (VALUES
  {_w0_values()}
),
scored AS (
  SELECT CASE WHEN label = 0 THEN 1 ELSE 0 END AS y,
         CAST(round(
           (list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                             w0.w) + w0.b) * 1e6, 0) AS BIGINT) AS score_e6
  FROM embeddings, w0
),
lo AS (SELECT min(score_e6) AS lo FROM scored),
snapped AS (
  SELECT y, lo + ((score_e6 - lo) // {AUC_BIN_W_E6}) * {AUC_BIN_W_E6} AS s
  FROM scored, lo
),
g AS (
  SELECT s, count(*) AS n, sum(y) AS np FROM snapped GROUP BY 1
),
cum AS (
  SELECT s,
         sum(n) OVER (ORDER BY s DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS predp,
         sum(np) OVER (ORDER BY s DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
         (SELECT sum(np) FROM g) AS p
  FROM g
)
SELECT CAST(s AS BIGINT) AS threshold_e6,
       CAST(tp AS BIGINT) AS tp,
       CAST(predp - tp AS BIGINT) AS fp,
       CAST(p - tp AS BIGINT) AS fn,
       CAST((tp * 1000000) // predp AS BIGINT) AS prec_ppm,
       CAST((tp * 1000000) // p AS BIGINT) AS rec_ppm
FROM cum ORDER BY 1
"""


@register("ml_pr_bucketed", oracle=_PR_BUCKETED_ORACLE)
def q_pr_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed PR curve of the frozen logreg class-0 margin — the
    curve stays readable (and the window bounded) at any corpus size:
    one row per occupied fixed-width score bin."""
    emb = load_table(spark, sf_dir, "embeddings")
    wdf = spark.createDataFrame(
        [LOGREG_WEIGHTS[0]], "class int, w array<double>, b double"
    )
    scored = (
        emb.crossJoin(F.broadcast(wdf))
        .select(
            F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
            F.round(
                (dot(as_double_array("embedding"), F.col("w")) + F.col("b"))
                * E6,
                0,
            )
            .cast("long")
            .alias("score_e6"),
        )
    )
    return pr_curve_bucketed(scored)
