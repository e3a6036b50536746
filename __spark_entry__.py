"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001. ``queries()`` maps one
name per implemented operator (SURVEY.md §2) to a ``(spark, sf_dir) ->
DataFrame`` callable; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL
for each (omitted only for genuinely non-SQL-expressible ops, which get the
driver's weaker rows-only check).

Query implementations live in ``machine_learning_with_spark_streaming_spark`` and self-register via
``machine_learning_with_spark_streaming_spark.registry``.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from machine_learning_with_spark_streaming_spark import flagship
from machine_learning_with_spark_streaming_spark.registry import collect

QueryFn = Callable[[SparkSession, str], DataFrame]

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship.demand_rollup(spark, "/root/testdata/sf0.001")


def _last_certified_round() -> dict[str, int]:
    """Latest round in which each query got a usable driver CORRECTNESS row.

    The driver records at most 50 entries per round, in ``queries()``
    iteration order. With >50 registered queries a fixed order would leave
    the tail permanently uncertified, so we rotate: order queries
    never-certified-first, then least-recently-certified. Reading the
    driver's own ``CORRECTNESS_r*.json`` files makes the rotation
    self-maintaining across rounds.
    """
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                last[name] = max(last.get(name, 0), rnd)
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                # Rows-only check: counts only while the query still has no
                # oracle — a query that later gains one must re-certify.
                last.setdefault("rows_only:" + name, 0)
                last["rows_only:" + name] = max(last["rows_only:" + name], rnd)
    return last


# Certifications that predate a semantics change are stale: the green row
# was recorded for output the code no longer produces. A name listed here
# sorts as never-certified until a round AFTER the listed one re-certifies
# it (self-healing — the entry becomes a no-op once that row lands).
_STALE_CERTS: dict[str, int] = {
    # r4 rewrote length_bucketed_batches (global-sort ntile -> broadcast
    # percentile boundaries; impl AND oracle); newest green row is r3.
    "sample_length_batches": 4,
    # r6 changed the bm25 pool cut to key on the 6-dp rounded score
    # (Spark impl AND both oracles) and recast the PCA top-k oracle's
    # distance arithmetic to HUGEINT; newest green rows are r5.
    "text_bm25_topk": 5,
    "pipeline_hybrid_retrieve": 5,
    "sim_pca_topk": 5,
    # r7 enabled the stop-shingle cut in the registered source-overlap
    # query (impl AND oracle — r6 judge item 2); pre-r7 green rows were
    # recorded for the uncut matrix.
    "dedup_source_overlap": 6,
    # r8 made psi_drift score ALL 16 bins (full-grid left join, impl AND
    # oracle — r7 ADVICE medium item): empty bins now contribute their
    # Laplace-smoothed term, so the bin rows and the bin=-1 total both
    # changed wherever a bin was empty (2 bins at sf0.01). The r7 green
    # rows were recorded for the observed-bins-only statistic.
    "v20_psi_drift": 7,
    "pipeline_drift_monitor": 7,
    # r9 rebuilt triangle counting compact-forward (same result, new
    # plan) and made v13's approx oracle + a20's null handling
    # engine-symmetric; newest green rows are r8 — re-certify on the
    # new shapes.
    "graph_triangle_count": 8,
    "v13_mad_outliers_approx": 8,
    "a20_weighted_quantiles": 8,
    # r9 rewrote IVF cell assignment (crossJoin+window -> Arrow/numpy
    # argmax; bit-identical cosines by dimension-order accumulation,
    # verified green at sf0.01) — re-certify every consumer on the new
    # plan anyway, per the triangle-count precedent.
    "sim_ivfpq_topk": 8,
    # r10 rebalanced semdedup's assignment before the persist (repartition
    # only — values unchanged, plan changed; fixed the r9 1.5x regression:
    # the BHJ pair join had been inheriting the scan's 1-2 partitions).
    "dedup_semantic_k32": 9,
    # r10 replaced the IVF exact-rescore per-candidate zip_with/aggregate
    # fold with the Arrow exact_rescore stage (bit-identical by
    # dimension-order accumulation; candidate norms precomputed at
    # assignment). Values unchanged, plans changed — re-certify every
    # consumer of ivf_topk_pretrained.
    "sim_topk_ivf": 9,
    "sim_ann_recall": 9,
    "s11_ivf_serving_stream": 9,
    # r10 ADVICE fixes: cell-stats total derived from the counts agg
    # (one corpus scan) and outlier ordering pinned NULLS LAST in both
    # engines — values unchanged on certified data, plans changed.
    "sim_ivf_cell_stats": 9,
    "emb_centroid_outliers": 9,
    # r10 routed topk_cosine's pair scoring through the Arrow
    # exact_rescore stage (bit-identical cosines; the last interpreted
    # zip_with/aggregate hot loop) — re-certify its registered
    # consumers on the new plan.
    "sim_topk_cosine": 9,
    "sim_rag_retrieve": 9,
    # r11 removed the global row_number staging windows (VERDICT r10
    # item 5): cusum monitor days now batch via a driver-built broadcast
    # day map, heavy hitters via per-row pmod round-robin. Values proven
    # unchanged (monitor: identical day->batch mapping; HH: MG+exact
    # recount is split-invariant) but plans changed — re-certify.
    # s11_transitions_stream also changed (percentile-boundary split)
    # but has never been driver-certified, so it already sorts first.
    "s11_cusum_monitor_stream": 10,
    "s11_heavy_hitters_stream": 10,
    # r11 merge-hinted the exact-verify joins in dedup.py (jaccard /
    # minhash-LSH / containment): the auto-chosen BuildRight broadcast
    # of the persisted shingle table is the 64x-docs OOM class found in
    # pipeline_curation_v5 (see operators/ppjoin.py). Values unchanged,
    # plans changed — re-certify every registered consumer.
    "dedup_ngram_jaccard": 10,
    "dedup_minhash_lsh": 10,
    "dedup_containment": 10,
    "dedup_minhash_calibration": 10,
    "dedup_connected_components": 10,
    "dedup_canonical_keeper": 10,
    "dedup_cluster_stats": 10,
}


def queries() -> dict[str, QueryFn]:
    q: dict[str, QueryFn] = {
        "flagship_demand_rollup": flagship.demand_rollup,
    }
    for name, rq in collect().items():
        q[name] = rq.fn
    last = _last_certified_round()
    with_oracle = set(oracle_sql())

    def cert_round(name: str) -> int:
        rnd = last.get(name, 0)
        if name not in with_oracle:
            rnd = max(rnd, last.get("rows_only:" + name, 0))
        if rnd <= _STALE_CERTS.get(name, 0):
            rnd = 0
        return rnd

    # Never-certified first (stable registration order within a group),
    # then ascending by the round they were last certified in.
    names = sorted(q, key=cert_round)
    return {n: q[n] for n in names}


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {
        "flagship_demand_rollup": flagship.DEMAND_ROLLUP_ORACLE,
    }
    for name, rq in collect().items():
        if rq.oracle is not None:
            o[name] = rq.oracle
    return o
