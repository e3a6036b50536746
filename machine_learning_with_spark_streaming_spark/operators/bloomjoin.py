"""Bloom-style semi-join reduction: prune the fact side of a big join
with a bounded broadcast *key-fingerprint* table before the shuffle.

The scale problem this models: fact ⋈ dim where the dim side is far too
large to broadcast (so the join is sort-merge, shuffling the full fact
table) but only a small fraction of fact rows actually match. Spark's
AQE can inject a runtime bloom filter for some shapes
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator is
the explicit, planner-independent form:

1. hash every (filtered-)dim key into ``m`` buckets —
   ``pmod(xxhash64(key), m)`` — and keep the DISTINCT bucket ids.
   The resulting bit table is **at most m rows regardless of dim
   cardinality** (the bloom bitmap, stored relationally so it stays a
   first-class broadcastable DataFrame);
2. broadcast left-semi join the fact on its key's bucket id — a
   map-side filter that drops most non-matching fact rows *before*
   they are shuffled (false positives possible, false negatives not —
   exactly a 1-hash bloom filter);
3. run the exact join on the survivors. Correctness never depends on
   the filter: step 3 re-checks equality, so the composed result is
   IDENTICAL to the plain join (which is what the DuckDB oracle runs).

Shuffle math at 100 TB: with dim selectivity s and false-positive rate
~(distinct bits)/m, the fact bytes entering the sort-merge exchange
shrink to ~(s + fp) of the unfiltered plan for the cost of one
broadcast ≤ m longs. The registered demo pins the final join to
sort-merge (``hint("merge")``) — modeling the dim-too-big-to-broadcast
case — and the test asserts the plan shape: BroadcastHashJoin LeftSemi
(the bloom probe) feeding a SortMergeJoin (the exact join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table

# Sizing rule: occupancy = 1 - exp(-keys/m), and the false-positive
# rate of the 1-hash filter IS its occupancy — so pick m ≈ 16-32x the
# expected distinct dim keys for a <6% fp rate. 65536 bits = a 512 KB
# broadcast of longs (relational form), far under any broadcast limit;
# dims with >~1M distinct keys should raise m proportionally (the table
# stays ≤ m rows) or move to Spark's multi-hash BloomFilter.
DEFAULT_BITS = 65536


def bloom_bits(dim: DataFrame, key: str, m: int = DEFAULT_BITS) -> DataFrame:
    """The dim side's occupied bucket ids — the relational bloom bitmap
    (≤ m rows; one BIGINT column ``__bit``)."""
    return (
        dim.select(F.pmod(F.xxhash64(F.col(key)), F.lit(m)).alias("__bit"))
        .distinct()
    )


def bloom_prune(fact: DataFrame, bits: DataFrame, key: str, m: int = DEFAULT_BITS) -> DataFrame:
    """Map-side fact filter: keep rows whose key hashes into an occupied
    bucket. Never drops a matching row (same hash ⇒ same bucket)."""
    probe = fact.withColumn("__bit", F.pmod(F.xxhash64(F.col(key)), F.lit(m)))
    return probe.join(F.broadcast(bits), "__bit", "left_semi").drop("__bit")


def bloom_prejoin(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = DEFAULT_BITS,
    merge_hint: bool = True,
) -> DataFrame:
    """fact ⋈ dim with the bloom pre-filter; result identical to the
    plain inner join. ``merge_hint`` pins sort-merge on the exact join
    (the at-scale shape this operator exists for)."""
    pruned = bloom_prune(fact, bloom_bits(dim, dim_key, m), fact_key, m)
    right = dim.hint("merge") if merge_hint else dim
    return pruned.join(right, pruned[fact_key] == right[dim_key])


_BLOOM_ORACLE = """
SELECT o.o_orderpriority,
       CAST(date_trunc('month', o.o_orderdate) AS DATE) AS order_month,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("j17_bloom_prejoin", oracle=_BLOOM_ORACLE)
def q_bloom_prejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urgent-order revenue by month through the bloom-pruned join:
    lineitem rows are pre-filtered by the urgent orders' key fingerprint
    (broadcast ≤8192 longs) before the sort-merge join shuffles them.
    Revenue is cent-integer (the engine's cross-engine money contract)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderpriority", "o_orderdate")
    joined = bloom_prejoin(li, urgent, "l_orderkey", "o_orderkey")
    rev_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        joined.groupBy(
            "o_orderpriority",
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(rev_c).alias("revenue_c"),
        )
        .orderBy("o_orderpriority", "order_month")
    )
