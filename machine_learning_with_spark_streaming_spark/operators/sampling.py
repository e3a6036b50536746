"""Deterministic hash-based sampling for training-data curation —
BASELINE.json north-star territory (reproducible corpus sampling and
mixing at 100 TB).

``df.sample()`` draws from a per-partition RNG stream: results change
with partitioning, task retries, and engine version — unacceptable for
reproducible training mixes. Hash-gate sampling decides per KEY
(``hash(key, seed) mod M < rate*M``), so membership is a pure function
of the row key and seed:

- identical across runs, partitionings, engines, and cluster sizes;
- a superset/subset relation holds between rates (rate 0.2 ⊂ rate 0.5)
  — growing a sample never resamples what a smaller rate kept;
- embarrassingly parallel: a filter expression, no shuffle, no state.

Uses the cross-engine md5-derived 60-bit hash (operators/dedup.py:
md5_hash60) so the DuckDB oracle computes the identical sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.operators.dedup import md5_hash60
from machine_learning_with_spark_streaming_spark.registry import register
from machine_learning_with_spark_streaming_spark.schemas import load_table

_BUCKETS = 10_000  # rate resolution 0.01%


def _bucket(key: Column, seed: int) -> Column:
    return md5_hash60(F.concat(key.cast("string"), F.lit(f"#{seed}"))) % _BUCKETS


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep rows whose key hashes into the first ``rate`` fraction of
    buckets. Deterministic; rate resolution 1/10000."""
    return df.filter(_bucket(F.col(key_col), seed) < int(rate * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum hash sampling (the deterministic ``sampleBy``):
    each stratum value gets its own keep-rate — the building block for
    weighted training-data mixes (e.g. upsample low-resource languages,
    downsample boilerplate-heavy strata)."""
    threshold = F.lit(int(default_rate * _BUCKETS))
    for value, rate in rates.items():
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(rate * _BUCKETS))
        ).otherwise(threshold)
    return df.filter(_bucket(F.col(key_col), seed) < threshold)


def mix_corpora(
    sources: dict[str, tuple[DataFrame, float]],
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Weighted training-data mix: deterministically downsample each
    source to its rate, tag provenance, union. Because membership is a
    pure key-hash function, re-running with adjusted rates yields nested
    samples per source — mixes can be re-weighted without churning the
    unchanged sources."""
    parts = [
        hash_sample(df, rate, key_col, seed).withColumn("source", F.lit(name))
        for name, (df, rate) in sources.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_HASH60_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#{seed}'), 1, 15))::BIGINT % {buckets}"

_STRATIFIED_ORACLE = f"""
WITH bucketed AS (
  SELECT doc_id, lang,
         {_HASH60_SQL.format(seed=0, buckets=_BUCKETS)} AS bucket
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
FROM bucketed
WHERE bucket < CASE lang
    WHEN 'en' THEN 2500
    WHEN 'de' THEN 7500
    WHEN 'fr' THEN 7500
    WHEN 'es' THEN 7500
    WHEN 'zh' THEN 10000
    ELSE 0 END
ORDER BY doc_id
"""

MIX_RATES = {"en": 0.25, "de": 0.75, "fr": 0.75, "es": 0.75, "zh": 1.0}


_MIX_ORACLE = f"""
WITH bucketed AS (
  SELECT doc_id,
         {_HASH60_SQL.format(seed=0, buckets=_BUCKETS)} AS bucket
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source FROM (
  SELECT doc_id, 'web' AS source FROM bucketed
  WHERE doc_id % 2 = 0 AND bucket < 3000
  UNION ALL
  SELECT doc_id, 'books' AS source FROM bucketed
  WHERE doc_id % 2 = 1 AND bucket < 9000
)
ORDER BY source, doc_id
"""


@register("sample_weighted_mix", oracle=_MIX_ORACLE)
def q_weighted_mix(spark, sf_dir):
    """Weighted two-corpus training mix (downsample 'web' to 30%, keep
    90% of 'books') with provenance tags — DuckDB reproduces the exact
    membership from the same md5 hash gate."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    mixed = mix_corpora(
        {
            "web": (docs.filter(F.col("doc_id") % 2 == 0), 0.30),
            "books": (docs.filter(F.col("doc_id") % 2 == 1), 0.90),
        }
    )
    return mixed.select("doc_id", "source").orderBy("source", "doc_id")


@register("sample_stratified_hash", oracle=_STRATIFIED_ORACLE)
def q_stratified_sample(spark, sf_dir):
    """Reproducible language-stratified corpus sample (downsample the
    dominant language, keep all low-resource docs) — DuckDB computes
    the byte-identical sample from the same md5 hash gate."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        stratified_hash_sample(docs, MIX_RATES, strata_col="lang")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )
