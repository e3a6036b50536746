"""Hypothesis property tests for the round-11 primitives.

- Prefix-filtered Jaccard == plain inverted-index Jaccard on RANDOM
  corpora (the lossless-pruning theorem exercised beyond the fixed
  duplicated corpus — word pools are tiny so random docs collide hard,
  df ties abound, and the (df, shingle) total-order tiebreak is
  genuinely stressed).
- KMV merge associativity/batching-invariance: any partition of the
  rows into parts, sketched independently and merged, equals the
  direct sketch (the identity the streaming form relies on).
- KMV pair estimates on unsaturated sketches are EXACT set algebra.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(max_examples=5, deadline=None)

_WORDS = ["alpha", "beta", "gamma", "delta", "omega", "zeta"]


@given(
    st.lists(
        st.lists(st.integers(0, 5), min_size=3, max_size=10),
        min_size=2,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_prefix_filter_equals_plain_on_random_corpora(spark, word_idx):
    from machine_learning_with_spark_streaming_spark.operators.dedup import jaccard_pairs
    from machine_learning_with_spark_streaming_spark.operators.ppjoin import (
        prefix_filtered_jaccard_pairs,
    )

    rows = [
        (i, " ".join(_WORDS[w] for w in ws)) for i, ws in enumerate(word_idx)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plain = sorted(tuple(r) for r in jaccard_pairs(df).collect())
    pref = sorted(
        tuple(r) for r in prefix_filtered_jaccard_pairs(df).collect()
    )
    assert pref == plain


@given(
    st.lists(st.tuples(st.integers(0, 1), st.integers(0, 200)),
             min_size=1, max_size=60),
    st.lists(st.integers(0, 2), min_size=1, max_size=60),
)
@settings(**_SETTINGS)
def test_kmv_partition_merge_equals_direct(spark, rows, parts):
    from machine_learning_with_spark_streaming_spark.operators.kmv import kmv_merge, kmv_sketch

    data = [
        (str(k), uid, parts[i % len(parts)]) for i, (k, uid) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "key string, uid long, part int")
    direct = sorted(
        tuple(r) for r in kmv_sketch(df, "key", "uid", k=8).collect()
    )
    partials = kmv_sketch(df, ["key", "part"], "uid", k=8)
    merged = sorted(
        tuple(r) for r in kmv_merge(partials, ["key"], k=8).collect()
    )
    assert merged == direct


@given(
    st.sets(st.integers(0, 40), min_size=1, max_size=30),
    st.sets(st.integers(0, 40), min_size=1, max_size=30),
)
@settings(**_SETTINGS)
def test_kmv_unsaturated_pair_estimates_are_exact(spark, sa, sb):
    from machine_learning_with_spark_streaming_spark.operators.kmv import (
        kmv_pair_estimates,
        kmv_sketch,
    )

    rows = [("a", v) for v in sa] + [("b", v) for v in sb]
    df = spark.createDataFrame(rows, "key string, uid long")
    out = kmv_pair_estimates(kmv_sketch(df, "key", "uid", k=64)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["est_a"], r["est_b"]) == (len(sa), len(sb))
    assert r["est_union"] == len(sa | sb)
    assert r["est_common"] == len(sa & sb)
