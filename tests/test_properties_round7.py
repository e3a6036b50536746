"""Hypothesis property tests for the round-7 operators.

Each example set is batched into ONE DataFrame so a property run costs a
handful of Spark jobs, not hundreds.
"""

from __future__ import annotations

import itertools
import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(max_examples=5, deadline=None)


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_triangle_count_matches_bruteforce(spark, raw):
    from machine_learning_with_spark_streaming_spark.operators.graph import triangle_count

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    if not edges:
        return
    eset = set(edges)
    nodes = sorted({v for e in edges for v in e})
    expected = sum(
        1
        for u, v, w in itertools.combinations(nodes, 3)
        if (u, v) in eset and (v, w) in eset and (u, w) in eset
    )
    df = spark.createDataFrame(edges, "a long, b long")
    r = triangle_count(df).collect()[0]
    assert r["n_triangles"] == expected
    assert r["n_edges"] == len(edges) and r["n_nodes"] == len(nodes)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3), st.integers(1, 10**6)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_share_of_total_is_partition_of_unity(spark, rows):
    from machine_learning_with_spark_streaming_spark.operators.aggregates import (
        share_of_total,
    )

    df = spark.createDataFrame(
        [(f"g{g}", f"s{s}", c) for g, s, c in rows], "g string, s string, c long"
    )
    got = share_of_total(df, "g", "s", F.col("c")).collect()
    # grand-total shares sum to 1 (within 6-dp rounding of each term)
    tot = sum(r["share_of_total"] for r in got)
    assert math.isclose(tot, 1.0, abs_tol=len(got) * 1e-6)
    # per-group shares sum to 1 within each group
    for gname in {r["grp"] for r in got}:
        gs = [r["share_of_group"] for r in got if r["grp"] == gname]
        assert math.isclose(sum(gs), 1.0, abs_tol=len(gs) * 1e-6)
    # cents are conserved exactly
    assert sum(r["cents"] for r in got) == sum(c for _, _, c in rows)


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(1, 28)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_time_gap_report_covers_exactly_the_missing_days(spark, raw):
    import datetime as dt

    from machine_learning_with_spark_streaming_spark.operators.validation import (
        time_gap_report,
    )

    df = spark.createDataFrame(
        [(k, dt.datetime(2024, 5, d, 9)) for k, d in raw],
        "k long, ts timestamp",
    )
    gaps = time_gap_report(df, "k", "ts").collect()
    by_key: dict[int, set[int]] = {}
    for k, d in raw:
        by_key.setdefault(k, set()).add(d)
    # reported gap days == exactly the in-range days with no observation
    reported: dict[int, set[int]] = {}
    for r in gaps:
        days = set(
            range(r["gap_start"].day, r["gap_end"].day + 1)
        )
        assert r["n_missing_days"] == len(days)
        reported.setdefault(r["k"], set()).update(days)
    for k, present in by_key.items():
        expected = {
            d
            for d in range(min(present), max(present) + 1)
            if d not in present
        }
        assert reported.get(k, set()) == expected


@given(st.lists(st.integers(0, 2**32 - 1), min_size=1, max_size=50))
@settings(**_SETTINGS)
def test_minhash_affine_family_bounds_and_determinism(spark, hashes):
    """Every affine map stays in [0, P); equal base hashes map equally
    (the invariant the estimator's agreement counting rests on)."""
    from machine_learning_with_spark_streaming_spark.operators.dedup import (
        CAL_NUM_HASHES,
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
    )

    for h in hashes:
        for i in range(CAL_NUM_HASHES):
            v = (MINHASH_A[i] * h + MINHASH_B[i]) % MINHASH_P
            assert 0 <= v < MINHASH_P
            assert MINHASH_A[i] * h + MINHASH_B[i] < 2**63  # BIGINT-safe
    # distinct maps: no two family members identical on a probe set
    probes = hashes[:8]
    sigs = {
        tuple((MINHASH_A[i] * h + MINHASH_B[i]) % MINHASH_P for h in probes)
        for i in range(CAL_NUM_HASHES)
    }
    if len(probes) >= 2:
        assert len(sigs) == CAL_NUM_HASHES
