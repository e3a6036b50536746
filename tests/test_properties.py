"""Hypothesis property tests for the cleaning/date toolkit.

Each example set is batched into ONE DataFrame so a property run costs a
handful of Spark jobs, not hundreds.
"""

import datetime as dt
import math

from hypothesis import given, settings, strategies as st

from machine_learning_with_spark_streaming_spark.functions.cleaning import clean_numeric
from machine_learning_with_spark_streaming_spark.functions.dates import (
    fiscal_month_sort,
    fiscal_year,
    parse_date_multi,
    week_floor_monday,
)

_SETTINGS = dict(max_examples=5, deadline=None)


def _dirty_format(value: float, style: int) -> str:
    """Deterministically wrap a number in one of the reference's dirty
    locale styles (myConversionsClass.py:64-95)."""
    mag = abs(value)
    s = f"{mag:,.4f}" if style % 2 == 0 else f"{mag:.4f}"
    if style % 3 == 0:
        s = f"$ {s}"
    if value < 0:
        s = f"({s})" if style % 2 == 1 else f"-{s}"
    return f" {s} "


@given(
    st.lists(
        st.tuples(
            st.floats(
                min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
            ),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=20,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_clean_numeric_recovers_value(spark, cases):
    rows = [
        (i, _dirty_format(round(v, 4), style)) for i, (v, style) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "i long, raw string")
    got = {
        r.i: r.v
        for r in df.select("i", clean_numeric("raw").alias("v")).collect()
    }
    for i, (v, _) in enumerate(cases):
        assert got[i] is not None
        assert math.isclose(got[i], round(v, 4), rel_tol=0, abs_tol=5e-5), (
            rows[i],
            got[i],
        )


@given(st.lists(st.text(alphabet="abcXYZ@#!? ", max_size=12), min_size=10, max_size=30))
@settings(**_SETTINGS)
def test_clean_numeric_garbage_to_default(spark, garbage):
    rows = [(i, g) for i, g in enumerate(garbage)]
    df = spark.createDataFrame(rows, "i long, raw string")
    out = df.select("i", "raw", clean_numeric("raw", default=0.0).alias("v")).collect()
    for r in out:
        # either the garbage accidentally forms a number, or it's 0.0
        stripped = (r.raw or "").replace(",", "").replace("$", "").replace(" ", "")
        try:
            float(stripped)
        except ValueError:
            assert r.v == 0.0, r


@given(
    st.lists(
        st.tuples(
            st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2030, 12, 1)),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=20,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_parse_date_multi_roundtrip(spark, cases):
    fmts = ["%b-%y", "%b %Y", "%Y%m", "%m/%Y"]
    rows = [
        (i, d.replace(day=1).strftime(fmts[style]))
        for i, (d, style) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "i long, raw string")
    got = {
        r.i: r.d
        for r in df.select("i", parse_date_multi("raw").alias("d")).collect()
    }
    for i, (d, style) in enumerate(cases):
        expect = d.replace(day=1)
        if style == 0 and not (2000 <= expect.year <= 2068):
            # two-digit years: Spark's 'yy' pivots 69-99 to 20xx while
            # Python's %y pivots to 19xx — only [2000, 2068] agree
            continue
        assert got[i] == expect, (rows[i], got[i], expect)


@given(
    st.lists(
        st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2030, 12, 28)),
        min_size=20,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_calendar_invariants(spark, dates):
    rows = [(i, d) for i, d in enumerate(dates)]
    df = spark.createDataFrame(rows, "i long, d date")
    out = df.select(
        "i",
        "d",
        fiscal_year("d").alias("fy"),
        fiscal_month_sort("d").alias("fms"),
        week_floor_monday("d").alias("wk"),
    ).collect()
    for r in out:
        d = r.d
        assert r.fy == (d.year + 1 if d.month >= 10 else d.year)
        assert 1 <= r.fms <= 12
        assert ((d.month - 10) % 12) + 1 == r.fms
        assert r.wk.weekday() == 0 and 0 <= (d - r.wk).days < 7


def test_human_format_branches(spark):
    from machine_learning_with_spark_streaming_spark.functions.formatting import (
        fmt_int,
        fmt_pct,
        fmt_val,
        human_format,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, 2.5e9), (2, -1.25e6), (3, 1234.0), (4, 42.7), (5, 0.1230),
        (6, 0.0), (7, None), (8, -0.5),
    ]
    df = spark.createDataFrame(rows, "id long, x double")
    got = {r.id: r.s for r in df.select("id", human_format("x").alias("s")).collect()}
    assert got[1] == "2.50 B"
    assert got[2] == "-1.25 M"
    assert got[3] == "1.23 K"
    assert got[4] == "43"
    assert got[5] == "0.123"
    assert got[6] == "0"
    assert got[7] == ""
    assert got[8] == "-0.5"
    one = df.filter(F.col("id") == 3).select(
        fmt_int("x").alias("i"), fmt_val("x").alias("v"), fmt_pct(F.lit(0.1234)).alias("p")
    ).first()
    assert one.i == "1,234" and one.v == "1,234" and one.p == "12.34%"


# ------------------------------------------------ as-of join vs naive SQL

@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 999)),
        min_size=0,
        max_size=25,
    ),
    st.booleans(),
)
@settings(**_SETTINGS)
def test_asof_join_matches_naive(spark, lrows, rrows, strict):
    """asof_join == argmax-per-left-row of the naive range join, for any
    keyed timeline (right deduped per (key, t) keeping max value)."""
    from machine_learning_with_spark_streaming_spark.operators.joins import asof_join

    # dedup right per (key, t): keep max v (mirrors the documented contract)
    rmap = {}
    for k, t, v in rrows:
        rmap[(k, t)] = max(rmap.get((k, t), -1), v)
    rded = [(k, t, v) for (k, t), v in rmap.items()]

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)], "lid long, k long, t long"
    )
    right = spark.createDataFrame(rded or [(99, -1, -1)], "k long, t long, v long")
    if not rded:
        right = right.filter("k < -1")  # empty frame with schema

    got = {
        r["lid"]: r["mv"]
        for r in asof_join(
            left, right, ["k"], "t", "t", {"v": "mv"}, strict=strict
        ).collect()
    }
    for i, (k, t) in enumerate(lrows):
        cand = [
            v for (kk, tt, v) in rded if kk == k and (tt < t if strict else tt <= t)
        ]
        best = max(
            ((tt, v) for (kk, tt, v) in rded
             if kk == k and (tt < t if strict else tt <= t)),
            default=None,
        )
        assert got[i] == (best[1] if best else None), (i, k, t, cand)


# -------------------------------------- connected components vs union-find

@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)), min_size=0, max_size=30
    )
)
@settings(**_SETTINGS)
def test_connected_components_property(spark, raw_edges):
    from machine_learning_with_spark_streaming_spark.operators.graph import (
        connected_components,
    )

    edges = [(a, b) for a, b in raw_edges if a != b]
    nodes = sorted({n for e in edges for n in e} | {0, 20})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), set()).add(n)
    want = {n: min(m) for m in comp.values() for n in m}

    e = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
    if not edges:
        e = e.filter("id_a < 0")
    n = spark.createDataFrame([(x,) for x in nodes], "doc_id long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(e, nodes=n).collect()
    }
    assert got == want


# ------------------------- round-3 curation ops: property coverage


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-100.0,
                max_value=100.0,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=2,
            max_size=16,
        ),
        min_size=5,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_quantize_int8_reconstruction_property(spark, vecs):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.similarity import quantize_int8

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = quantize_int8(df).collect()
    assert len(out) == len(rows)
    for r in out:
        codes = list(r["codes"])
        assert all(-127 <= c <= 127 for c in codes)
        orig = dict(rows)[r["vec_id"]]
        # dequantization error bounded by scale/2 + float slack per element
        for c, x in zip(codes, orig):
            assert abs(c * r["scale"] - x) <= r["scale"] / 2 + 1e-9


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=10,
             max_size=50, unique=True),
    st.integers(min_value=2, max_value=12),
)
@settings(**_SETTINGS)
def test_shard_and_split_partition_the_keyspace(spark, keys, n_shards):
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.sampling import (
        assign_split,
        shard_assignment,
    )

    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    sh = shard_assignment(df, n_shards).collect()
    # total function: every key gets exactly one shard in range
    assert len(sh) == len(keys)
    assert all(0 <= r["shard"] < n_shards for r in sh)
    sp = assign_split(df).collect()
    assert len(sp) == len(keys)
    assert all(r["split"] in ("train", "val", "test") for r in sp)


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefg", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=1000),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_cms_never_undercounts_property(spark, raw):
    """CMS invariant on arbitrary token frequency tables: the grid
    estimate is >= the exact count for EVERY token (collisions only
    inflate), and the merge of any 2-way split equals the full grid."""
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.operators.sketch import cms_estimate, cms_sketch

    counts = {}
    for t, c in raw:
        counts[t] = counts.get(t, 0) + c
    rows = sorted(counts.items())
    df = spark.createDataFrame(rows, "token string, cnt long")
    sketch = cms_sketch(df)
    est = {
        r.token: r.est
        for r in cms_estimate(sketch, df.select("token")).collect()
    }
    assert set(est) == set(counts)
    assert all(est[t] >= counts[t] for t in counts)
    a = df.filter(F.length("token") <= 2)
    b = df.filter(F.length("token") > 2)
    merged = (
        cms_sketch(a)
        .unionByName(cms_sketch(b))
        .groupBy("r", "bucket")
        .agg(F.sum("value").cast("long").alias("value"))
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in sketch.collect()
    }


@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1.0,
                max_value=1.0,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=64,
            max_size=64,
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_pq_encode_matches_brute_force_property(spark, vecs):
    """The distributed PQ encoder must agree with a literal Python
    replay of argmin-per-subspace over the frozen codebook (ties to the
    lower code) for arbitrary float vectors."""
    from machine_learning_with_spark_streaming_spark.functions.pq_artifacts import (
        PQ_CODEBOOK,
        PQ_M,
        PQ_SUBDIM,
    )
    from machine_learning_with_spark_streaming_spark.operators.pq import pq_encode

    import numpy as np

    rows = [(i, [float(np.float32(x)) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.id, r.m): r.code for r in pq_encode(df).collect()}
    for i, v in rows:
        for m in range(PQ_M):
            s = v[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
            dists = [
                sum((a - b) * (a - b) for a, b in zip(s, c))
                for c in PQ_CODEBOOK[m]
            ]
            best = min(range(len(dists)), key=lambda k: (dists[k], k))
            assert got[(i, m)] == best, (i, m)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-10**9, max_value=10**9),
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
            st.text(alphabet="abc XYZ", max_size=8),
        ),
        min_size=1,
        max_size=10,
    ),
    st.permutations(["K", "AMOUNT", "NOTE"]),
)
@settings(**_SETTINGS)
def test_coerce_to_schema_roundtrip_property(spark, rows, order):
    """Any column order / name case of a stringly-typed extract must
    coerce to the target schema with values preserved exactly (ints and
    strings) or to double parsing of the emitted repr (floats)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from machine_learning_with_spark_streaming_spark.sources.jdbc import coerce_to_schema

    df = spark.createDataFrame(rows, "k long, amount double, note string")
    drifted = df.select(
        F.col("k").cast("string").alias("K"),
        F.col("amount").cast("string").alias("AMOUNT"),
        F.col("note").alias("NOTE"),
        F.lit("x").alias("extra"),
    ).select(*order, "extra")
    target = StructType(
        [
            StructField("k", LongType()),
            StructField("amount", DoubleType()),
            StructField("note", StringType()),
        ]
    )
    out = coerce_to_schema(drifted, target)
    assert out.columns == ["k", "amount", "note"]
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in df.collect())
    assert [g[0] for g in got] == [w[0] for w in want]
    assert [g[2] for g in got] == [w[2] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-9 * max(1.0, abs(w[1]))
