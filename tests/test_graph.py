"""Connected components: agree with a driver-side union-find on random
graphs, converge fast on adversarial chains, and respect isolated nodes."""

from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.operators.graph import (
    canonical_docs,
    connected_components,
)


def _union_find(edges, nodes):
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
    # components keyed by min member
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), set()).add(n)
    return {n: min(members) for members in comp.values() for n in members}


def _check(spark, edges, nodes):
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    n = spark.createDataFrame([(x,) for x in nodes], "doc_id long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(e, nodes=n).collect()
    }
    assert got == _union_find(edges, nodes)


def test_cc_matches_union_find_random(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(60))
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(40)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges, nodes)


def test_cc_long_chain_converges(spark):
    # path graph 0-1-2-...-40: diameter 40 >> default max_iter, so this
    # passes only because pointer jumping contracts chains exponentially
    edges = [(i, i + 1) for i in range(40)]
    _check(spark, edges, list(range(41)))


def test_cc_isolated_nodes_are_singletons(spark):
    e = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    n = spark.createDataFrame([(1,), (2,), (9,)], "doc_id long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(e, nodes=n).collect()
    }
    assert got == {1: 1, 2: 1, 9: 9}


def test_canonical_docs_keeps_min_per_cluster(spark):
    corpus = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (9, "c")], "doc_id long, text string"
    )
    cc = connected_components(
        spark.createDataFrame([(1, 2)], "id_a long, id_b long"), nodes=corpus
    )
    kept = sorted(r["doc_id"] for r in canonical_docs(corpus, cc).collect())
    assert kept == [1, 3, 9]


def test_canonical_keeper_elects_longest_then_min_id(spark):
    from machine_learning_with_spark_streaming_spark.operators.graph import canonical_keeper_report

    corpus = spark.createDataFrame(
        [
            (1, "short"),
            (2, "short plus extra"),   # same cluster as 1, longer -> keeper
            (3, "tie"),
            (4, "tie"),                # same cluster as 3, equal -> min id 3
            (9, "lonely"),             # singleton keeps itself
        ],
        "doc_id long, text string",
    )
    cc = connected_components(
        spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long"),
        nodes=corpus,
    )
    got = {
        r["component"]: (r["keeper_id"], r["cluster_size"], r["keeper_score"])
        for r in canonical_keeper_report(corpus, cc, F.length("text")).collect()
    }
    assert got == {1: (2, 2, 16), 3: (3, 2, 3), 9: (9, 1, 6)}
