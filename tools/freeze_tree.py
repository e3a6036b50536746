#!/usr/bin/env python
"""Freeze a small decision-tree classifier as a literal node table for
model-to-SQL compilation (``ml_tree_score``).

Fit once (MLlib DecisionTreeClassifier, maxDepth=4, seed 42, train split
vec_id % 5 != 0 — the ml_artifacts logreg protocol) on the sf0.01
``embeddings`` table, then export the tree as a list of nodes:

    (node_id, feature, threshold, left_id, right_id, prediction)

feature = -1 marks a leaf (prediction holds the class). Internal-node
routing is MLlib's ``x <= threshold -> left``. Thresholds are kept at
full repr precision: the compiled predicate must split exactly where
the trained model does, and both engines compare the same doubles.

Written to
``machine_learning_with_spark_streaming_spark/functions/tree_artifacts.py``;
the query compiles the committed nodes into one nested CASE expression
per engine — in-database model serving, the same freeze-then-mirror
contract as the logreg margins.

Run manually when the artifact needs refreshing:
    python tools/freeze_tree.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(
    REPO, "machine_learning_with_spark_streaming_spark", "functions",
    "tree_artifacts.py",
)

HEADER = '''"""Frozen decision-tree artifact (tools/freeze_tree.py): node table
(node_id, feature, threshold, left_id, right_id, prediction) of a
maxDepth-4 MLlib tree on the sf0.01 embeddings (seed 42, train split
vec_id %% 5 != 0). feature == -1 marks a leaf; routing is
``x[feature] <= threshold -> left`` (MLlib CONTINUOUS-split semantics).
Compiled to one nested CASE expression in BOTH engines by
operators/ml tree scoring — in-database model serving."""

from __future__ import annotations

'''


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.ml.classification import DecisionTreeClassifier
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from machine_learning_with_spark_streaming_spark.functions.vectors import as_double_array
    from machine_learning_with_spark_streaming_spark.schemas import load_table
    from machine_learning_with_spark_streaming_spark.session import get_session

    spark = get_session("freeze-tree", shuffle_partitions=8)
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "features", array_to_vector(as_double_array("embedding"))
    )
    train = emb.filter(F.col("vec_id") % 5 != 0).withColumn(
        "label", F.col("label").cast("double")
    )
    model = DecisionTreeClassifier(
        maxDepth=4, seed=42, featuresCol="features", labelCol="label"
    ).fit(train)

    # walk the JVM tree into a flat node list
    nodes: list[tuple[int, int, float | None, int | None, int | None, int | None]] = []

    def walk(jnode) -> int:
        nid = len(nodes)
        nodes.append(None)  # reserve slot
        cls = jnode.getClass().getSimpleName()
        if cls == "LeafNode":
            nodes[nid] = (nid, -1, None, None, None, int(jnode.prediction()))
        else:
            split = jnode.split()
            feat = int(split.featureIndex())
            thr = float(split.threshold())
            left = walk(jnode.leftChild())
            right = walk(jnode.rightChild())
            nodes[nid] = (nid, feat, thr, left, right, None)
        return nid

    walk(model._call_java("rootNode"))

    with open(OUT, "w") as f:
        f.write(HEADER)
        f.write("# (node_id, feature, threshold, left_id, right_id, prediction)\n")
        f.write("TREE_NODES: list[tuple] = [\n")
        for n in nodes:
            f.write(f"    {n!r},\n")
        f.write("]\n")
    n_leaves = sum(1 for n in nodes if n[1] == -1)
    print(f"wrote {OUT}: {len(nodes)} nodes, {n_leaves} leaves, depth<=4")


if __name__ == "__main__":
    main()
