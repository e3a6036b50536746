"""Frozen decision-tree artifact (tools/freeze_tree.py): node table
(node_id, feature, threshold, left_id, right_id, prediction) of a
maxDepth-4 MLlib tree on the sf0.01 embeddings (seed 42, train split
vec_id %% 5 != 0). feature == -1 marks a leaf; routing is
``x[feature] <= threshold -> left`` (MLlib CONTINUOUS-split semantics).
Compiled to one nested CASE expression in BOTH engines by
operators/ml tree scoring — in-database model serving."""

from __future__ import annotations

# (node_id, feature, threshold, left_id, right_id, prediction)
TREE_NODES: list[tuple] = [
    (0, 28, 0.0825311578810215, 1, 16, None),
    (1, 34, -0.1345646157860756, 2, 9, None),
    (2, 10, -0.006242172559723258, 3, 6, None),
    (3, 21, -0.0033067463664337993, 4, 5, None),
    (4, -1, None, None, None, 1),
    (5, -1, None, None, None, 8),
    (6, 8, -0.11399649456143379, 7, 8, None),
    (7, -1, None, None, None, 7),
    (8, -1, None, None, None, 3),
    (9, 11, 0.03491746075451374, 10, 13, None),
    (10, 42, -0.1446390524506569, 11, 12, None),
    (11, -1, None, None, None, 2),
    (12, -1, None, None, None, 4),
    (13, 50, -0.06967854127287865, 14, 15, None),
    (14, -1, None, None, None, 3),
    (15, -1, None, None, None, 2),
    (16, 14, 0.17094429582357407, 17, 24, None),
    (17, 21, -0.15547578036785126, 18, 21, None),
    (18, 26, -0.058989377692341805, 19, 20, None),
    (19, -1, None, None, None, 2),
    (20, -1, None, None, None, 6),
    (21, 8, 0.10429411754012108, 22, 23, None),
    (22, -1, None, None, None, 1),
    (23, -1, None, None, None, 6),
    (24, 8, 0.06121686100959778, 25, 26, None),
    (25, -1, None, None, None, 9),
    (26, 1, 0.06894154101610184, 27, 28, None),
    (27, -1, None, None, None, 0),
    (28, -1, None, None, None, 6),
]
