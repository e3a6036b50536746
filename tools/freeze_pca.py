#!/usr/bin/env python
"""Freeze the PCA artifact for emb_pca_project: the embedding mean and
the top-4 principal axes of the sf0.01 ``embeddings`` table, computed
once with numpy and committed as 6-dp literals
(functions/pca_artifacts.py) — the same freeze-then-mirror recipe as
the PQ codebook and IVF centroids, so both engines consume
bit-identical constants.

Sign convention (eigenvectors are sign-ambiguous): flip each axis so
its largest-|entry| coordinate is positive; ties take the first index.
"""
import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_COMPONENTS = 4

rows = duckdb.connect().execute(
    "SELECT embedding FROM read_parquet('/root/testdata/sf0.01/embeddings.parquet') ORDER BY vec_id"
).fetchall()
X = np.array([r[0] for r in rows], dtype=np.float64)
mean = X.mean(axis=0)
C = np.cov(X - mean, rowvar=False)
vals, vecs = np.linalg.eigh(C)
order = np.argsort(vals)[::-1][:N_COMPONENTS]
comps = []
for j in order:
    v = vecs[:, j]
    k = int(np.argmax(np.abs(v)))
    if v[k] < 0:
        v = -v
    comps.append(v)

def lit(arr):
    return "[" + ", ".join(str(round(float(x), 6)) for x in arr) + "]"

out = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "machine_learning_with_spark_streaming_spark", "functions", "pca_artifacts.py",
)
with open(out, "w") as f:
    f.write('"""Frozen PCA artifact (tools/freeze_pca.py): embedding mean +\n')
    f.write('top-4 principal axes of the sf0.01 embeddings, 6-dp literals.\n')
    f.write('Sign convention: largest-|entry| coordinate positive."""\n\n')
    f.write(f"PCA_DIM = {X.shape[1]}\n")
    f.write(f"PCA_N_COMPONENTS = {N_COMPONENTS}\n\n")
    f.write(f"PCA_MEAN = {lit(mean)}\n\n")
    f.write("PCA_COMPONENTS = [\n")
    for v in comps:
        f.write(f"    {lit(v)},\n")
    f.write("]\n")
print("wrote", out)
