#!/usr/bin/env python
"""Train the product-quantization codebook once on sf0.01 and emit
frozen literals — the same frozen-artifact contract as the IVF
quantizer (functions/artifacts.py) and the ML models
(tools/freeze_ml_artifacts.py): serving is pure arithmetic over
committed literals, so Spark and the DuckDB oracle run identical
computations and the driver can hash-check the full encode→ADC→top-k
pipeline.

Deterministic Lloyd's k-means per subspace: 64-dim embeddings split
into M=8 contiguous 8-dim subvectors; K=16 codes per subspace; init =
the K subvectors of the K lowest vec_ids that are pairwise-distinct;
20 fixed iterations; empty clusters re-seeded deterministically from
the farthest point; centroids rounded to 6 dp at the end.

Writes machine_learning_with_spark_streaming_spark/functions/pq_artifacts.py. Run manually when
the artifact needs refreshing:
    python tools/freeze_pq_codebook.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "machine_learning_with_spark_streaming_spark", "functions", "pq_artifacts.py")

M = 8  # subspaces
K = 16  # codes per subspace
ITERS = 20

HEADER = '''"""Frozen product-quantization codebook (tools/freeze_pq_codebook.py).

{m} contiguous subspaces x {k} codes, trained on the sf0.01
``embeddings`` table with deterministic Lloyd iterations and committed
as literals. ``PQ_CODEBOOK[m][code]`` is the 8-dim centroid of that
(subspace, code) cell, rounded to 6 dp — rounding happens at freeze
time, so both engines consume bit-identical constants.
"""

PQ_M = {m}
PQ_K = {k}
PQ_SUBDIM = {subdim}

# PQ_CODEBOOK[m][code] -> list of {subdim} floats
PQ_CODEBOOK = '''


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    X = np.array([r[1] for r in rows], dtype=np.float64)
    n, d = X.shape
    assert d % M == 0, (d, M)
    subdim = d // M

    books = []
    for m in range(M):
        S = X[:, m * subdim : (m + 1) * subdim]
        # deterministic init: first K pairwise-distinct subvectors
        cent, seen = [], set()
        for row in S:
            key = tuple(np.round(row, 9))
            if key not in seen:
                seen.add(key)
                cent.append(row.copy())
            if len(cent) == K:
                break
        C = np.array(cent)
        for _ in range(ITERS):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for k in range(K):
                mask = assign == k
                if mask.any():
                    C[k] = S[mask].mean(axis=0)
                else:  # re-seed from the globally farthest point
                    C[k] = S[d2.min(axis=1).argmax()]
        books.append(np.round(C, 6))

    lines = [HEADER.format(m=M, k=K, subdim=subdim), "[\n"]
    for m in range(M):
        lines.append("    [  # subspace %d\n" % m)
        for k in range(K):
            vals = ", ".join(repr(float(v)) for v in books[m][k])
            lines.append(f"        [{vals}],\n")
        lines.append("    ],\n")
    lines.append("]\n")
    with open(OUT, "w") as f:
        f.writelines(lines)
    print(f"wrote {OUT}: M={M} K={K} subdim={subdim} from {n} vectors")


if __name__ == "__main__":
    main()
