#!/usr/bin/env python
"""Freeze the per-dimension whitening artifact (mean, std) for
emb_whiten_frozen: computed once on the sf0.01 ``embeddings`` table with
the same exact integer-nano sufficient statistics the certified
``emb_dim_stats`` query uses, committed as 6-dp literals to
``machine_learning_with_spark_streaming_spark/functions/whiten_artifacts.py``
and mirrored verbatim into the oracle — the freeze-then-mirror recipe
(PQ codebook / IVF centroids / PCA axes / k=32 SemDeDup quantizer).

Run manually when the artifact needs refreshing:
    python tools/freeze_whiten.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(
    REPO, "machine_learning_with_spark_streaming_spark", "functions",
    "whiten_artifacts.py",
)

HEADER = '''"""Frozen whitening artifact (tools/freeze_whiten.py): per-dimension
(mean, std) of the sf0.01 embeddings from exact integer-nano sums,
6-dp literals. Serving-path standardization is (x - mean) / std over
these constants — pure arithmetic both engines run identically."""

from __future__ import annotations

'''


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from machine_learning_with_spark_streaming_spark.operators.similarity import (
        embedding_dim_stats,
    )
    from machine_learning_with_spark_streaming_spark.schemas import load_table
    from machine_learning_with_spark_streaming_spark.session import get_session

    spark = get_session("freeze-whiten", shuffle_partitions=8)
    rows = (
        embedding_dim_stats(load_table(spark, sf_dir, "embeddings"))
        .orderBy("dim")
        .collect()
    )
    means = [r["mean"] for r in rows]
    stds = [r["std"] for r in rows]
    assert all(s > 0 for s in stds), "zero-variance dimension: whitening undefined"

    with open(OUT, "w") as f:
        f.write(HEADER)
        f.write(f"WHITEN_MEAN: list[float] = {means!r}\n\n")
        f.write(f"WHITEN_STD: list[float] = {stds!r}\n")
    print(f"wrote {OUT}: {len(means)} dims")


if __name__ == "__main__":
    main()
