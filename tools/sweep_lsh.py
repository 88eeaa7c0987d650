"""Reproduce the SURVEY §6a embedding-LSH candidate-efficiency sweep.

Usage: python tools/sweep_lsh.py [sf_dir]

Prints one JSON line per (bands, planes_per_band) configuration with
candidate/verified counts and recall vs the exact O(N²) twin — the
measurement behind the default (8, 3) choice. Run it against any new
embedding distribution before trusting the defaults.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from danae_spark.catalog import load_table
from danae_spark.operators import dedup
from danae_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("lsh-sweep")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").cache()
    n = emb.count()

    exact = {
        (r.v1, r.v2)
        for r in dedup.dedup_embedding_cosine(spark, sf_dir, max_rows=None).collect()
    }
    print(json.dumps({"n_vectors": n, "exact_pairs": len(exact)}), flush=True)

    for bands in (6, 8, 12):
        for planes in (3, 4, 5):
            t0 = time.time()
            pairs = {
                (r.v1, r.v2)
                for r in dedup.embedding_lsh_pairs(
                    emb, bands=bands, planes_per_band=planes
                ).collect()
            }
            stats = dedup.embedding_lsh_stats(
                emb, bands=bands, planes_per_band=planes
            ).collect()[0]
            print(
                json.dumps(
                    {
                        "bands": bands,
                        "planes": planes,
                        "candidates": stats["n_candidates"],
                        "candidate_fraction": stats["candidate_fraction"],
                        "verified": len(pairs),
                        "recall": round(len(pairs & exact) / max(len(exact), 1), 4),
                        "sec": round(time.time() - t0, 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
