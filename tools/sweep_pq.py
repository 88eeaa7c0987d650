"""Reproduce the PQ parameter sweep behind operators/pq.py's defaults.

Usage: python tools/sweep_pq.py [sf_dir]

Prints one JSON line per (m, kc) configuration with recall@k vs the
exact brute-force baseline, the code footprint per vector, and the
wall time — plus IVF-PQ at the chosen default across nprobe values.
Run it against any new embedding distribution before trusting the
(16, 16) default: m (subspace count) dominates recall, and
near-random vectors (this lake's synthetic embeddings) are PQ's
documented worst case.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from danae_spark.operators import ann, pq
from danae_spark.session import get_spark


def _recall(approx_rows, exact_rows) -> float:
    ex, got = {}, {}
    for r in exact_rows:
        ex.setdefault(r.query_id, set()).add(r.cand_id)
    for r in approx_rows:
        got.setdefault(r.query_id, set()).add(r.cand_id)
    return sum(len(ex[q] & got.get(q, set())) for q in ex) / max(
        1, sum(len(v) for v in ex.values())
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("pq-sweep")
    exact = ann.ann_cosine_topk(spark, sf_dir).collect()
    for m, kc in ((8, 16), (16, 16), (8, 32), (16, 32), (32, 16)):
        t0 = time.time()
        rows = pq.pq_ann_topk(spark, sf_dir, m=m, kc=kc).collect()
        print(
            json.dumps(
                {
                    "variant": "pq",
                    "m": m,
                    "kc": kc,
                    "bytes_per_vec": m * math.ceil(math.log2(kc)) / 8,
                    "recall": round(_recall(rows, exact), 3),
                    "sec": round(time.time() - t0, 2),
                }
            )
        )
    for nprobe in (2, 4, 8):
        t0 = time.time()
        rows = pq.ivfpq_ann_topk(spark, sf_dir, nprobe=nprobe).collect()
        print(
            json.dumps(
                {
                    "variant": "ivfpq",
                    "m": pq.PQ_M,
                    "kc": pq.PQ_KC,
                    "nprobe": nprobe,
                    "recall": round(_recall(rows, exact), 3),
                    "sec": round(time.time() - t0, 2),
                }
            )
        )


if __name__ == "__main__":
    main()
