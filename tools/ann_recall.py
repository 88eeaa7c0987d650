"""Measure recall@k of every approximate ANN path vs brute force.

Usage: python tools/ann_recall.py [sf_dir] [k]

One JSON line per method (lsh / ivf / ivf_trained) — the tuning signal
to re-run after changing plane counts, nprobe, or the IVF codebook.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from danae_spark.operators import ann
from danae_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else ann.TOP_K
    spark = get_spark("ann-recall")
    for r in ann.ann_recall(spark, sf_dir, k=k, include_trained=True).collect():
        print(json.dumps(r.asDict()), flush=True)


if __name__ == "__main__":
    main()
