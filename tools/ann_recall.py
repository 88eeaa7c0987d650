"""Measure recall@k of every approximate ANN path vs brute force.

Usage: python tools/ann_recall.py [sf_dir] [k]

One JSON line per method (brute / lsh / ivf / ivf_trained / pq /
ivfpq), with recall@k AND the candidate fraction each method scores —
the tuning signal to re-run after changing plane counts, nprobe, PQ
codebooks, or the IVF codebook. The same frame is gate-asserted by
tests/test_ann_recall.py::test_recall_report_floors_all_families.
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
    for r in ann.recall_report(spark, sf_dir, k=k).collect():
        print(json.dumps(r.asDict()), flush=True)


if __name__ == "__main__":
    main()
