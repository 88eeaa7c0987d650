"""Synthesize a larger lake from sf0.1 for scaling-curve measurements.

Usage: python tools/gen_scale_lake.py OUT_DIR K

Produces K referentially-consistent copies of the sf0.1 tables with
key-space offsets (copy c shifts every key by c · (max_key + 1)), so
joins, group cardinalities, and per-key row counts scale exactly K×
with per-copy distributions identical to the source. Two mutations
keep the WORKLOAD shape natural rather than degenerate:

- documents.text: copies > 0 get a deterministic per-(copy, doc) token
  permutation — token/char distributions are preserved (text analysis
  scales honestly) but shingle sets decorrelate, so near-dup operators
  don't drown in K² artificial cross-copy duplicate pairs;
- embeddings.embedding: copies > 0 get a per-copy dimension rotation —
  norms and coordinate distributions are preserved but cross-copy
  cosine decorrelates, for the same reason.

region/nation stay single-copy (fixed dimensions, like TPC-H).
This is measurement tooling: the driver's read-only /root/testdata
stays untouched; output lands under the repo (gitignored).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from danae_spark.catalog import load_table
from danae_spark.session import get_spark

SRC = "/root/testdata/sf0.1"

KEYS = {
    "supplier": {"s_suppkey": "s"},
    "customer": {"c_custkey": "c"},
    "part": {"p_partkey": "p"},
    "orders": {"o_orderkey": "o", "o_custkey": "c"},
    "lineitem": {"l_orderkey": "o", "l_partkey": "p", "l_suppkey": "s"},
    "events": {"event_id": "e"},
    "documents": {"doc_id": "d"},
    "embeddings": {"vec_id": "v"},
}


def main() -> None:
    out_dir, k = sys.argv[1], int(sys.argv[2])
    spark = get_spark("gen-scale-lake")
    os.makedirs(out_dir, exist_ok=True)

    spans = {}
    for table, keys in KEYS.items():
        df = load_table(spark, SRC, table)
        for col, space in keys.items():
            if space not in spans:
                spans[space] = df.agg(F.max(col)).head()[0] + 1

    for table in ("region", "nation"):
        load_table(spark, SRC, table).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )

    for table, keys in KEYS.items():
        src = load_table(spark, SRC, table)
        parts = []
        for c in range(k):
            df = src
            for col, space in keys.items():
                df = df.withColumn(col, F.col(col) + F.lit(c * spans[space]))
            if table == "documents" and c > 0:
                # deterministic per-(copy, doc) token permutation: order
                # tokens by md5(token · position · copy) — distribution
                # preserved, shingles decorrelated
                toks = "filter(split(text, ' '), t -> t <> '')"
                df = df.withColumn(
                    "text",
                    F.expr(
                        "array_join(transform(array_sort(transform("
                        f"{toks}, (t, i) -> struct(md5(concat(t, '#', cast(i as string), "
                        f"'#', '{c}')) as h, t as t))), s -> s.t), ' ')"
                    ),
                ).withColumn("n_chars", F.length("text"))
            if table == "embeddings" and c > 0:
                # per-copy dimension rotation (cyclic shift by c · 7):
                # norm and coordinate distributions preserved, cross-copy
                # cosine decorrelated
                df = df.withColumn(
                    "embedding",
                    F.expr(
                        "transform(sequence(0, size(embedding) - 1), "
                        f"i -> embedding[(i + {c} * 7) % size(embedding)])"
                    ),
                )
            parts.append(df)
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
        # file count scales with the data (one file per source-copy, the
        # sf0.1 source being single-file) — scan parallelism then grows
        # with volume exactly as a real lake's does; an earlier
        # k//2-file layout capped sf0.5 scans at 2 tasks and produced
        # sf1-faster-than-sf0.5 artifacts
        full.coalesce(k).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )
        print(f"{table}: {k}x written", flush=True)


if __name__ == "__main__":
    main()
