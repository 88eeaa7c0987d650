"""One-command corpus curation: run the full cluster→keep→rewrite
pipeline over a lake's documents table, publish the curated corpus as
parquet, and print the before/after composition report.

Usage: python tools/curate.py [sf_dir] [out_dir]

This is the operational entry point for `curate_corpus` — the frame a
team hands to tokenization — wrapped with the provenance a pipeline run
wants on disk: the curated parquet plus a JSON summary line (doc/token
counts in and out, drop breakdown) on stdout.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from danae_spark.catalog import load_table  # noqa: E402
from danae_spark.operators.dedup import canonical_keeper, curate_corpus  # noqa: E402
from danae_spark.operators.textstats import corpus_report  # noqa: E402
from danae_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"

    spark = get_spark("danae-curate")
    docs_in = load_table(spark, sf_dir, "documents")
    n_in = docs_in.count()

    # token accounting uses the SAME whitespace tokenizer as the span
    # rewriter's n_tokens/removed_tokens, so in/out/cut are comparable
    # (corpus_report's alphanumeric token count is a different measure)
    tokens_in = docs_in.agg(
        F.sum(F.size(F.expr("filter(split(text, ' +'), t -> t <> '')")))
    ).collect()[0][0]
    report_in = corpus_report(spark, sf_dir)
    alnum_tokens_in = report_in.agg(F.sum("total_tokens")).collect()[0][0]

    curated = curate_corpus(spark, sf_dir)
    curated.write.mode("overwrite").parquet(out_dir)
    out = spark.read.parquet(out_dir)
    n_out = out.count()
    agg = out.agg(
        F.sum("n_tokens").alias("tokens_out"),
        F.sum("removed_tokens").alias("tokens_cut"),
    ).collect()[0]

    ck = canonical_keeper(spark, sf_dir, order=False)
    drops = ck.agg(
        F.sum(
            ((F.col("is_canonical") == 0)).cast("long")
        ).alias("dropped_as_duplicate"),
        F.sum(
            ((F.col("is_canonical") == 1) & (F.col("quality_keep") == 0)).cast("long")
        ).alias("dropped_by_quality"),
    ).collect()[0]

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "out_dir": out_dir,
                "docs_in": n_in,
                "docs_out": n_out,
                "tokens_in": int(tokens_in),
                "tokens_out": int(agg.tokens_out),
                "verbatim_tokens_cut": int(agg.tokens_cut),
                "alnum_tokens_in": int(alnum_tokens_in),
                "dropped_as_duplicate": int(drops.dropped_as_duplicate),
                "dropped_by_quality": int(drops.dropped_by_quality),
            }
        )
    )


if __name__ == "__main__":
    main()
