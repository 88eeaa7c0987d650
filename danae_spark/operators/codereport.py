"""Corpus code report — the aggregation a code-corpus curation run
reads first: per (bucket, language, license) file counts and line
volumes over the code_corpus_stats layer.

One certified plan: the codestats Arrow map (operators/codestats.py),
a bucket projection (code / prose / reject from the classifier), and
ONE map-side-combined hash aggregate — the corpus_format_census shape
applied to the StarCoder-class leg. The oracle aggregates
CODE_STATS_ORACLE verbatim, so this composition can never disagree
with the unit entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["corpus_code_report", "CODE_REPORT_ORACLE"]


def corpus_code_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from danae_spark.operators.codestats import code_stats_roundtrip

    stats = code_stats_roundtrip(spark, sf_dir)
    bucket = (
        F.when(F.col("is_code"), F.lit("code"))
        .when(F.col("is_code") == F.lit(False), F.lit("prose"))
        .otherwise(F.lit("reject"))
    )
    return (
        stats.select(bucket.alias("bucket"), "language", "license",
                     "n_lines", "n_code", "n_comment")
        .groupBy("bucket", "language", "license")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_lines").cast("bigint").alias("total_lines"),
            F.sum("n_code").cast("bigint").alias("total_code"),
            F.sum("n_comment").cast("bigint").alias("total_comment"),
        )
        .orderBy("bucket", "language", "license")
    )


def _oracle() -> str:
    from danae_spark.operators.codestats import CODE_STATS_ORACLE

    return f"""
WITH s AS ({CODE_STATS_ORACLE})
SELECT CASE WHEN is_code THEN 'code'
            WHEN is_code = FALSE THEN 'prose'
            ELSE 'reject' END AS bucket,
       language, license,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n_lines) AS BIGINT) AS total_lines,
       CAST(sum(n_code) AS BIGINT) AS total_code,
       CAST(sum(n_comment) AS BIGINT) AS total_comment
FROM s
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


CODE_REPORT_ORACLE = _oracle()
