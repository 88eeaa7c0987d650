"""A-block: danae-core operators (profiling, tf-idf, signatures, knn,
content/metadata/combined scoring). See SURVEY.md §2A for the inventory
and reference anchors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from danae_spark import catalog
from danae_spark.catalog import TABLES
from danae_spark.profiling import profiler, tfidf
from danae_spark.queries import register

# ------------------------------------------------------------ A1: catalog

_CATALOG_NCOLS = {
    "region": 2,
    "nation": 3,
    "customer": 5,
    "supplier": 4,
    "part": 6,
    "orders": 6,
    "lineitem": 11,
    "events": 6,
    "documents": 5,
    "embeddings": 3,
}

_catalog_oracle = (
    " UNION ALL ".join(
        f"SELECT '{t}' AS dataset, {_CATALOG_NCOLS[t]} AS num_columns,"
        f" (SELECT count(*) FROM {t}) AS num_rows"
        for t in TABLES
    )
    + " ORDER BY dataset"
)


@register("catalog_datasets", oracle=_catalog_oracle)
def catalog_datasets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.catalog_datasets(spark, sf_dir)


# ------------------------------------------------------------ A2-A4: profiling


@register("profile_numeric", oracle=profiler.numeric_profile_oracle())
def profile_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiler.numeric_profile(spark, sf_dir)


@register("profile_quantiles", oracle=profiler.quantile_signatures_oracle())
def profile_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiler.quantile_signatures(spark, sf_dir)


@register("profile_temporal", oracle=profiler.temporal_profile_oracle())
def profile_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiler.temporal_profile(spark, sf_dir)


# ------------------------------------------------------------ A5/A7: terms


@register("profile_categorical_topk", oracle=tfidf.categorical_topk_oracle())
def profile_categorical_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf.categorical_topk(spark, sf_dir)


@register("tfidf_topk_terms", oracle=tfidf.tfidf_topk_oracle())
def tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf.tfidf_topk(spark, sf_dir)
