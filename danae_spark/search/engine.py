"""End-to-end dataset similarity search — the engine's headline API.

Reference parity: `search/main_flask.py` (train once, then
`CombinedSearcher.search(ids, k, L, M)` → ranked similar datasets with
content/metadata/overall scores and per-column matchings). Re-expressed
as one batch plan over the lake:

1. ingest: per-column signatures for every table (numeric + temporal
   quantile vectors — profiling pass, computed once).
2. content: per query column, M nearest candidate columns across the
   lake, `exp(-decay·dist/kth)` similarity (knn.py), then per candidate
   dataset an exact max-weight bipartite matching score (matching.py).
3. metadata: BM25 relevance of candidate catalog text (dataset name +
   column names standing in for title/keywords) against the query
   dataset's text.
4. combined: `w_c·content + w_m·metadata`, top-k.

The reference answers one query dataset at a time against an in-memory
R-tree + Elasticsearch; here the same search for EVERY query dataset is
a single DataFrame job (signatures are tiny — they scale with schema
count, not data volume — so at 100 TB this stays a broadcast-sized
problem fed by one profiling pass over the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from danae_spark.functions.rounding import rnd
from danae_spark.search.knn import content_similarity
from danae_spark.search.matching import dataset_matching_scores

W_CONTENT = 0.6
W_METADATA = 0.4

# session-scoped memo for the schema-derived metadata fields (one
# schema-footer read per table per session instead of per search call)
_FIELDS_INDEX: dict[tuple, DataFrame] = {}


def _catalog_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form metadata fields per dataset — title / keywords /
    description, the three boosted fields of the reference's metadata
    search (metadata_search.py:14-31). The lake tables carry no authored
    metadata, so the fields derive deterministically from the schema:
    title = dataset name, keywords = column names, description = a
    sentence over both (publish_dataset emits the same fields for
    published datasets)."""
    from danae_spark.catalog import TABLES, load_table

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _FIELDS_INDEX.get(key)
    if hit is not None:
        return hit
    rows = []
    for t in TABLES:
        cols = " ".join(load_table(spark, sf_dir, t).columns)
        rows.append((t, "title", t))
        rows.append((t, "keywords", cols))
        rows.append((t, "description", f"{t} lake table containing columns {cols}"))
    # coalesce(1): 30 rows — parallelize's default 32 slices make every
    # BM25 stage schedule 32 near-empty tasks
    out = spark.createDataFrame(
        rows, "dataset string, field string, field_text string"
    ).coalesce(1).cache()
    _FIELDS_INDEX[key] = out
    return out


def _metadata_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise boosted multi-field BM25 over the catalog metadata —
    the metadata-relevance component, normalized per query by max_score
    (metadata_search.py:46). Replaces the r1 token-Jaccard stand-in."""
    from danae_spark.search.metadata import pairwise_dataset_bm25

    return pairwise_dataset_bm25(
        _catalog_fields(spark, sf_dir),
        boosts={"title": 2.0, "keywords": 1.5, "description": 1.0},
    )


def dataset_search(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    w_content: float = W_CONTENT,
    w_metadata: float = W_METADATA,
    type_weights: dict[str, float] | None = None,
) -> DataFrame:
    """Top-k similar datasets for EVERY dataset in the lake, with
    content/metadata/overall scores (CombinedSearcher.search for all
    queries at once). `type_weights` forwards the per-type w·sim edge
    weights to the bipartite matcher."""
    content = dataset_matching_scores(spark, sf_dir, type_weights).select(
        "q_table", "cand_table", F.col("match_score").alias("content_score")
    )
    meta = _metadata_scores(spark, sf_dir)
    scored = (
        content.join(meta, ["q_table", "cand_table"], "full_outer")
        .select(
            "q_table",
            "cand_table",
            F.coalesce("content_score", F.lit(0.0)).alias("content_score"),
            F.coalesce("metadata_score", F.lit(0.0)).alias("metadata_score"),
        )
        .withColumn(
            "overall_score",
            rnd(
                F.lit(w_content) * F.col("content_score")
                + F.lit(w_metadata) * F.col("metadata_score"),
                6,
            ),
        )
    )
    w = W.partitionBy("q_table").orderBy(F.desc("overall_score"), F.asc("cand_table"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("q_table", "rank")
    )
