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
from danae_spark.search import combined, knn, metadata
from danae_spark.functions.rounding import rnd

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


@register("profile_quantiles", oracle=profiler.signature_profile_oracle())
def profile_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed signature profile: numeric quantile vectors ∪ temporal
    epoch-second vectors (merged r1 profile_quantiles+profile_temporal —
    one entry, both operators verified)."""
    return profiler.signature_profile(spark, sf_dir)


# ------------------------------------------------------------ A5/A7: terms


@register("profile_categorical_topk", oracle=tfidf.categorical_topk_combined_oracle())
def profile_categorical_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical top-k terms by BOTH fetch_top_k modes (raw frequency
    and corpus tf-idf) in one pass (merged r1 profile_categorical_topk +
    profile_categorical_topk_tfidf)."""
    return tfidf.categorical_topk_combined(spark, sf_dir)


@register("tfidf_topk_terms", oracle=tfidf.tfidf_topk_oracle())
def tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf.tfidf_topk(spark, sf_dir)


# ------------------------------------------------------------ A6: spatial bbox

_SPATIAL_ORACLE = """
    WITH geo AS (
      SELECT n.n_name AS nation,
             ((s.s_suppkey * 7919) % 36000) / 100.0 - 180.0 AS lon,
             ((s.s_suppkey * 104729) % 18000) / 100.0 - 90.0 AS lat
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    )
    SELECT nation,
           floor((min(lon)) * power(10, 4) + 0.5001) / power(10, 4) AS x_min, floor((max(lon)) * power(10, 4) + 0.5001) / power(10, 4) AS x_max,
           floor((min(lat)) * power(10, 4) + 0.5001) / power(10, 4) AS y_min, floor((max(lat)) * power(10, 4) + 0.5001) / power(10, 4) AS y_max,
           count(*) AS n_points
    FROM geo GROUP BY nation ORDER BY nation
    """


@register("profile_spatial_bbox", oracle=_SPATIAL_ORACLE)
def profile_spatial_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial profile: bounding box per group (reference:
    profiler.py:90-111 lat/long detection + filters.py:132
    add_spatial_stats [x_min,x_max,y_min,y_max]). The testdata has no
    geo columns, so deterministic synthetic coordinates are derived from
    supplier keys — the operator under test is the distributed bbox
    aggregation itself."""
    from pyspark.sql import functions as F

    from danae_spark.catalog import load_table

    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    geo = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        F.col("n_name").alias("nation"),
        (((F.col("s_suppkey") * 7919) % 36000) / 100.0 - 180.0).alias("lon"),
        (((F.col("s_suppkey") * 104729) % 18000) / 100.0 - 90.0).alias("lat"),
    )
    return (
        geo.groupBy("nation")
        .agg(
            rnd(F.min("lon"), 4).alias("x_min"),
            rnd(F.max("lon"), 4).alias("x_max"),
            rnd(F.min("lat"), 4).alias("y_min"),
            rnd(F.max("lat"), 4).alias("y_max"),
            F.count("*").alias("n_points"),
        )
        .orderBy("nation")
    )


# ------------------------------------------------- A8-A12: search operators


@register("column_signature_knn", oracle=knn.signature_knn_oracle())
def column_signature_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn.signature_knn(spark, sf_dir)


@register("content_similarity_score", oracle=knn.content_similarity_oracle())
def content_similarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn.content_similarity(spark, sf_dir)


@register("metadata_search_bm25", oracle=metadata.bm25_search_oracle())
def metadata_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return metadata.bm25_search(spark, sf_dir)


@register("combined_topk", oracle=combined.combined_topk_oracle())
def combined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return combined.combined_topk(spark, sf_dir)


# ------------------------------------------------ A15: similarity graph

_SIM_GRAPH_TAU = 0.35


def _sim_graph_oracle() -> str:
    from danae_spark.operators.ann import lsh_bucket_sql

    return f"""
    WITH buckets AS (
      SELECT e.vec_id, e.embedding, {lsh_bucket_sql('e')} AS bucket FROM embeddings e
    ),
    cos AS (
      SELECT a.vec_id AS v1, b.vec_id AS v2,
             list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS c
      FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    edges AS (
      SELECT v1, v2 FROM cos
      WHERE floor(c * power(10, 6) + 0.5001) / power(10, 6) >= {_SIM_GRAPH_TAU}
    ),
    degree AS (
      SELECT v, count(*) AS degree FROM (
        SELECT v1 AS v FROM edges UNION ALL SELECT v2 AS v FROM edges
      ) GROUP BY v
    )
    SELECT degree, count(*) AS n_nodes
    FROM degree GROUP BY degree ORDER BY degree
    """


@register("similarity_graph_degree", oracle=_sim_graph_oracle())
def similarity_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-graph shape (ui/dataset_graph.py renders the dataset
    similarity graph; this computes its degree distribution over the
    similarity edge set — the engine-side analytics behind it).

    Edge source (r1 fix): edges come from the LSH-BUCKETED pair set
    (same hyperplane buckets as ann_lsh_bucketed) instead of the
    all-pairs broadcast cosine join — pairwise work is Σ bucket², the
    shape that survives 100×. The oracle mirrors the bucket restriction."""
    from pyspark.sql import functions as F

    from danae_spark.catalog import load_table
    from danae_spark.functions import vectors
    from danae_spark.functions.rounding import rnd
    from danae_spark.operators.ann import _hyperplanes, lsh_bucket_col
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", lsh_bucket_col("embedding", _hyperplanes()).alias("bucket")
    )
    a = emb.select(F.col("vec_id").alias("v1"), F.col("embedding").alias("e1"), "bucket")
    b = emb.select(F.col("vec_id").alias("v2"), F.col("embedding").alias("e2"), "bucket")
    cos = vectors.pair_cosine_udf()
    edges = (
        a.join(b, "bucket")  # bucket equi-join: in-bucket pairs only
        .filter(F.col("v1") < F.col("v2"))
        .withColumn("cosine", rnd(cos("e1", "e2"), 6))
        .filter(F.col("cosine") >= _SIM_GRAPH_TAU)
        .select("v1", "v2")
    )
    nodes = edges.select(F.col("v1").alias("v")).unionAll(
        edges.select(F.col("v2").alias("v"))
    )
    deg = nodes.groupBy("v").agg(F.count("*").alias("degree"))
    return (
        deg.groupBy("degree").agg(F.count("*").alias("n_nodes")).orderBy("degree")
    )


# ------------------------------------------------------ A13: column embedding


@register("column_embedding", oracle=tfidf.categorical_column_embeddings_oracle())
def column_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean word-vector per categorical column — now ALSO the Categorical
    branch of the search index (see tfidf.categorical_column_embeddings
    for semantics and the GloVe-stand-in declaration)."""
    return tfidf.categorical_column_embeddings(spark, sf_dir)
