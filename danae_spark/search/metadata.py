"""Metadata (text-relevance) search.

Reference parity: `search/metadata_search.py` issues a boosted
multi-field `match` query to Elasticsearch (BM25 under the hood) and
normalizes every hit's score by `max_score` (metadata_search.py:43-46).

Spark-first redesign: ES's Lucene BM25 is re-expressed explicitly as
DataFrame aggregations — per-doc length, corpus doc-freq, and the
standard Lucene formula

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

with k1=1.2, b=0.75. Corpus statistics (df per query term, avgdl, N) are
tiny aggregates broadcast back to the doc-level join — one shuffle on
(doc, term), no search service. Scores are rounded to 6dp before the
max-normalization and ranking so results are engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from danae_spark.catalog import load_table
from danae_spark.profiling.tfidf import tokenize
from danae_spark.functions.rounding import rnd

K1 = 1.2
B = 0.75
DEFAULT_QUERY = "spark join filter stream"


def bm25_search(
    spark: SparkSession, sf_dir: str, query: str = DEFAULT_QUERY, k: int = 20
) -> DataFrame:
    terms = sorted(set(query.lower().split()))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokenize(docs, "text").select("doc_id", "term")

    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.avg("dl").alias("avgdl"), F.count("*").alias("n_docs"))

    qtoks = toks.filter(F.col("term").isin(*terms))
    tf = qtoks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = qtoks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))

    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf", F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (K1 + 1))
            / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(rnd(F.sum("term_score"), 6).alias("score"))
    )
    wall = W.partitionBy()
    return (
        scored.withColumn("max_score", F.max("score").over(wall))
        .withColumn("norm_score", rnd(F.col("score") / F.col("max_score"), 6))
        .withColumn(
            "rank",
            F.row_number().over(W.partitionBy().orderBy(F.desc("score"), F.asc("doc_id"))),
        )
        .filter(F.col("rank") <= k)
        .select("doc_id", "score", "norm_score", "rank")
        .orderBy("rank")
    )


def bm25_search_oracle(query: str = DEFAULT_QUERY, k: int = 20) -> str:
    terms = sorted(set(query.lower().split()))
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
      FROM documents
    ), toks_f AS (
      SELECT doc_id, term FROM toks WHERE term <> ''
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks_f GROUP BY doc_id
    ), stats AS (
      SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks_f
      WHERE term IN ({term_list}) GROUP BY doc_id, term
    ), dft AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM toks_f
      WHERE term IN ({term_list}) GROUP BY term
    ), scored AS (
      SELECT tf.doc_id,
             floor((sum(
               ln(1 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * ({K1} + 1))
               / (tf + {K1} * (1 - {B} + {B} * dl.dl / avgdl))
             )) * power(10, 6) + 0.5001) / power(10, 6) AS score
      FROM tf
      JOIN dft USING (term)
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, score,
           floor((score / max(score) OVER ()) * power(10, 6) + 0.5001) / power(10, 6) AS norm_score,
           rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= {k}
    ORDER BY rank
    """
