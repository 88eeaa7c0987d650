"""Int8 embedding quantization — the ANN memory/scale path.

At 100 TB an `array<float>` embedding column is the dominant storage and
shuffle cost of every similarity operator. Symmetric per-vector int8
quantization cuts it 4× (codes: 1 byte/dim + one float scale) with ~1%
cosine error, and cosine is SCALE-INVARIANT, so similarity runs directly
on the codes — no dequantization in the hot path:

    scale  = max|v| / 127            (per vector)
    code_i = floor(v_i / scale + 0.5)  ∈ [-127, 127]
    cos(codes_a, codes_b) ≈ cos(a, b)

Everything is JVM-side `transform`/`aggregate` expressions; the rounding
uses the engine-portable floor(x + 0.5) (not `round`, whose half-tie
mode differs between engines), so the DuckDB oracle reproduces the codes
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from danae_spark.catalog import load_table
from danae_spark.functions import vectors
from danae_spark.functions.rounding import rnd

TOP_K = 5
N_QUERIES = 20  # same query convention as operators/ann.py


def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`embeddings` → (vec_id, codes array<tinyint>, scale double).

    Zero vectors quantize to all-zero codes with scale 0 (guarded
    division)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    amax = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    scale = (amax / F.lit(127.0)).alias("scale")
    codes = F.when(
        amax > 0,
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") / (amax / F.lit(127.0)) + F.lit(0.5))
            .cast("tinyint"),
        ),
    ).otherwise(
        F.transform("embedding", lambda x: F.lit(0).cast("tinyint"))
    )
    return emb.select("vec_id", codes.alias("codes"), scale)


def dequantize(codes, scale):
    """codes array<tinyint> × scale → array<double> (reconstruction)."""
    return F.transform(codes, lambda c: c.cast("double") * scale)


def quantized_ann_topk(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """Brute-force top-k cosine neighbors computed ON THE INT8 CODES —
    the quantized twin of ann_cosine_topk. Scale cancels out of cosine,
    so no dequantization happens anywhere in the plan."""
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    q8 = quantize_embeddings(spark, sf_dir).select("vec_id", "codes")
    q = q8.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("codes").alias("q_codes")
    )
    c = q8.select(F.col("vec_id").alias("cand_id"), F.col("codes").alias("c_codes"))
    cos = vectors.pair_cosine_udf()
    pairs = q.join(F.broadcast(c), F.col("query_id") != F.col("cand_id")).withColumn(
        "qcosine", rnd(cos("q_codes", "c_codes"), 6)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("qcosine"), F.asc("cand_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "qcosine", "rank")
        .orderBy("query_id", "rank")
    )


def quantized_ann_oracle(k: int = TOP_K) -> str:
    """DuckDB twin: same quantization formula, same code-domain cosine."""
    codes = (
        "CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0"
        " THEN list_transform(embedding, x -> floor(CAST(x AS DOUBLE) /"
        " (list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) / 127.0)"
        " + 0.5))"
        " ELSE list_transform(embedding, x -> 0.0) END"
    )
    cos = (
        "list_dot_product(q.codes, c.codes) /"
        " (sqrt(list_dot_product(q.codes, q.codes)) *"
        "  sqrt(list_dot_product(c.codes, c.codes)))"
    )
    return f"""
    WITH q8 AS (SELECT vec_id, {codes} AS codes FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             floor(({cos}) * 1000000.0 + 0.5001) / 1000000.0 AS qcosine
      FROM q8 q JOIN q8 c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, cand_id, qcosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY qcosine DESC, cand_id) AS rank
      FROM pairs
    ) WHERE rank <= {k}
    ORDER BY query_id, rank
    """
