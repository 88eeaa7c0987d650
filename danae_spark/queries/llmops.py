"""C-block: LLM-data-pipeline operators (dedup, ANN, text analysis,
multimodal plumbing). See SURVEY.md §2C.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from danae_spark.multimodal import binary
from danae_spark.operators import ann, dedup, textstats
from danae_spark.queries import register

# ------------------------------------------------------------------- dedup


@register("dedup_exact", oracle=dedup.DEDUP_EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_exact(spark, sf_dir)


@register("dedup_ngram_jaccard", oracle=dedup.DEDUP_NGRAM_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_ngram_jaccard(spark, sf_dir)


@register("dedup_minhash_lsh", oracle=dedup.DEDUP_MINHASH_MD5_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH dedup, fully oracle-verified (portable md5 hashes so
    DuckDB reproduces signatures → bands → candidates → verified pairs).
    The xxhash64 speed twin lives at dedup.dedup_minhash_xxhash64
    (unit-tested; same plan shape, faster hash for the 100 TB path)."""
    return dedup.dedup_minhash_md5(spark, sf_dir)


@register("dedup_simhash", oracle=dedup.DEDUP_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_simhash(spark, sf_dir)


@register("dedup_embedding_cosine", oracle=dedup.DEDUP_EMBEDDING_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_embedding_cosine(spark, sf_dir)


# --------------------------------------------------------------------- ANN


@register("ann_cosine_topk", oracle=ann.ann_cosine_topk_oracle())
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann.ann_cosine_topk(spark, sf_dir)


@register("ann_lsh_bucketed", oracle=ann.ann_lsh_oracle())
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann.ann_lsh_bucketed(spark, sf_dir)


@register("ann_ivf", oracle=ann.ann_ivf_oracle())
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann.ann_ivf(spark, sf_dir)


# ------------------------------------------------------------ text analysis


@register("text_stats", oracle=textstats.text_stats_oracle())
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID + quality metrics + token counts in one scan (merged
    r1 entries lang_id_ngram / text_quality_score / token_count — all
    row-wise codegen expressions, so one table scan instead of three)."""
    return textstats.text_stats(spark, sf_dir)


@register("text_repetition_filter", oracle=textstats.text_repetition_oracle())
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.text_repetition(spark, sf_dir)


@register("contamination_ngram", oracle=dedup.contamination_ngram_oracle())
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.contamination_ngram(spark, sf_dir)


@register("doc_fingerprint", oracle=textstats.doc_fingerprint_oracle())
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.doc_fingerprint(spark, sf_dir)


# ----------------------------------------------------- deterministic sampling

_STRATUM_CAP = 30

_SAMPLE_ORACLE = f"""
    WITH eligible AS (
      SELECT source, doc_id, n_chars, md5(text) AS h
      FROM documents
      WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT % 10 = 0
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
      FROM eligible
    )
    SELECT source,
           count(*) AS n_eligible,
           CAST(sum(CASE WHEN rk <= {_STRATUM_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           floor((avg(CASE WHEN rk <= {_STRATUM_CAP} THEN n_chars END)) * power(10, 4) + 0.5001) / power(10, 4) AS avg_chars
    FROM ranked
    GROUP BY source ORDER BY source
    """


@register("deterministic_sample", oracle=_SAMPLE_ORACLE)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic STRATIFIED sampling: content-hash bucket membership
    (~10%) plus a per-stratum cap — within each source, the cap keeps
    the docs with the smallest content hash (priority sampling), so the
    selection is reproducible across runs/engines/cluster sizes AND
    balanced across strata (membership and priority depend only on
    content, never on partitioning or RNG state, unlike df.sample).
    One shuffle on source; the rank window and the aggregate reuse it."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from danae_spark.catalog import load_table
    from danae_spark.functions.rounding import rnd

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long") % 10
    w = W.partitionBy("source").orderBy(F.md5("text"), "doc_id")
    return (
        docs.filter(bucket == 0)
        .withColumn("rk", F.row_number().over(w))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_eligible"),
            F.sum((F.col("rk") <= _STRATUM_CAP).cast("long")).alias("n_sampled"),
            rnd(F.avg(F.when(F.col("rk") <= _STRATUM_CAP, F.col("n_chars"))), 4).alias(
                "avg_chars"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------- data-quality checks

_DQ_ORACLE = """
    SELECT 'orders_orphan_custkey' AS check_name, count(*) AS n_bad
    FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_orphan_orderkey', count(*)
    FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem_orphan_partkey', count(*)
    FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'lineitem_null_qty', count(*) FROM lineitem WHERE l_quantity IS NULL
    UNION ALL
    SELECT 'orders_negative_price', count(*) FROM orders WHERE o_totalprice < 0
    ORDER BY check_name
    """


@register("dq_checks", oracle=_DQ_ORACLE)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline data-quality gate: referential-integrity and constraint
    violations across the star schema.

    Plan shape (r1 scanned lineitem three times through unhinted
    anti-joins — 30 s at sf0.1): each fact table is scanned ONCE —
    left-join the keys-only dim projections, then fold every per-fact
    constraint into a single aggregate. customer/part key sets are
    broadcast (keys-only projections, dim-sized relative to the facts;
    at extreme SF drop the hint and AQE keeps them shuffle joins);
    lineitem⋈orders stays a shuffle join on the natural key. The final
    5-row reshape is a stack over two 1-row aggregates."""
    from pyspark.sql import functions as F

    from danae_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    c_keys = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k_cust"), F.lit(1).alias("has_c")
    )
    p_keys = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k_part"), F.lit(1).alias("has_p")
    )
    o_keys = o.select(F.col("o_orderkey").alias("k_ord"), F.lit(1).alias("has_o"))

    l_agg = (
        l.select("l_orderkey", "l_partkey", "l_quantity")
        .join(o_keys, F.col("l_orderkey") == F.col("k_ord"), "left")
        .join(F.broadcast(p_keys), F.col("l_partkey") == F.col("k_part"), "left")
        .agg(
            F.sum(F.col("has_o").isNull().cast("long")).alias("lineitem_orphan_orderkey"),
            F.sum(F.col("has_p").isNull().cast("long")).alias("lineitem_orphan_partkey"),
            F.sum(F.col("l_quantity").isNull().cast("long")).alias("lineitem_null_qty"),
        )
    )
    o_agg = (
        o.select("o_custkey", "o_totalprice")
        .join(F.broadcast(c_keys), F.col("o_custkey") == F.col("k_cust"), "left")
        .agg(
            F.sum(F.col("has_c").isNull().cast("long")).alias("orders_orphan_custkey"),
            F.sum((F.col("o_totalprice") < 0).cast("long")).alias("orders_negative_price"),
        )
    )
    checks = (
        "orders_orphan_custkey",
        "lineitem_orphan_orderkey",
        "lineitem_orphan_partkey",
        "lineitem_null_qty",
        "orders_negative_price",
    )
    stacked = ", ".join(f"'{name}', `{name}`" for name in checks)
    return (
        l_agg.crossJoin(o_agg)  # two 1-row aggregates
        .select(F.expr(f"stack({len(checks)}, {stacked}) AS (check_name, n_bad)"))
        .orderBy("check_name")
    )


# --------------------------------------------------------------- multimodal


@register("multimodal_meta", oracle=binary.MULTIMODAL_META_ORACLE)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return binary.multimodal_meta(spark, sf_dir)
