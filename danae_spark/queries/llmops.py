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


@register("dedup_minhash_lsh", oracle=None)  # xxhash64-based, rows-only
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_minhash_lsh(spark, sf_dir)


@register("dedup_minhash_md5", oracle=dedup.DEDUP_MINHASH_MD5_ORACLE)
def dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
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


@register("lang_id_ngram", oracle=textstats.lang_id_oracle())
def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.lang_id(spark, sf_dir)


@register("text_quality_score", oracle=textstats.text_quality_oracle())
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.text_quality(spark, sf_dir)


@register("token_count", oracle=textstats.token_count_oracle())
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_count(spark, sf_dir)


@register("doc_fingerprint", oracle=textstats.doc_fingerprint_oracle())
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.doc_fingerprint(spark, sf_dir)


# --------------------------------------------------------------- multimodal


@register("multimodal_meta", oracle=binary.MULTIMODAL_META_ORACLE)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return binary.multimodal_meta(spark, sf_dir)
