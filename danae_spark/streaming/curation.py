"""Streaming corpus curation: the quality/PII keep-drop decision over a
document STREAM.

Incremental corpus ingest (a crawler landing parquet files
continuously) wants the curation verdict per micro-batch, not a nightly
batch job. Because the full repetition signal needs a per-doc
aggregation, the streaming path computes the two stateless signals
(quality score, PII) plus the dup-2gram/top-2gram fractions as pure
row-wise array expressions — every column is whole-stage-codegen, so
the stream stage has NO state store at all (stateless append): exactly
the operator shape Structured Streaming scales linearly.

Decision parity with the batch `quality_filter` is pytest-verified
(tests/test_streaming_curation.py) — the row-wise top-2gram computation
is the same value the batch explode+agg produces, just computed inside
the array expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from danae_spark.catalog import table_path
from danae_spark.operators.pii import PII_PATTERNS
from danae_spark.operators.textstats import (
    DUP_2GRAM_MAX,
    MIN_QUALITY,
    TOP_2GRAM_MAX,
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream pinned to the documents table (same pattern as
    events: the file source needs a directory + glob)."""
    schema = spark.read.parquet(table_path(sf_dir, "documents")).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir.rstrip("/"))
    )


def _rowwise_2gram_fracs(text_col: str = "text"):
    """dup/top 2-gram fractions as pure array expressions (no explode,
    no shuffle): aggregate over the distinct grams of the doc's own
    2-gram array — identical values to the batch explode+groupBy since
    both operate on the same per-doc gram multiset."""
    toks = f"filter(split(lower({text_col}), '[^a-z0-9]+'), t -> t <> '')"
    grams = (
        f"transform(sequence(0, size({toks}) - 2),"
        f" i -> concat_ws(' ', slice({toks}, i + 1, 2)))"
    )
    n2 = f"CASE WHEN size({toks}) >= 2 THEN size({grams}) ELSE 0 END"
    nd = f"CASE WHEN size({toks}) >= 2 THEN size(array_distinct({grams})) ELSE 0 END"
    top = (
        f"CASE WHEN size({toks}) >= 2 THEN "
        f"array_max(transform(array_distinct({grams}),"
        f" g -> size(filter({grams}, x -> x = g)))) ELSE 0 END"
    )
    dup_frac = f"CASE WHEN ({n2}) > 0 THEN (({n2}) - ({nd})) / CAST(({n2}) AS DOUBLE) ELSE 0.0 END"
    top_frac = f"CASE WHEN ({n2}) > 0 THEN ({top}) / CAST(({n2}) AS DOUBLE) ELSE 0.0 END"
    return F.expr(dup_frac), F.expr(top_frac)


def curated_stream(
    docs_stream: DataFrame,
    min_quality: float = MIN_QUALITY,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document curation verdict as a STATELESS streaming projection:
    (doc_id, quality_score, dup_2gram_frac, top_2gram_frac, has_pii,
    keep). Append-mode, no watermark, no state store — scales with
    input rate only."""
    src = docs_stream.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    # text_stats_frame ends with orderBy (and widen), which streams
    # reject — build the identical row-wise columns directly instead
    n_pii = sum(
        F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
        for _n, pat, _s in PII_PATTERNS
    )
    dup_frac, top_frac = _rowwise_2gram_fracs("text")
    # quality score: same formula as text_stats_frame (row-wise)
    from danae_spark.operators.textstats import STOPWORDS

    toks = "filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    en = ", ".join(f"'{t}'" for t in STOPWORDS["en"])
    n_tokens = F.expr(f"size({toks})")
    stop_hits = F.expr(f"size(filter({toks}, t -> t in ({en})))")
    n_chars = F.length("text")
    punct = n_chars - F.length(F.regexp_replace("text", r"[.,;:!?]", ""))
    score = (
        F.least(n_tokens / 100.0, F.lit(1.0)) * 0.4
        + (1 - F.least(punct / n_chars * 10, F.lit(1.0))) * 0.3
        + F.least(stop_hits / n_tokens * 5, F.lit(1.0)) * 0.3
    )
    from danae_spark.functions.rounding import rnd

    out = src.select(
        "doc_id",
        rnd(score, 6).alias("quality_score"),
        rnd(dup_frac, 6).alias("dup_2gram_frac"),
        rnd(top_frac, 6).alias("top_2gram_frac"),
        (n_pii > 0).cast("int").alias("has_pii"),
    )
    keep = (
        (F.col("quality_score") >= min_quality)
        & (F.col("dup_2gram_frac") <= DUP_2GRAM_MAX)
        & (F.col("top_2gram_frac") <= TOP_2GRAM_MAX)
        & (F.col("has_pii") == 0)
    )
    return out.withColumn("keep", keep.cast("int"))


def curated_publish_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    query_name: str = "curation_publish",
    keep_only: bool = True,
):
    """Replay-safe publish of the curated corpus: each micro-batch lands
    its rows (by default only `keep = 1` survivors) via dynamic partition
    overwrite of its own `batch_id=` partition — the profile_stream.py
    exactly-once pattern. foreachBatch is at-least-once on retry; because
    a replayed batch OVERWRITES its previous attempt's partition instead
    of appending, the published table is idempotent per batch id, so
    kill-and-replay yields byte-identical contents. Returns the
    writeStream handle (availableNow trigger set; call `.start()`)."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df.filter(F.col("keep") == 1) if keep_only else batch_df
        (
            out.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return (
        stream_df.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
    )


def run_curation_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain the curation stream (append mode — stateless) into an
    in-memory table and return it as a batch frame."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
