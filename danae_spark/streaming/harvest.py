"""Streaming twin of text_harvest: crawl blobs land continuously (a
fetcher writing parquet files of (id, payload) rows); the harvest
verdict should flow per micro-batch, not wait for a nightly batch.

harvest_stream is deliberately thin: text_harvest_frame is a
STATELESS mapInPandas (each payload classifies and extracts
independently), which is exactly the operator shape Structured
Streaming runs as a stateless append — no state store, no watermark,
linear scaling with executor count. Shared impl means batch/stream
parity is structural, not re-derived (the curation/zscore twin
pattern): the stream stage calls THE SAME frame function
(tests/test_streaming_harvest.py pins row-identical output over a
micro-batched replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_blob_stream(
    spark: SparkSession, blob_dir: str, id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """File-source stream over a directory of (id, binary) parquet
    files — the shape a fetcher lands. maxFilesPerTrigger=1 gives
    one micro-batch per landed file (deterministic replay in tests)."""
    schema = f"{id_col} long, {payload_col} binary"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(blob_dir)
    )


def harvest_stream(
    stream_df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """text_harvest over a blob stream: stateless append, no state
    store — the SAME frame function as the batch path."""
    from danae_spark.multimodal.harvest import text_harvest_frame

    return text_harvest_frame(stream_df, id_col=id_col, payload_col=payload_col)
