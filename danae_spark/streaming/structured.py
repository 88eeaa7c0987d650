"""Streaming twin of the structured-data extractor: HTML payloads land
continuously (a fetcher writing parquet files of (id, payload) rows);
the JSON-LD / OpenGraph metadata rows should flow per micro-batch —
the feed a continuously-refreshed BM25/metadata index consumes.

structured_stream is deliberately thin: html_structured_frame is a
STATELESS mapInPandas (each page extracts independently), exactly the
operator shape Structured Streaming runs as a stateless append — no
state store, no watermark, linear scaling with executor count. Shared
impl means batch/stream parity is structural, not re-derived (the
harvest/curation/links twin pattern;
tests/test_streaming_structured.py pins row-identical output over a
micro-batched replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def structured_stream(
    stream_df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """html_structured over an HTML-blob stream: stateless append —
    the SAME frame function as the batch path."""
    from danae_spark.multimodal.htmltext import html_structured_frame

    return html_structured_frame(stream_df, id_col=id_col, payload_col=payload_col)
