"""Streaming twin of the link-graph builder: WARC captures land
continuously (a fetcher writing parquet files of (id, payload) rows);
the outlink edges should flow per micro-batch — the feed a continuous
frontier/PageRank refresh consumes.

links_stream is deliberately thin: page_links_frame is a STATELESS
mapInPandas (each capture extracts independently), exactly the
operator shape Structured Streaming runs as a stateless append — no
state store, no watermark, linear scaling with executor count. Shared
impl means batch/stream parity is structural, not re-derived (the
harvest/curation twin pattern; tests/test_streaming_links.py pins
row-identical output over a micro-batched replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def links_stream(
    stream_df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """page_links over a WARC-blob stream: stateless append — the
    SAME frame function as the batch path."""
    from danae_spark.operators.frontier import page_links_frame

    return page_links_frame(stream_df, id_col=id_col, payload_col=payload_col)
