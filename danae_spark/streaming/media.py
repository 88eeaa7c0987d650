"""Streaming twin of the EXIF media-metadata extractor: image payloads
land continuously (a media fetcher writing parquet files of
(id, payload) rows); the camera/GPS metadata rows should flow per
micro-batch — in particular the GPS-presence PII signal, which a
publishing pipeline wants to know about the moment an image lands,
not at the next batch sweep.

exif_stream is deliberately thin: exif_frame is a STATELESS
mapInPandas (each image decodes independently), exactly the operator
shape Structured Streaming runs as a stateless append — no state
store, no watermark, linear scaling with executor count. Shared impl
means batch/stream parity is structural, not re-derived (the
harvest/curation/links/structured twin pattern;
tests/test_streaming_media.py pins row-identical output over a
micro-batched replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def exif_stream(
    stream_df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """EXIF metadata over an image-blob stream: stateless append — the
    SAME frame function as the batch path."""
    from danae_spark.multimodal.exif import exif_frame

    return exif_frame(stream_df, id_col=id_col, payload_col=payload_col)


def office_stream(
    stream_df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Office-document text over a blob stream (docx/odt packages as
    an uploader lands them): stateless append — office_text_frame is
    a stateless mapInPandas, so the streaming twin is the SAME frame
    function; a corrupt package yields a NULL row per the batch
    reject-whole contract, never a stream crash."""
    from danae_spark.multimodal.office import office_text_frame

    return office_text_frame(stream_df, id_col=id_col, payload_col=payload_col)
