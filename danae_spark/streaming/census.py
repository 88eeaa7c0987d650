"""Streaming twin of the blob-census layer: unknown blobs land
continuously (an object-store sync writing (id, payload) parquet), and
an ingest planner wants each blob's shape verdict the moment it lands
— which container, how many records, which schema — not at the next
batch sweep.

Every census frame in the layer (csv / json / parquet / sqlite /
access-log / chat / avro / orc) is a STATELESS narrow mapInPandas, so
the streaming twin is the SAME frame function per kind — structural
batch/stream parity (the exif/office/harvest twin pattern), no state
store, no watermark. A malformed blob yields its NULL census row per
the batch reject-whole contract, never a stream crash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_KINDS = {}


def _frames():
    global _KINDS
    if not _KINDS:
        from danae_spark.multimodal.accesslog import access_log_census_frame
        from danae_spark.multimodal.avroblob import avro_census_frame
        from danae_spark.multimodal.csvblob import csv_census_frame
        from danae_spark.multimodal.jsonblob import chat_census_frame, json_census_frame
        from danae_spark.multimodal.avif import avif_census_frame
        from danae_spark.multimodal.cfb import cfb_office_frame
        from danae_spark.multimodal.deltalog import delta_log_census_frame
        from danae_spark.multimodal.iceberg import iceberg_census_frame
        from danae_spark.multimodal.notebook import notebook_extract_frame
        from danae_spark.multimodal.orcblob import orc_census_frame
        from danae_spark.operators.codestats import code_stats_frame
        from danae_spark.multimodal.parquetblob import parquet_census_frame
        from danae_spark.multimodal.sqliteblob import sqlite_census_frame
        from danae_spark.multimodal.svg import svg_census_frame
        from danae_spark.multimodal.stackexchange import se_census_frame
        from danae_spark.multimodal.hudi import hudi_census_frame
        from danae_spark.multimodal.tfrecord import tfrecord_census_frame
        from danae_spark.multimodal.tensors import (
            arrow_census_frame,
            gguf_census_frame,
            npy_census_frame,
            safetensors_census_frame,
        )
        from danae_spark.multimodal.wikitext import wiki_extract_frame

        _KINDS = {
            "csv": csv_census_frame,
            "json": json_census_frame,
            "parquet": parquet_census_frame,
            "sqlite": sqlite_census_frame,
            "access_log": access_log_census_frame,
            "chat": chat_census_frame,
            "avro": avro_census_frame,
            "orc": orc_census_frame,
            "notebook": notebook_extract_frame,
            "code": code_stats_frame,
            # r17: the round's four stateless frames, same twin pattern
            "cfb": cfb_office_frame,
            "avif": avif_census_frame,
            "svg": svg_census_frame,
            "delta": delta_log_census_frame,
            "iceberg": iceberg_census_frame,
            # r17 late adds: corpus-class extractors and the
            # tensor-container censuses, all the same stateless shape
            "wiki": wiki_extract_frame,
            "stackexchange": se_census_frame,
            "safetensors": safetensors_census_frame,
            "npy": npy_census_frame,
            "arrow": arrow_census_frame,
            "gguf": gguf_census_frame,
            "hudi": hudi_census_frame,
            "tfrecord": tfrecord_census_frame,
        }
    return _KINDS


def census_stream(
    stream_df: DataFrame,
    kind: str,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Blob-shape census over a landing stream: stateless append via
    the SAME census frame function the batch path runs. `kind` names
    the census: csv | json | parquet | sqlite | access_log | chat |
    avro | orc | notebook | code | cfb | avif | svg | delta |
    iceberg | wiki | stackexchange | safetensors | npy | arrow |
    gguf | hudi | tfrecord."""
    frames = _frames()
    if kind not in frames:
        raise ValueError(f"unknown census kind {kind!r}; one of {sorted(frames)}")
    return frames[kind](stream_df, id_col=id_col, payload_col=payload_col)
