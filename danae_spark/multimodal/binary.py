"""Multimodal (binary) column plumbing.

Treats media as opaque `binary` payload columns with typed metadata,
processed by Arrow-batched `mapInPandas` — the pattern a 100 TB
image/audio pipeline needs: payloads stay in executor-local Arrow
batches, the UDF emits fixed-schema metadata, and partitioning is by
payload hash so decode work balances.

The actual codec decode is STUBBED (`decode_image` raises
NotImplementedError — no image/audio libs in this container); a
deterministic fake "decode" derives metadata from payload bytes so the
plumbing (schema, batching, UDF signature) is real and testable
end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from danae_spark.catalog import load_table

META_SCHEMA = (
    "doc_id bigint, byte_size int, sha256 string, width int, height int, channels int"
)


def decode_image(payload: bytes) -> dict:
    """Real codec decode — NOT IMPLEMENTED in this container (no PIL/
    ffmpeg). The deterministic fake below stands in so the distributed
    plumbing is exercised."""
    raise NotImplementedError("image codecs unavailable; use fake_decode_meta")


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic stand-in for decode: metadata derived from bytes."""
    size = len(payload)
    return {
        "byte_size": size,
        "sha256": hashlib.sha256(payload).hexdigest(),
        "width": size % 640,
        "height": size % 480,
        "channels": 3,
    }


def _extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [fake_decode_meta(p) for p in pdf["payload"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payloads (UTF-8 document bytes standing in for media blobs)
    → metadata extraction via mapInPandas."""
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return docs.mapInPandas(_extract_meta, schema=META_SCHEMA).orderBy("doc_id")


MULTIMODAL_META_ORACLE = """
    SELECT doc_id,
           octet_length(encode(text)) AS byte_size,
           sha256(text) AS sha256,
           octet_length(encode(text)) % 640 AS width,
           octet_length(encode(text)) % 480 AS height,
           3 AS channels
    FROM documents ORDER BY doc_id
    """
