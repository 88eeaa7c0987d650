"""Multimodal transform plumbing: decode → resize / frame-sample /
feature-extract over binary payload columns.

Everything Spark-side is real and tested — schemas, Arrow batch shapes,
`mapInPandas` signatures, partition-by-payload-hash balancing. Since r7,
PIXEL decode is REAL for PNG/BMP/PPM/PGM/GIF/baseline-JPEG (multimodal/pixels.py — used by
the oracle-verified image_pixels_roundtrip / image_near_dup entries);
the codec calls HERE remain STUBBED (`NotImplementedError` behind
`_require_codecs`) with deterministic byte-derived fakes standing in
for what still needs a codec library (out-of-subset JPEG variants,
entropy-coded video frames — though since r15 MJPEG-in-AVI frames
decode for REAL via multimodal/avi.py + jpegcodec.py, and TIFF via
multimodal/tiff.py), so the pipeline runs end-to-end in this container
and swaps to PIL/ffmpeg by replacing two functions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from danae_spark.catalog import load_table

RESIZE_SCHEMA = (
    "doc_id bigint, out_width int, out_height int, out_bytes int, content_hash string"
)
FRAMES_SCHEMA = "doc_id bigint, frame_index int, frame_offset_bytes int, frame_hash string"
FEATURES_SCHEMA = "doc_id bigint, dim int, feature double"


def _require_codecs() -> None:
    """Real decode path — unavailable here (no PIL/ffmpeg in container)."""
    raise NotImplementedError(
        "media codecs are not installed; production deployments replace "
        "_fake_resize/_fake_frames with PIL/ffmpeg-backed versions"
    )


def _fake_resize(payload: bytes, width: int, height: int) -> tuple[int, str]:
    """Deterministic stand-in for decode+resize+encode: output size scales
    with target area; hash binds output to payload content + params."""
    out_bytes = max(1, (width * height * 3) // 97)
    h = hashlib.sha256(payload + f":{width}x{height}".encode()).hexdigest()[:16]
    return out_bytes, h


def resize_images(
    payloads: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """payloads: (doc_id, payload binary) → resize metadata via
    mapInPandas (Arrow-batched; one Python roundtrip per batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = [_fake_resize(p, width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "out_width": width,
                    "out_height": height,
                    "out_bytes": [o[0] for o in outs],
                    "content_hash": [o[1] for o in outs],
                }
            )

    return payloads.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(payloads: DataFrame, n_frames: int = 4) -> DataFrame:
    """Treat the payload as a 'video' and emit n evenly-spaced 'frames'
    (row-explosion shape: one input row → n output rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                size = max(len(p), 1)
                for i in range(n_frames):
                    off = (i * size) // n_frames
                    rows.append(
                        (
                            doc_id,
                            i,
                            off,
                            hashlib.sha256(p[off : off + 64]).hexdigest()[:16],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_index", "frame_offset_bytes", "frame_hash"]
            )

    return payloads.mapInPandas(run, schema=FRAMES_SCHEMA)


def extract_features(payloads: DataFrame, dim: int = 8) -> DataFrame:
    """Byte-histogram 'embedding' per payload (deterministic feature
    extraction shape: one row in → dim rows out, long format)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(p, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                total = max(int(hist.sum()), 1)
                for d in range(dim):
                    rows.append((doc_id, d, round(float(hist[d]) / total, 6)))
            yield pd.DataFrame(rows, columns=["doc_id", "dim", "feature"])

    return payloads.mapInPandas(run, schema=FEATURES_SCHEMA)


def document_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF-8 document bytes standing in for media blobs, repartitioned by
    payload hash so decode work spreads evenly regardless of source
    file layout."""
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return docs.repartition(F.xxhash64("payload"))


def media_near_dup(
    spark: SparkSession, sf_dir: str, dim: int = 8, tau: float = 0.999
) -> DataFrame:
    """End-to-end media near-dup: payload → feature vector →
    hyperplane-LSH bucket → in-bucket cosine pairs ≥ tau.

    This is the full multimodal dedup pipeline shape a training-data lake
    runs on images/audio (decode + embed via mapInPandas, then the SAME
    bucketed ANN path used for text embeddings) — the deterministic
    byte-histogram feature stands in for a real encoder (codec libs are
    unavailable here; the Spark-side plumbing is the operator under
    test). Byte histograms of same-language text are highly aligned, so
    tau sits close to 1."""
    from danae_spark.functions import vectors
    from danae_spark.functions.rounding import rnd
    from danae_spark.operators.ann import _hyperplanes, lsh_bucket_col

    feats = extract_features(document_payloads(spark, sf_dir), dim=dim)
    vecs = feats.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "feature"))
        ).alias("df_pairs")
    ).select(
        "doc_id",
        F.expr("transform(df_pairs, p -> p.feature)").alias("vec"),
    )
    planes = _hyperplanes(n_planes=4, dim=dim)
    bucketed = vecs.withColumn("bucket", lsh_bucket_col("vec", planes))
    a = bucketed.select(
        F.col("doc_id").alias("d1"), F.col("vec").alias("v1"), "bucket"
    )
    b = bucketed.select(
        F.col("doc_id").alias("d2"), F.col("vec").alias("v2"), "bucket"
    )
    cos = vectors.pair_cosine_udf()
    return (
        a.join(b, "bucket")
        .filter(F.col("d1") < F.col("d2"))
        .withColumn("cosine", rnd(cos("v1", "v2"), 6))
        .filter(F.col("cosine") >= tau)
        .select("d1", "d2", "cosine")
        .orderBy("d1", "d2")
    )
