"""Image normalization — the training-data prep step that turns a
MIXED image blob column into ONE canonical format.

A multimodal corpus arrives as fourteen container formats; training
loaders want one. This operator decodes any payload the engine's real
decoders accept (PNG/BMP/PNM/GIF/JPEG/TIFF/WebP — pixels.decode_pixels
routes them all) and re-encodes it as a canonical PNG:

  - `png_encode` is a REAL general-purpose PNG writer: gray / gray+
    alpha / RGB / RGBA at 8 bits, per-row filter 0, one zlib IDAT,
    CRC-correct chunks — the counterpart of the luma-only synth_png;
  - losslessness is CERTIFIED end-to-end: the registered oracle
    re-decodes the normalized PNG and restates the luma digests as
    the SAME doc arithmetic as the source rotation, so a bug in
    either the source decoder, the PNG writer, or the PNG reader
    breaks the value hash;
  - lossy sources (JPEG) pass through the same plumbing — their
    digests certify the decode-reencode path preserves the DECODED
    pixels exactly (normalization must never add a second generation
    loss);
  - undecodable payloads yield NULL rows (reject-whole).

Scale shape: one narrow Arrow map per frame (decode + encode are
per-row CPU, embarrassingly parallel), no shuffle.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, Optional

import numpy as np

__all__ = [
    "png_encode",
    "normalize_image",
    "image_normalize_frame",
    "image_normalize_roundtrip",
    "IMAGE_NORMALIZE_ORACLE",
]

_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> PNG color type


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body)))


def png_encode(px: np.ndarray) -> bytes:
    """(h, w, c) uint8, c in 1/2/3/4 -> a real 8-bit PNG (filter-0
    rows, single IDAT)."""
    h, w, c = px.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    hdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    raw = bytearray()
    flat = np.ascontiguousarray(px, dtype=np.uint8)
    for y in range(h):
        raw.append(0)  # filter type 0
        raw += flat[y].tobytes()
    return (b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", hdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def normalize_image(payload: bytes) -> Optional[dict]:
    """Any decodable image payload -> {'src_format', 'width',
    'height', 'channels', 'png'}; None for undecodable bytes."""
    from danae_spark.multimodal.pixels import decode_pixels
    from danae_spark.multimodal.triage import triage_payload

    px = decode_pixels(bytes(payload))
    if px is None:
        return None
    t = triage_payload(bytes(payload))
    return {
        "src_format": t["format"] if t else None,
        "width": px.shape[1],
        "height": px.shape[0],
        "channels": px.shape[2],
        "png": png_encode(px),
    }


_SCHEMA = (
    "doc_id bigint, src_format string, width int, height int, "
    "channels int, png binary"
)


def image_normalize_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Normalization over any (id, binary) frame: one narrow Arrow
    map emitting the canonical PNG bytes; NULL rows for rejects."""
    import pandas as pd

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                r = normalize_image(bytes(payload)) if payload is not None else None
                rows.append({
                    "doc_id": int(rid),
                    "src_format": r["src_format"] if r else None,
                    "width": r["width"] if r else None,
                    "height": r["height"] if r else None,
                    "channels": r["channels"] if r else None,
                    "png": r["png"] if r else None,
                })
            yield pd.DataFrame(
                rows, columns=["doc_id", "src_format", "width", "height",
                               "channels", "png"],
            )

    return df.select(
        df[id_col].cast("bigint").alias("doc_id"), df[payload_col].alias("payload")
    ).mapInPandas(batches, schema=_SCHEMA)


_RT_SCHEMA = (
    "doc_id bigint, src_format string, out_format string, width int, "
    "height int, channels int, pixel_sum bigint, dhash bigint"
)


def image_normalize_roundtrip(spark, sf_dir: str):
    """Oracle roundtrip certifying LOSSLESS normalization end-to-end:
    per doc the full 14-format rotation image is synthesized, decoded
    by its real decoder, re-encoded as canonical PNG, RE-DECODED by
    the real PNG reader, and the final luma digests restated as the
    SAME doc arithmetic as the source — format unification with zero
    generation loss."""
    from danae_spark.catalog import load_table
    from danae_spark.multimodal.pixels import (
        _RT_FORMATS,
        decode_pixels,
        dhash_bits,
        luma_grid,
        synth_image,
    )
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                r = normalize_image(synth_image(d))
                row = {"doc_id": d, "src_format": None, "out_format": None,
                       "width": None, "height": None, "channels": None,
                       "pixel_sum": None, "dhash": None}
                if r is not None:
                    redecoded = decode_pixels(r["png"])
                    if redecoded is not None:
                        lum = luma_grid(redecoded)
                        row.update({
                            "src_format": _RT_FORMATS[d % len(_RT_FORMATS)],
                            "out_format": "png",
                            "width": redecoded.shape[1],
                            "height": redecoded.shape[0],
                            "channels": redecoded.shape[2],
                            "pixel_sum": int(lum.sum()),
                            "dhash": dhash_bits(lum),
                        })
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=["doc_id", "src_format", "out_format", "width",
                               "height", "channels", "pixel_sum", "dhash"],
            )

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_RT_SCHEMA)
        .orderBy("doc_id")
    )


def _oracle() -> str:
    from danae_spark.multimodal.pixels import _RT_FORMATS, _RT_GRAY

    n = len(_RT_FORMATS)
    whens = " ".join(f"WHEN {i} THEN '{f}'" for i, f in enumerate(_RT_FORMATS))
    gray = ", ".join(str(i) for i, f in enumerate(_RT_FORMATS) if f in _RT_GRAY)
    return f"""
WITH g AS (
  SELECT d.doc_id, s.i, (d.doc_id * 31 + s.i * 7) % 256 AS p
  FROM documents d, generate_series(0, 63) s(i)
),
m AS (
  SELECT doc_id, CAST(sum(p) AS BIGINT) AS pixel_sum FROM g GROUP BY doc_id
),
dh AS (
  SELECT l.doc_id,
         CAST(sum(CASE WHEN l.p < r.p
                       THEN (CAST(1 AS BIGINT) << ((l.i // 8) * 7 + (l.i % 8)))
                       ELSE 0 END) AS BIGINT) AS dhash
  FROM g l JOIN g r ON l.doc_id = r.doc_id AND r.i = l.i + 1
  WHERE l.i % 8 < 7 GROUP BY l.doc_id
)
SELECT m.doc_id,
       CASE m.doc_id % {n} {whens} END AS src_format,
       'png' AS out_format,
       8 AS width, 8 AS height,
       CASE WHEN m.doc_id % {n} IN ({gray}) THEN 1 ELSE 3 END AS channels,
       m.pixel_sum, dh.dhash
FROM m JOIN dh USING (doc_id)
ORDER BY m.doc_id
"""


IMAGE_NORMALIZE_ORACLE = _oracle()
