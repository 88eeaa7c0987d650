"""Media triage — the single-pass mixed-payload dispatcher.

The first operator a real crawl pipeline runs over a binary column is
not a per-format census: it is "what IS each of these 100 TB of
blobs, and what are its headline facts" — one scan that dispatches
every payload to the right decoder and emits a uniform typed row.
This module composes the engine's validated walkers (every one
oracle-checked by its own registry entry) into exactly that pass:

  image    → real pixel decode (PNG/BMP/PPM/PGM/GIF/JPEG)
  audio    → WAV / FLAC / Ogg-Opus/Vorbis / MP3 (ID3 skip), with real
             durations (MP3 via the frame walk, not the header guess)
  video    → MP4 sample tables, FRAGMENTED MP4, WebM/Matroska
  subtitle → SRT / WebVTT cue parse

Output: (media_class, format, duration_ms) — the triage triple every
downstream routing decision keys on. Undecodable or corrupt payloads
yield nulls (each walker's validation applies unchanged), so the
triage pass doubles as the corpus integrity filter.

Scale shape: one mapInPandas pass over doc_id-partitioned rows, no
shuffle beyond the input repartition — identical to the per-format
censuses whose α ≤ 0.9 curves are in SURVEY §6b.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

__all__ = [
    "triage_payload",
    "synth_media",
    "media_triage_frame",
    "media_fingerprint_frame",
    "media_near_dup_frame",
    "media_triage_roundtrip",
    "MEDIA_TRIAGE_ORACLE",
]

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def triage_payload(payload: bytes) -> dict | None:
    """Classify one payload: {'media_class', 'format', 'duration_ms'}
    or None for unrecognized/corrupt bytes."""
    from danae_spark.multimodal.binary import parse_audio_header
    from danae_spark.multimodal.mp3 import parse_mp3_stream
    from danae_spark.multimodal.mp4 import parse_mp4_fragments, parse_mp4_samples
    from danae_spark.multimodal.pixels import decode_pixels
    from danae_spark.multimodal.subtitles import parse_subtitles
    from danae_spark.multimodal.webm import parse_webm

    p = bytes(payload) if payload is not None else b""
    if not p:
        return None

    if (
        p[:8] == _PNG_MAGIC
        or p[:2] == b"BM"
        or p[:2] in (b"P2", b"P3", b"P5", b"P6")
        or p[:4] == b"GIF8"
        or p[:2] == b"\xff\xd8"
        or p[:4] in (b"II*\x00", b"MM\x00*")
    ):
        if decode_pixels(p) is None:
            return None
        fmt = (
            "png" if p[:8] == _PNG_MAGIC
            else "bmp" if p[:2] == b"BM"
            else "gif" if p[:4] == b"GIF8"
            else "jpeg" if p[:2] == b"\xff\xd8"
            else "tiff" if p[:4] in (b"II*\x00", b"MM\x00*")
            else "ppm" if p[:2] in (b"P3", b"P6")
            else "pgm"
        )
        return {"media_class": "image", "format": fmt, "duration_ms": None}

    if len(p) >= 12 and p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        from danae_spark.multimodal.webp import parse_webp

        wp = parse_webp(p)
        if wp is None:
            return None
        return {"media_class": "image", "format": "webp",
                "duration_ms": None}

    if len(p) >= 12 and p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        from danae_spark.multimodal.avi import parse_avi_mjpeg

        avi = parse_avi_mjpeg(p)
        if avi is None:
            return None  # non-MJPG or corrupt: the documented boundary
        return {
            "media_class": "video",
            "format": "avi-mjpeg",
            "duration_ms": avi["n_frames"] * avi["us_per_frame"] // 1000,
        }

    audio = parse_audio_header(p)
    if audio is not None:
        dur = audio["duration_ms"]
        if audio["format"] == "mp3":
            walk = parse_mp3_stream(p)
            if walk is None:
                return None
            dur = walk["duration_ms"]
        return {"media_class": "audio", "format": audio["format"],
                "duration_ms": dur}

    if p[:4] == b"\x1a\x45\xdf\xa3":
        w = parse_webm(p)
        if w is None:
            return None
        return {"media_class": "video", "format": "webm",
                "duration_ms": w["duration_ms"]}

    if len(p) >= 16 and p[4:8] == b"ftyp":
        from danae_spark.multimodal.avif import STILL_BRANDS, parse_avif

        if p[8:12] in STILL_BRANDS:
            # r17: ftyp-brand STILLS (avif/heic/mif1…) are images with a
            # meta-box item tree, not a moov/trak movie — route them to
            # the AVIF/HEIF census instead of the video walk (pre-r17
            # every AVIF in a crawl censused as unknown/corrupt)
            a = parse_avif(p)
            if a is None:
                return None
            return {"media_class": "image", "format": "avif"
                    if a["brand"] in ("avif", "avis") else "heif",
                    "duration_ms": None}

    if len(p) >= 8 and p[4:8] in (b"ftyp", b"styp", b"moov", b"moof"):
        s = parse_mp4_samples(p)
        if s is not None:
            return {"media_class": "video", "format": "mp4",
                    "duration_ms": s["duration_ms"]}
        f = parse_mp4_fragments(p)
        if f is not None:
            return {"media_class": "video", "format": "fmp4",
                    "duration_ms": f["duration_ms"]}
        return None

    sub = parse_subtitles(p)
    if sub is not None:
        return {"media_class": "subtitle", "format": sub["format"],
                "duration_ms": sub["span_ms"]}
    return None


def synth_media(doc_id: int) -> bytes:
    """Doc-deterministic MIXED payload: doc_id % 10 selects the class
    (wav/flac/mp3/image/ogg/mp4/fmp4/webm/srt/id3-mp3); the image
    container decorrelates via doc_id // 10 so the FULL rotation
    (r15: + the three TIFF variants; r16: + webp) appears. Every
    payload is a byte-for-byte real file from the per-format
    synthesizers."""
    import numpy as np

    from danae_spark.multimodal.flac import synth_flac_pcm
    from danae_spark.multimodal.id3 import synth_id3_mp3
    from danae_spark.multimodal.mp3 import synth_mp3_stream
    from danae_spark.multimodal.mp4 import synth_fmp4, synth_mp4
    from danae_spark.multimodal.ogg import synth_ogg
    from danae_spark.multimodal.pixels import (
        _rt_luma,
        _synth_in_format,
        _RT_FORMATS,
        synth_wav_pcm,
    )
    from danae_spark.multimodal.subtitles import synth_subtitles
    from danae_spark.multimodal.webm import synth_webm

    cls = doc_id % 10
    if cls == 0:
        return synth_wav_pcm(doc_id)
    if cls == 1:
        return synth_flac_pcm(doc_id)
    if cls == 2:
        return synth_mp3_stream(doc_id)
    if cls == 3:
        lum = np.array(
            [[_rt_luma(doc_id, y * 8 + x) for x in range(8)] for y in range(8)],
            dtype=np.int64,
        )
        return _synth_in_format(lum, _RT_FORMATS[(doc_id // 10) % len(_RT_FORMATS)])
    if cls == 4:
        return synth_ogg(doc_id)
    if cls == 5:
        return synth_mp4(doc_id)
    if cls == 6:
        return synth_fmp4(doc_id)
    if cls == 7:
        return synth_webm(doc_id)
    if cls == 8:
        return synth_subtitles(doc_id)
    return synth_id3_mp3(doc_id)


_SCHEMA = "doc_id bigint, media_class string, format string, duration_ms bigint"


def media_triage_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Triage over any (id, binary) frame; nulls for unrecognized or
    corrupt payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = triage_payload(payload)
                rows.append({
                    id_col: rid,
                    "media_class": c["media_class"] if c else None,
                    "format": c["format"] if c else None,
                    "duration_ms": c["duration_ms"] if c else None,
                })
            yield pd.DataFrame(
                rows, columns=[id_col, "media_class", "format", "duration_ms"]
            )

    return df.mapInPandas(batches, schema=_SCHEMA.replace("doc_id", id_col, 1))


_FP_SCHEMA = "doc_id bigint, media_class string, dhash bigint"


def media_fingerprint_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """ONE decode pass over a mixed binary column: class dispatch plus
    the class's near-dup fingerprint — 56-bit dHash for decodable
    images, the 63-bit energy-gradient hash for PCM-decodable audio
    (WAV/FLAC). Classes whose samples the engine does not decode
    (mp3/ogg audio, video, subtitles) and corrupt payloads emit a null
    hash: they are triaged, not fingerprinted.

    This is deliberately NOT triage-then-refingerprint: at crawl scale
    the payload decode dominates, so routing and hashing share the
    single mapInPandas pass; the LSH joins downstream run per class on
    this one output. The hash column is named `dhash` so the banded
    join (pixels.image_near_dup, width-parameterized) applies as-is."""
    from danae_spark.multimodal.flac import decode_flac
    from danae_spark.multimodal.pixels import (
        audio_energy_fingerprint,
        decode_pixels,
        decode_wav_samples,
        dhash_bits,
        luma_grid,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                cls = fp = None
                c = triage_payload(payload)
                if c is not None:
                    cls = c["media_class"]
                    p = bytes(payload)
                    if cls == "image":
                        px = decode_pixels(p)
                        if px is not None:
                            fp = dhash_bits(luma_grid(px))
                    elif cls == "audio":
                        decoded = (
                            decode_wav_samples(p)
                            if p[:4] == b"RIFF"
                            else decode_flac(p) if p[:4] == b"fLaC" else None
                        )
                        if decoded is not None:
                            fp = audio_energy_fingerprint(decoded[0])[1]
                rows.append({id_col: rid, "media_class": cls, "dhash": fp})
            yield pd.DataFrame(rows, columns=[id_col, "media_class", "dhash"])

    return df.mapInPandas(batches, schema=_FP_SCHEMA.replace("doc_id", id_col, 1))


def media_near_dup_frame(
    df,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    band_k: int | None = 1,
):
    """End-to-end near-dup over a MIXED binary column: triage + decode
    + fingerprint in one pass, then the banded hamming LSH join runs
    PER CLASS at its hash width (image 56 bits, audio 63) — a WAV and
    a FLAC of the same recording, or a PNG and a BMP of the same
    pixels, pair up across container formats because the fingerprints
    are computed from the DECODED samples.

    Returns (media_class, d1, d2, hamming). band_k defaults to 1 (the
    sub-3e5-docs regime); pass band_k=2 — or band_k=None with the
    per-class counts via auto-selection — for big corpora, exactly as
    in pixels.image_near_dup."""
    from pyspark.sql import functions as F

    from danae_spark.multimodal.pixels import image_near_dup

    fps = media_fingerprint_frame(df, id_col=id_col, payload_col=payload_col)
    fps = fps.withColumnRenamed(id_col, "doc_id") if id_col != "doc_id" else fps
    out = None
    for cls, n_bits in (("image", 56), ("audio", 63)):
        hashes = fps.filter(
            (F.col("media_class") == cls) & F.col("dhash").isNotNull()
        ).select("doc_id", "dhash")
        pairs = image_near_dup(
            hashes, max_hamming=max_hamming, band_k=band_k, n_bits=n_bits
        ).withColumn("media_class", F.lit(cls))
        out = pairs if out is None else out.unionByName(pairs)
    return out.select("media_class", "d1", "d2", "hamming")


def media_triage_roundtrip(spark, sf_dir: str):
    """Oracle-checkable triage: a MIXED corpus (ten classes cycling by
    doc) goes through the one-pass dispatcher; class, format and
    duration are restated in SQL — the duration arithmetic is each
    format's own already-validated oracle fragment, so the triage
    entry certifies the DISPATCH composition on top of them."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                c = triage_payload(synth_media(d))
                rows.append({
                    "doc_id": d,
                    "media_class": c["media_class"] if c else None,
                    "format": c["format"] if c else None,
                    "duration_ms": c["duration_ms"] if c else None,
                })
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_class", "format", "duration_ms"]
            )

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_SCHEMA)
        .orderBy("doc_id")
    )


# duration fragments reuse each format's validated oracle arithmetic
MEDIA_TRIAGE_ORACLE = """
WITH base AS (
  SELECT doc_id, doc_id % 10 AS cls FROM documents
),
-- Ogg-Opus (cls 4, always even docs => opus): sum the TOC config table
ogg_dur AS (
  SELECT b.doc_id,
         CAST(sum(CASE WHEN cfg < 12 THEN (CASE cfg % 4 WHEN 0 THEN 480
                       WHEN 1 THEN 960 WHEN 2 THEN 1920 ELSE 2880 END)
                  WHEN cfg < 16 THEN (CASE cfg % 2 WHEN 0 THEN 480 ELSE 960 END)
                  ELSE (CASE cfg % 4 WHEN 0 THEN 120 WHEN 1 THEN 240
                        WHEN 2 THEN 480 ELSE 960 END) END)
              * 1000 // 48000 AS BIGINT) AS dur
  FROM (
    SELECT b.doc_id, (b.doc_id + g.i) % 32 AS cfg
    FROM base b, generate_series(0, 11) g(i)
    WHERE b.cls = 4 AND g.i < 5 + b.doc_id % 7
  ) t JOIN base b USING (doc_id)
  GROUP BY b.doc_id
),
-- MP4 sample tables (cls 5): max per-track stts duration / timescale
mp4_dur AS (
  SELECT doc_id, CAST(max(duration * 1000 // timescale) AS BIGINT) AS dur
  FROM (
    SELECT b.doc_id,
           (1 + (b.doc_id + t.t) % (10 + (b.doc_id * 7 + t.t * 13) % 40 - 1))
             * (1 + (b.doc_id + t.t) % 100)
           + ((10 + (b.doc_id * 7 + t.t * 13) % 40)
              - (1 + (b.doc_id + t.t) % (10 + (b.doc_id * 7 + t.t * 13) % 40 - 1)))
             * (1 + (b.doc_id * 3 + t.t) % 100) AS duration,
           1000 * (1 + (b.doc_id + t.t) % 3) AS timescale
    FROM base b JOIN generate_series(0, 2) t(t) ON t.t < 1 + b.doc_id % 3
    WHERE b.cls = 5
  ) GROUP BY doc_id
),
-- Fragmented MP4 (cls 6): max per-track sum of run durations / timescale
fmp4_dur AS (
  SELECT doc_id, CAST(max(tdur_ms) AS BIGINT) AS dur
  FROM (
    SELECT s.doc_id, s.t,
           sum(s.dur) * 1000 // (1000 * (1 + (s.doc_id + s.t) % 3)) AS tdur_ms
    FROM (
      SELECT r.doc_id, r.t,
             CASE WHEN r.dur_ps = 1 THEN 10 + (r.doc_id + r.f + k.k) % 20
                  ELSE r.def_dur END AS dur
      FROM (
        SELECT b.doc_id, t.t, f.f,
               5 + (b.doc_id * 3 + f.f * 7 + t.t * 11) % 20 AS cnt,
               CASE WHEN (b.doc_id + t.t) % 2 = 0 THEN 1 ELSE 0 END AS dur_ps,
               CASE WHEN (b.doc_id + t.t) % 4 = 1
                    THEN 15 + (b.doc_id + t.t) % 10
                    ELSE 10 + (b.doc_id + t.t) % 50 END AS def_dur
        FROM base b
        JOIN generate_series(0, 1) t(t) ON t.t < 1 + b.doc_id % 2
        JOIN generate_series(0, 3) f(f) ON f.f < 2 + b.doc_id % 3
        WHERE b.cls = 6
      ) r JOIN generate_series(0, 24) k(k) ON k.k < r.cnt
    ) s GROUP BY s.doc_id, s.t
  ) GROUP BY doc_id
)
SELECT b.doc_id,
       CASE WHEN b.cls IN (0, 1, 2, 4, 9) THEN 'audio'
            WHEN b.cls = 3 THEN 'image'
            WHEN b.cls IN (5, 6, 7) THEN 'video'
            ELSE 'subtitle' END AS media_class,
       CASE b.cls
            WHEN 0 THEN 'wav' WHEN 1 THEN 'flac' WHEN 2 THEN 'mp3'
            WHEN 3 THEN __IMAGE_FORMAT_CASE__
            WHEN 4 THEN 'ogg-opus' WHEN 5 THEN 'mp4' WHEN 6 THEN 'fmp4'
            WHEN 7 THEN 'webm' WHEN 8 THEN 'srt' ELSE 'mp3' END AS format,
       CAST(CASE b.cls
            WHEN 0 THEN 1024 * 1000 // (8000 + (b.doc_id % 8) * 1000)
            WHEN 1 THEN 1024 * 1000 // (8000 + (b.doc_id % 8) * 1000)
            WHEN 2 THEN (3 + b.doc_id % 4) * 1152 * 1000
                        // (CASE b.doc_id % 3 WHEN 0 THEN 44100
                            WHEN 1 THEN 48000 ELSE 32000 END)
            WHEN 4 THEN o.dur
            WHEN 5 THEN m.dur
            WHEN 6 THEN f.dur
            WHEN 7 THEN (1 + b.doc_id % 4) * (400 + (b.doc_id % 7) * 40)
                        + (3 + b.doc_id % 3 - 1) * 30 + b.doc_id % 9
            WHEN 8 THEN (3 + b.doc_id % 6 - 1) * 2000
                        + 500 + (b.doc_id + 3 + b.doc_id % 6 - 1) % 5 * 250
            WHEN 9 THEN (3 + b.doc_id % 4) * 1152 * 1000
                        // (CASE b.doc_id % 3 WHEN 0 THEN 44100
                            WHEN 1 THEN 48000 ELSE 32000 END)
            END AS BIGINT) AS duration_ms
FROM base b
LEFT JOIN ogg_dur o USING (doc_id)
LEFT JOIN mp4_dur m USING (doc_id)
LEFT JOIN fmp4_dur f USING (doc_id)
ORDER BY b.doc_id
"""


def _image_format_case_sql() -> str:
    """Generate the image-rotation CASE from pixels._RT_FORMATS so the
    oracle's modulus and format names can never drift from the Python
    rotation (the exact bug widening 10->13 formats had to fix). Short
    name = leading alpha prefix of the rotation entry (png_gray -> png,
    bmp8_rle -> bmp, tiff_lzw -> tiff), which is what triage_payload
    reports from the sniffed container."""
    import re

    from danae_spark.multimodal.pixels import _RT_FORMATS

    whens = "\n".join(
        "                         WHEN %d THEN '%s'"
        % (i, re.match(r"[a-z]+", f).group(0))
        for i, f in enumerate(_RT_FORMATS)
    )
    return (
        "(CASE (b.doc_id // 10) %% %d\n%s\n"
        "                         ELSE NULL END)" % (len(_RT_FORMATS), whens)
    )


MEDIA_TRIAGE_ORACLE = MEDIA_TRIAGE_ORACLE.replace(
    "__IMAGE_FORMAT_CASE__", _image_format_case_sql()
)
assert "__IMAGE_FORMAT_CASE__" not in MEDIA_TRIAGE_ORACLE
