"""MJPEG-in-AVI real frame decode — shrinking the video-codec boundary.

The multimodal surface decodes container STRUCTURE for mp4/mkv/ogg
(and rejects entropy-coded codec frames honestly); MJPEG is the one
mainstream video codec whose frames this repo can already decode for
real, because every frame is a complete baseline JPEG
(multimodal/jpegcodec.py). This module walks the RIFF/AVI container
from the spec (AVI RIFF form: LIST hdrl with avih + strl/strh/strf,
LIST movi with 00dc frame chunks, the optional idx1 index — validated
against the frames when present) and decodes EVERY frame through the
real JPEG decoder, producing frame-level perceptual digests — the
thing a video near-dup or sampling pipeline actually needs.

Reject-whole: bad RIFF/AVI magic, chunk overruns, a non-MJPG video
stream (other codecs stay behind the documented NotImplementedError
boundary in multimodal/binary.py), any frame that fails JPEG decode,
an idx1 whose 00dc entry count disagrees with the movi list.

Census row: width, height, channels, us_per_frame (from avih),
n_frames, dhash_first, dhash_xor (XOR of all frame dHashes — any
single-pixel change in any frame moves it).

The synth side reuses jpeg_pixels_roundtrip's construction: 16×16
frames of 8×8-block-constant luma in exact DC-quant-step multiples,
so the LOSSY codec round-trips exactly and the DuckDB oracle states
every digest as pure (doc_id, frame) arithmetic.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

__all__ = [
    "parse_avi_mjpeg",
    "synth_mjpeg_avi",
    "mjpeg_frames_frame",
    "mjpeg_avi_roundtrip",
    "MJPEG_AVI_ORACLE",
]

_MAX_FRAMES = 100_000
# Real AVI nests LIST at most ~3 deep (RIFF > hdrl > strl, movi > rec);
# a generous cap turns a hostile nested-LIST tower into a reject-whole
# instead of an uncaught RecursionError crashing the Spark task.
_MAX_LIST_DEPTH = 32


class _Bad(Exception):
    pass


def _chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) walking a RIFF chunk run."""
    while pos < end:
        if pos + 8 > end:
            raise _Bad
        fcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > end:
            raise _Bad
        yield fcc, body, size
        pos = body + size + (size & 1)  # chunks are word-aligned


def parse_avi_mjpeg(payload: bytes) -> Optional[dict]:
    try:
        return _parse(payload)
    except (_Bad, struct.error, IndexError, ValueError, RecursionError):
        return None


def _parse(payload: bytes) -> Optional[dict]:
    from danae_spark.multimodal.jpegcodec import decode_jpeg
    from danae_spark.multimodal.pixels import dhash_bits, luma_grid

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if 8 + riff_size > len(payload):
        raise _Bad
    end = 8 + riff_size

    us_per_frame = None
    avih_frames = None
    handler_ok = False
    width = height = None
    frames: list[bytes] = []
    idx1_dc = None

    def walk(pos: int, stop: int, in_strl: bool = False, depth: int = 0) -> None:
        nonlocal us_per_frame, avih_frames, handler_ok, width, height, idx1_dc
        if depth > _MAX_LIST_DEPTH:
            raise _Bad  # hostile nested-LIST tower: reject, don't recurse out
        for fcc, body, size in _chunks(payload, pos, stop):
            if fcc == b"LIST":
                if size < 4:
                    raise _Bad
                kind = payload[body : body + 4]
                walk(body + 4, body + size, in_strl=(kind == b"strl"),
                     depth=depth + 1)
            elif fcc == b"avih":
                if size < 40:
                    raise _Bad
                us_per_frame = struct.unpack_from("<I", payload, body)[0]
                avih_frames = struct.unpack_from("<I", payload, body + 16)[0]
                width = struct.unpack_from("<I", payload, body + 32)[0]
                height = struct.unpack_from("<I", payload, body + 36)[0]
            elif fcc == b"strh" and in_strl:
                if size < 8:
                    raise _Bad
                if payload[body : body + 4] == b"vids":
                    if payload[body + 4 : body + 8] != b"MJPG":
                        raise _Bad  # other codecs: documented boundary
                    handler_ok = True
            elif fcc == b"00dc":
                frames.append(payload[body : body + size])
                if len(frames) > _MAX_FRAMES:
                    raise _Bad
            elif fcc == b"idx1":
                n = size // 16
                idx1_dc = 0
                for i in range(n):
                    if payload[body + 16 * i : body + 16 * i + 4] == b"00dc":
                        idx1_dc += 1

    walk(12, end)
    if not handler_ok or us_per_frame is None or not frames:
        return None
    if avih_frames is not None and avih_frames != len(frames):
        raise _Bad
    if idx1_dc is not None and idx1_dc != len(frames):
        raise _Bad  # the index lied about the frame list
    dhashes = []
    ch = None
    for blob in frames:
        px = decode_jpeg(blob)
        if px is None:
            return None  # one undecodable frame rejects the file
        if px.shape[1] != width or px.shape[0] != height:
            raise _Bad
        ch = px.shape[2]
        dhashes.append(dhash_bits(luma_grid(px)))
    acc = 0
    for h in dhashes:
        acc ^= h
    return {
        "width": width,
        "height": height,
        "channels": ch,
        "us_per_frame": us_per_frame,
        "n_frames": len(frames),
        "dhash_first": dhashes[0],
        "dhash_xor": acc,
    }


# ----------------------------------------------------------- synthesis
#
# Arithmetic (restated in MJPEG_AVI_ORACLE):
#   n_frames = 2 + d % 3; us_per_frame = 40000 + (d % 7) * 1000
#   color frames when d % 2 == 1 (constant chroma -> R=G=B=Y)
#   frame f block (by, bx) luma = ((d*31 + f*17 + (by*2+bx)*37) % 16) * 16
#   d % 23 == 5 -> last frame chunk truncated (reject leg)


def mj_block_luma(d: int, f: int, by: int, bx: int) -> int:
    return ((d * 31 + f * 17 + (by * 2 + bx) * 37) % 16) * 16


def _frame_jpeg(d: int, f: int) -> bytes:
    from danae_spark.multimodal.jpegcodec import synth_jpeg

    blocks = np.array(
        [[mj_block_luma(d, f, by, bx) for bx in range(2)] for by in range(2)],
        dtype=np.int64,
    )
    lum = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    return synth_jpeg(lum, color=bool(d % 2))


def _chunk(fcc: bytes, body: bytes) -> bytes:
    return fcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def synth_mjpeg_avi(d: int) -> bytes:
    n_frames = 2 + d % 3
    usf = 40000 + (d % 7) * 1000
    w = h = 16
    jpegs = [_frame_jpeg(d, f) for f in range(n_frames)]
    if d % 23 == 5:
        jpegs[-1] = jpegs[-1][: len(jpegs[-1]) // 2]  # truncated frame
    avih = struct.pack(
        "<IIIIIIIIII",
        usf, 0, 0, 0x10, n_frames, 0, 1, 0, w, h,
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 25, 0, n_frames, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D, w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi_body = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_body)
    # idx1: offsets relative to movi list body start (after 'movi' tag)
    idx = bytearray()
    off = 4
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) & 1)
    idx1 = _chunk(b"idx1", bytes(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, us_per_frame int, "
    "n_frames int, dhash_first bigint, dhash_xor bigint"
)
_COLS = [
    "width",
    "height",
    "channels",
    "us_per_frame",
    "n_frames",
    "dhash_first",
    "dhash_xor",
]


def mjpeg_frames_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """MJPEG-AVI frame-digest census over any (id, binary) frame: one
    Arrow-batched narrow map, no shuffle (multimodal/docframes.py)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(
        df, parse_avi_mjpeg, _COLS, _SCHEMA, id_col, payload_col
    )


def mjpeg_avi_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real MJPEG AVI (RIFF
    hdrl/strl headers, per-frame baseline JPEGs through the real
    encoder, a consistent idx1 index, a truncated-frame reject leg) is
    synthesized, every frame decoded by the real JPEG decoder, and the
    frame digests restated as (doc_id, frame) arithmetic."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(
        spark, sf_dir, synth_mjpeg_avi, parse_avi_mjpeg, _COLS, _SCHEMA
    )


MJPEG_AVI_ORACLE = """
WITH d0 AS (SELECT doc_id, doc_id AS d FROM documents),
-- per (doc, frame, grid cell): block-constant luma after 8x8 resize
g AS (
  SELECT d0.doc_id, d0.d, f.f, s.i,
         ((d0.d * 31 + f.f * 17
           + (((s.i // 8) // 4) * 2 + ((s.i % 8) // 4)) * 37) % 16) * 16 AS p
  FROM d0, generate_series(0, 4) f(f), generate_series(0, 63) s(i)
  WHERE f.f < 2 + d0.d % 3
),
dh AS (
  SELECT l.doc_id, l.d, l.f,
         CAST(sum(CASE WHEN l.p < r.p
                       THEN (CAST(1 AS BIGINT) << ((l.i // 8) * 7 + (l.i % 8)))
                       ELSE 0 END) AS BIGINT) AS dhash
  FROM g l JOIN g r ON l.doc_id = r.doc_id AND l.f = r.f AND r.i = l.i + 1
  WHERE l.i % 8 < 7
  GROUP BY l.doc_id, l.d, l.f
),
agg AS (
  SELECT doc_id, d,
         CAST(count(*) AS INT) AS n_frames,
         max(CASE WHEN f = 0 THEN dhash END) AS dhash_first,
         bit_xor(dhash) AS dhash_xor
  FROM dh GROUP BY doc_id, d
)
SELECT doc_id,
       CASE WHEN d % 23 = 5 THEN NULL ELSE 16 END AS width,
       CASE WHEN d % 23 = 5 THEN NULL ELSE 16 END AS height,
       CASE WHEN d % 23 = 5 THEN NULL
            WHEN d % 2 = 1 THEN 3 ELSE 1 END AS channels,
       CASE WHEN d % 23 = 5 THEN NULL
            ELSE CAST(40000 + (d % 7) * 1000 AS INT) END AS us_per_frame,
       CASE WHEN d % 23 = 5 THEN NULL ELSE n_frames END AS n_frames,
       CASE WHEN d % 23 = 5 THEN NULL ELSE dhash_first END AS dhash_first,
       CASE WHEN d % 23 = 5 THEN NULL
            ELSE CAST(bit_xor AS BIGINT) END AS dhash_xor
FROM (SELECT doc_id, d, n_frames, dhash_first,
             CAST(dhash_xor AS BIGINT) AS bit_xor FROM agg) t
ORDER BY doc_id
"""
