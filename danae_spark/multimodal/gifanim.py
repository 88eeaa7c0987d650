"""Animated-GIF frame census — real multi-frame decode + compositing.

Animated GIFs are ubiquitous crawl content, and with MJPEG-in-AVI
(multimodal/avi.py) they are the second moving-image family this repo
can decode frames for REAL: every frame is GIF-LZW (the decoder in
multimodal/pixels.py), and animation semantics are compositing rules
from the GIF89a spec, implemented here —

  - the logical-screen canvas (background color from the global color
    table), per-frame image descriptors with PARTIAL RECTS drawn at
    (left, top), local color tables overriding the global one,
    interlaced frames;
  - Graphic Control Extensions: per-frame delay, transparency index
    (transparent pixels leave the canvas unchanged), and all three
    disposal methods — keep (0/1), restore-to-background (2: the
    frame's rect reverts to the background color before the next
    frame), restore-to-previous (3: the pre-frame canvas returns);
  - NETSCAPE 2.0 looping extension (loop count);
  - reject-whole: truncated/overrun blocks, LZW underflow/overflow
    vs the declared rect, palette-index overflow, rects outside the
    canvas, missing trailer, trailing bytes after the trailer.

Census row: width, height, n_frames, total_delay_ms, loop_count,
dhash_first, dhash_xor — the same frame-digest shape as
mjpeg_avi_frames, feeding animation near-dup and sampling decisions.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

__all__ = [
    "parse_gif_frames",
    "synth_gif_anim",
    "gif_frames_frame",
    "gif_anim_roundtrip",
    "GIF_ANIM_ORACLE",
]

_MAX_FRAMES = 10_000
_MAX_PIXELS = 64 * 1024 * 1024
# The per-frame dhash scans the WHOLE canvas, so the real work is
# width*height*n_frames — capping pixels and frames independently still
# lets a few-hundred-KB GIF (64MP canvas x 10k 1-pixel frames) force
# ~640 gigapixel of CPU. Bound the product.
_MAX_WORK = 256 * 1024 * 1024


class _Bad(Exception):
    pass


def _subblocks(p: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks until the 0 terminator."""
    out = bytearray()
    while True:
        if pos >= len(p):
            raise _Bad
        n = p[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(p):
            raise _Bad
        out += p[pos : pos + n]
        pos += n


def parse_gif_frames(payload: bytes) -> Optional[dict]:
    try:
        return _parse(payload)
    except (_Bad, struct.error, IndexError, ValueError):
        return None


def _parse(payload: bytes) -> Optional[dict]:
    from danae_spark.multimodal.pixels import (
        _GIF_INTERLACE_PASSES,
        _lzw_decode,
        dhash_bits,
        luma_grid,
    )

    p = payload
    if len(p) < 13 or p[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack_from("<HH", p, 6)
    flags, bg_index, _aspect = p[10], p[11], p[12]
    if w == 0 or h == 0 or w * h > _MAX_PIXELS:
        return None
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        if pos + 3 * n > len(p):
            raise _Bad
        gct = np.frombuffer(p, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    bg_rgb = gct[bg_index] if gct is not None and bg_index < len(gct) else np.zeros(3, np.uint8)
    canvas = np.tile(bg_rgb.astype(np.uint8), (h, w, 1))

    delay_cs = 0
    transparent: int | None = None
    disposal = 0
    loop_count = None
    total_delay_cs = 0
    dhashes: list[int] = []
    saw_trailer = False

    while pos < len(p):
        b = p[pos]
        pos += 1
        if b == 0x3B:  # trailer
            saw_trailer = True
            break
        if b == 0x21:  # extension
            if pos >= len(p):
                raise _Bad
            label = p[pos]
            pos += 1
            blob, pos = _subblocks(p, pos)
            if label == 0xF9:
                if len(blob) != 4:
                    raise _Bad
                f = blob[0]
                disposal = (f >> 2) & 7
                delay_cs = blob[1] | (blob[2] << 8)
                transparent = blob[3] if f & 1 else None
            elif label == 0xFF and blob[:11] == b"NETSCAPE2.0":
                if len(blob) >= 14 and blob[11] == 1:
                    loop_count = blob[12] | (blob[13] << 8)
            continue
        if b != 0x2C:  # image descriptor is the only other block type
            raise _Bad
        if pos + 9 > len(p):
            raise _Bad
        left, top, fw, fh = struct.unpack_from("<HHHH", p, pos)
        iflags = p[pos + 8]
        pos += 9
        if fw == 0 or fh == 0 or left + fw > w or top + fh > h:
            raise _Bad
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            if pos + 3 * n > len(p):
                raise _Bad
            pal = np.frombuffer(p, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise _Bad  # no color table at all
        if pos >= len(p):
            raise _Bad
        min_code = p[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise _Bad
        data, pos = _subblocks(p, pos)
        idx = _lzw_decode(data, min_code, fw * fh)
        if idx is None or len(idx) != fw * fh:
            raise _Bad
        grid = np.frombuffer(bytes(idx), dtype=np.uint8).reshape(fh, fw)
        if iflags & 0x40:  # interlaced: rows arrive in four passes
            de = np.empty_like(grid)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                for y in range(start, fh, step):
                    de[y] = grid[src]
                    src += 1
            grid = de
        if int(grid.max()) >= len(pal):
            raise _Bad
        prev = canvas.copy() if disposal == 3 else None
        rect = canvas[top : top + fh, left : left + fw]
        colors = pal[grid]
        if transparent is not None:
            mask = grid != transparent
            rect[mask] = colors[mask]
        else:
            rect[:] = colors
        if len(dhashes) >= _MAX_FRAMES:
            raise _Bad
        if (len(dhashes) + 1) * w * h > _MAX_WORK:
            raise _Bad  # pixels x frames work budget (CPU-DoS guard)
        dhashes.append(dhash_bits(luma_grid(canvas)))
        total_delay_cs += delay_cs
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = bg_rgb
        elif disposal == 3 and prev is not None:
            canvas = prev
        delay_cs = 0
        transparent = None
        disposal = 0
    if not saw_trailer or not dhashes:
        raise _Bad
    if pos != len(p):
        raise _Bad  # bytes after the trailer
    acc = 0
    for d in dhashes:
        acc ^= d
    return {
        "width": w,
        "height": h,
        "n_frames": len(dhashes),
        "total_delay_ms": total_delay_cs * 10,
        "loop_count": loop_count,
        "dhash_first": dhashes[0],
        "dhash_xor": acc,
    }


# ----------------------------------------------------------- synthesis
#
# Arithmetic (restated in GIF_ANIM_ORACLE):
#   8x8 canvas; n_frames = 2 + d % 3; frame f full-rect luma
#   p(d, f, i) = (d*31 + f*17 + i*7) % 256 over the 256-gray palette
#   (palette (i,i,i) makes luma == index, so digests are arithmetic);
#   GCE delay per frame = 4 + (d + f) % 6 centiseconds;
#   NETSCAPE loop count = d % 4;
#   d % 13 == 2 -> last frame's data truncated (reject leg)


def gf_luma(d: int, f: int, i: int) -> int:
    return (d * 31 + f * 17 + i * 7) % 256


def synth_gif_anim(d: int, grid: int = 8) -> bytes:
    from danae_spark.multimodal.pixels import _lzw_encode

    w = h = grid
    n_frames = 2 + d % 3
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
    out += bytes(v for i in range(256) for v in (i, i, i))
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", d % 4) + b"\x00"
    for f in range(n_frames):
        delay = 4 + (d + f) % 6
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        data = _lzw_encode(
            bytes(gf_luma(d, f, y * w + x) for y in range(h) for x in range(w)), 8
        )
        blocks = bytearray([8])
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            blocks.append(len(chunk))
            blocks += chunk
        blocks.append(0)
        if d % 13 == 2 and f == n_frames - 1:
            blocks = blocks[: max(3, len(blocks) // 2)]  # truncated frame
        out += blocks
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, width int, height int, n_frames int, "
    "total_delay_ms int, loop_count int, dhash_first bigint, dhash_xor bigint"
)
_COLS = [
    "width",
    "height",
    "n_frames",
    "total_delay_ms",
    "loop_count",
    "dhash_first",
    "dhash_xor",
]


def gif_frames_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Animated-GIF frame-digest census over any (id, binary) frame:
    one Arrow-batched narrow map, no shuffle (docframes.py)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(
        df, parse_gif_frames, _COLS, _SCHEMA, id_col, payload_col
    )


def gif_anim_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real animated GIF
    (full-rect gray frames through the real LZW encoder, per-frame
    GCE delays, a NETSCAPE loop block, a truncated-frame reject leg)
    is decoded frame by frame and composited; digests and timing
    restated as (doc_id, frame) arithmetic. Partial rects,
    transparency, local palettes, interlace, and all three disposal
    methods are pinned by direct compositing pytests
    (tests/test_gifanim.py) — the oracle rotation keeps frames
    full-rect so luma stays pure arithmetic."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(
        spark, sf_dir, synth_gif_anim, parse_gif_frames, _COLS, _SCHEMA
    )


GIF_ANIM_ORACLE = """
WITH d0 AS (SELECT doc_id, doc_id AS d FROM documents),
g AS (
  SELECT d0.doc_id, d0.d, f.f, s.i,
         (d0.d * 31 + f.f * 17 + s.i * 7) % 256 AS p
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
         CAST(sum((4 + (d + f) % 6) * 10) AS INT) AS total_delay_ms,
         max(CASE WHEN f = 0 THEN dhash END) AS dhash_first,
         CAST(bit_xor(dhash) AS BIGINT) AS dhash_xor
  FROM dh GROUP BY doc_id, d
)
SELECT doc_id,
       CASE WHEN d % 13 = 2 THEN NULL ELSE 8 END AS width,
       CASE WHEN d % 13 = 2 THEN NULL ELSE 8 END AS height,
       CASE WHEN d % 13 = 2 THEN NULL ELSE n_frames END AS n_frames,
       CASE WHEN d % 13 = 2 THEN NULL ELSE total_delay_ms END AS total_delay_ms,
       CASE WHEN d % 13 = 2 THEN NULL ELSE CAST(d % 4 AS INT) END AS loop_count,
       CASE WHEN d % 13 = 2 THEN NULL ELSE dhash_first END AS dhash_first,
       CASE WHEN d % 13 = 2 THEN NULL ELSE dhash_xor END AS dhash_xor
FROM agg ORDER BY doc_id
"""
