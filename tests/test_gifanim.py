"""Animated-GIF frame decode + compositing (multimodal/gifanim.py)."""

from __future__ import annotations

import random
import struct

import numpy as np

from danae_spark.multimodal.gifanim import (
    gf_luma,
    parse_gif_frames,
    synth_gif_anim,
)
from danae_spark.multimodal.pixels import _lzw_encode, dhash_bits, luma_grid


def _blocks(data: bytes, min_code: int = 8) -> bytes:
    out = bytearray([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _gce(disposal: int = 0, delay: int = 0, transparent: int | None = None) -> bytes:
    f = (disposal << 2) | (1 if transparent is not None else 0)
    return b"\x21\xf9\x04" + bytes([f]) + struct.pack("<H", delay) + bytes(
        [transparent or 0]
    ) + b"\x00"


def _img(left: int, top: int, w: int, h: int, idx: bytes, interlace: bool = False) -> bytes:
    return (
        b"\x2c"
        + struct.pack("<HHHHB", left, top, w, h, 0x40 if interlace else 0)
        + _blocks(_lzw_encode(idx, 8))
    )


def _gif(w: int, h: int, bg: int, body: bytes) -> bytes:
    hdr = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 0x07, bg, 0)
    gct = bytes(v for i in range(256) for v in (i, i, i))
    return hdr + gct + body + b"\x3b"


def test_roundtrip_and_digest_arithmetic():
    for d in (0, 1, 3, 4, 7, 12, 14, 27):
        r = parse_gif_frames(synth_gif_anim(d))
        assert r is not None and r["n_frames"] == 2 + d % 3
        grid = np.array(
            [[gf_luma(d, 0, y * 8 + x) for x in range(8)] for y in range(8)],
            dtype=np.int64,
        )
        assert r["dhash_first"] == dhash_bits(grid)
    assert parse_gif_frames(synth_gif_anim(2)) is None  # truncated leg


def test_partial_rect_transparency_composite():
    """Frame 2 draws a 4x4 rect at (2,2) with a transparent hole; the
    digest must equal the hand-composited canvas."""
    f1 = bytes((y * 8 + x) % 256 for y in range(8) for x in range(8))
    f2 = bytes(200 if (y + x) % 2 == 0 else 7 for y in range(4) for x in range(4))
    body = _gce() + _img(0, 0, 8, 8, f1) + _gce(transparent=7) + _img(2, 2, 4, 4, f2)
    r = parse_gif_frames(_gif(8, 8, 0, body))
    assert r is not None and r["n_frames"] == 2
    canvas = np.array([[(y * 8 + x) % 256 for x in range(8)] for y in range(8)])
    for y in range(4):
        for x in range(4):
            if (y + x) % 2 == 0:  # index 7 is transparent: hole
                canvas[2 + y, 2 + x] = 200
    want = dhash_bits(luma_grid(np.repeat(canvas[:, :, None], 3, axis=2).astype(np.uint8)))
    assert r["dhash_xor"] == r["dhash_first"] ^ want


def test_disposal_restore_background_and_previous():
    base = bytes(100 for _ in range(64))
    patch = bytes(250 for _ in range(16))
    # disposal 2: after frame 2, its rect reverts to background (idx 0)
    body = (
        _gce() + _img(0, 0, 8, 8, base)
        + _gce(disposal=2) + _img(2, 2, 4, 4, patch)
        + _gce() + _img(0, 0, 1, 1, bytes([100]))  # tiny frame 3
    )
    r = parse_gif_frames(_gif(8, 8, 0, body))
    assert r is not None and r["n_frames"] == 3
    c3 = np.full((8, 8), 100)
    c3[2:6, 2:6] = 0  # restored to background
    want3 = dhash_bits(luma_grid(np.repeat(c3[:, :, None], 3, axis=2).astype(np.uint8)))
    c2 = np.full((8, 8), 100)
    c2[2:6, 2:6] = 250
    want2 = dhash_bits(luma_grid(np.repeat(c2[:, :, None], 3, axis=2).astype(np.uint8)))
    want1 = dhash_bits(luma_grid(np.repeat(np.full((8, 8, 1), 100), 3, axis=2).astype(np.uint8)))
    assert r["dhash_xor"] == want1 ^ want2 ^ want3
    # disposal 3: frame 3 sees the pre-frame-2 canvas
    body = (
        _gce() + _img(0, 0, 8, 8, base)
        + _gce(disposal=3) + _img(2, 2, 4, 4, patch)
        + _gce() + _img(0, 0, 1, 1, bytes([100]))
    )
    r = parse_gif_frames(_gif(8, 8, 0, body))
    assert r["dhash_xor"] == want1 ^ want2 ^ want1  # frame 3 canvas == frame 1


def test_interlaced_frame():
    rng = random.Random(9)
    lum = [rng.randrange(256) for _ in range(64)]
    # interlaced row order: 0,8 passes per _GIF_INTERLACE_PASSES
    order = [y for y in range(0, 8, 8)] + [y for y in range(4, 8, 8)] + [
        y for y in range(2, 8, 4)
    ] + [y for y in range(1, 8, 2)]
    shuffled = bytes(lum[y * 8 + x] for y in order for x in range(8))
    body = _gce() + _img(0, 0, 8, 8, shuffled, interlace=True)
    r = parse_gif_frames(_gif(8, 8, 0, body))
    grid = np.array(lum, dtype=np.int64).reshape(8, 8)
    assert r["dhash_first"] == dhash_bits(grid)


def test_rejects():
    blob = synth_gif_anim(1)
    assert parse_gif_frames(blob + b"x") is None  # trailing bytes
    assert parse_gif_frames(blob[:-1]) is None  # missing trailer
    # rect outside the canvas
    body = _gce() + _img(6, 6, 4, 4, bytes(16))
    assert parse_gif_frames(_gif(8, 8, 0, body)) is None
    # palette-index overflow: 2-entry local table, index 5 used
    lct_flags = 0x80  # LCT flag, size code 0 -> 2 entries
    img = (
        b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, lct_flags)
        + bytes([10, 10, 10, 20, 20, 20])
        + _blocks(_lzw_encode(bytes([0, 1, 0, 5]), 3), 3)
    )
    assert parse_gif_frames(_gif(2, 2, 0, _gce() + img)) is None
    assert parse_gif_frames(b"") is None
    assert parse_gif_frames(b"GIF89a") is None


def test_fuzz_never_raises():
    rng = random.Random(31)
    blob = synth_gif_anim(9)
    for _ in range(700):
        buf = bytearray(blob)
        i = rng.randrange(len(buf) * 8)
        buf[i >> 3] ^= 1 << (i & 7)
        parse_gif_frames(bytes(buf))
    for _ in range(300):
        parse_gif_frames(bytes(rng.randrange(256) for _ in range(rng.randrange(1, 90))))


def test_docframes_preserves_56bit_ints_next_to_nulls(spark):
    """Regression (r15): a census batch mixing NULL reject rows with
    56-bit digests must come back bit-exact — pandas' default column
    inference coerces int-with-None to float64, which rounds above
    2^53 (this entry's oracle caught it)."""
    from danae_spark.multimodal.gifanim import gif_frames_frame, parse_gif_frames

    blobs = [(d, bytearray(synth_gif_anim(d))) for d in (0, 1, 2, 3, 217)] + [
        (99, None)
    ]
    df = spark.createDataFrame(blobs, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in gif_frames_frame(df).collect()}
    assert got[2]["dhash_first"] is None and got[99]["dhash_first"] is None
    for d in (0, 1, 3, 217):
        want = parse_gif_frames(synth_gif_anim(d))
        assert got[d]["dhash_first"] == want["dhash_first"], d
        assert got[d]["dhash_xor"] == want["dhash_xor"], d
    # the specific value that exposed the bug: odd 56-bit int > 2^53
    assert got[217]["dhash_first"] == 36028797010575359
