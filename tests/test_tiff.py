"""TIFF baseline pixel decode (multimodal/tiff.py, r15)."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from danae_spark.multimodal.tiff import (
    _packbits_decode,
    _packbits_encode,
    _tiff_lzw_decode,
    _tiff_lzw_encode,
    decode_tiff,
    synth_tiff,
)


def _lum(n: int, seed: int) -> np.ndarray:
    rng = random.Random(seed)
    return np.array(
        [[rng.randrange(256) for _ in range(n)] for _ in range(n)], dtype=np.int64
    )


@pytest.mark.parametrize("variant", ["tiff_gray", "tiff_pack", "tiff_lzw"])
@pytest.mark.parametrize("n", [3, 8, 32])
def test_roundtrip_all_variants(variant: str, n: int) -> None:
    lum = _lum(n, n * 7 + len(variant))
    px = decode_tiff(synth_tiff(lum, variant))
    assert px is not None
    want_c = 1 if variant == "tiff_gray" else 3
    assert px.shape == (n, n, want_c)
    for c in range(want_c):
        assert (px[:, :, c] == lum).all()


def test_dispatched_from_decode_pixels() -> None:
    from danae_spark.multimodal.pixels import decode_pixels

    lum = _lum(8, 3)
    for variant in ("tiff_gray", "tiff_pack", "tiff_lzw"):
        px = decode_pixels(synth_tiff(lum, variant))
        assert px is not None and (px[:, :, 0] == lum).all()


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_lzw_roundtrip_property(data: bytes) -> None:
    assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == bytearray(data)


def test_lzw_width_bumps_and_clear_reset() -> None:
    # low-entropy megabyte crosses every width (9..12) and the 4094
    # CLEAR reset multiple times
    rng = random.Random(5)
    data = bytes(rng.randrange(3) for _ in range(300_000))
    assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == bytearray(data)


def test_lzw_requires_eoi() -> None:
    enc = _tiff_lzw_encode(b"abcabcabc")
    assert _tiff_lzw_decode(enc[:-1] + b"\xff", 9) is None or True  # no crash
    # stream cut before EOI: reject
    assert _tiff_lzw_decode(enc[: len(enc) // 2], 9) is None


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_packbits_roundtrip_property(data: bytes) -> None:
    assert _packbits_decode(_packbits_encode(data), len(data)) == bytearray(data)


def test_packbits_noop_byte() -> None:
    # 0x80 is a spec no-op between runs
    assert _packbits_decode(b"\x80\x00A\x80", 1) == bytearray(b"A")


def test_photometric_zero_inverts() -> None:
    lum = _lum(8, 11)
    blob = bytearray(synth_tiff(lum, "tiff_gray"))
    # tag 262 value lives in the IFD; flip photometric 1 -> 0
    ifd_off = struct.unpack_from("<L", blob, 4)[0]
    (n,) = struct.unpack_from("<H", blob, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag = struct.unpack_from("<H", blob, base)[0]
        if tag == 262:
            struct.pack_into("<H", blob, base + 8, 0)
    px = decode_tiff(bytes(blob))
    assert px is not None
    assert (px[:, :, 0] == (255 - lum)).all()


def test_palette_tiff_decodes_rgb() -> None:
    # hand-build a 4x4 palette TIFF: indexes 0..15, colormap maps index
    # i to (i*17, 255-i*17, i*4) scaled into 16-bit
    w = h = 4
    idx = bytes(range(16))
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    off_px = len(out)
    out += idx
    ifd_off = len(out)
    struct.pack_into("<L", out, 4, ifd_off)
    cmap = (
        [i * 17 * 257 for i in range(256)]
        + [(255 - i * 17) * 257 if i < 16 else 0 for i in range(256)]
        + [i * 4 * 257 if i < 64 else 0 for i in range(256)]
    )
    entries = [
        (256, 3, 1, struct.pack("<H", w)),
        (257, 3, 1, struct.pack("<H", h)),
        (258, 3, 1, struct.pack("<H", 8)),
        (259, 3, 1, struct.pack("<H", 1)),
        (262, 3, 1, struct.pack("<H", 3)),
        (273, 4, 1, struct.pack("<L", off_px)),
        (277, 3, 1, struct.pack("<H", 1)),
        (278, 3, 1, struct.pack("<H", h)),
        (279, 4, 1, struct.pack("<L", len(idx))),
        (320, 3, 768, struct.pack("<768H", *[v & 0xFFFF for v in cmap])),
    ]
    n = len(entries)
    ifd = bytearray(struct.pack("<H", n))
    extra = bytearray()
    extra_base = ifd_off + 2 + 12 * n + 4
    for tag, typ, count, raw in entries:
        ifd += struct.pack("<HHL", tag, typ, count)
        if len(raw) <= 4:
            ifd += raw.ljust(4, b"\x00")
        else:
            ifd += struct.pack("<L", extra_base + len(extra))
            extra += raw
    ifd += struct.pack("<L", 0)
    px = decode_tiff(bytes(out + ifd + extra))
    assert px is not None and px.shape == (4, 4, 3)
    flat = px.reshape(16, 3)
    for i in range(16):
        assert tuple(flat[i]) == (
            (i * 17 * 257 & 0xFFFF) >> 8,
            ((255 - i * 17) * 257 & 0xFFFF) >> 8,
            (i * 4 * 257 & 0xFFFF) >> 8,
        )


def test_rejects_out_of_subset() -> None:
    lum = _lum(8, 13)
    blob = bytearray(synth_tiff(lum, "tiff_gray"))
    ifd_off = struct.unpack_from("<L", blob, 4)[0]
    (n,) = struct.unpack_from("<H", blob, ifd_off)

    def with_tag(tag_num: int, value: int) -> bytes:
        b = bytearray(blob)
        for i in range(n):
            base = ifd_off + 2 + 12 * i
            if struct.unpack_from("<H", b, base)[0] == tag_num:
                struct.pack_into("<H", b, base + 8, value)
        return bytes(b)

    assert decode_tiff(with_tag(258, 16)) is None  # 16-bit samples
    assert decode_tiff(with_tag(259, 6)) is None  # JPEG-in-TIFF
    assert decode_tiff(with_tag(262, 5)) is None  # CMYK
    assert decode_tiff(b"II*\x00") is None  # truncated header
    assert decode_tiff(b"") is None


def test_fuzz_never_raises() -> None:
    rng = random.Random(17)
    blob = synth_tiff(_lum(8, 19), "tiff_lzw")
    for _ in range(1200):
        buf = bytearray(blob)
        i = rng.randrange(len(buf) * 8)
        buf[i >> 3] ^= 1 << (i & 7)
        decode_tiff(bytes(buf))
    for cut in range(len(blob)):
        decode_tiff(blob[:cut])
    for _ in range(600):
        decode_tiff(bytes(rng.randrange(256) for _ in range(rng.randrange(1, 80))))
