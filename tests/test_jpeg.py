"""Baseline JPEG codec (multimodal/jpegcodec.py): exact block-constant
round-trips, lossy error bounds on general images, spec-subset
rejection, and the decode_pixels dispatch."""

from __future__ import annotations

import struct

import numpy as np

from danae_spark.multimodal.jpegcodec import Q_STEP, decode_jpeg, synth_jpeg
from danae_spark.multimodal.pixels import decode_pixels


def _block_constant(seed, h8=4, w8=4):
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 16, (h8, w8)) * Q_STEP
    return np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1).astype(np.int64)


def test_block_constant_exact_roundtrip_gray_and_color():
    """Block-constant images in DC-quant multiples reconstruct EXACTLY
    (all AC zero, DC quantizes without error) — including the
    differential DC prediction chain across 16 blocks."""
    for color in (False, True):
        lum = _block_constant(3)
        px = decode_jpeg(synth_jpeg(lum, color=color))
        assert px is not None
        assert px.shape == (32, 32, 3 if color else 1)
        assert (px[:, :, 0].astype(np.int64) == lum).all(), f"color={color}"
        if color:
            assert (px[:, :, 1] == px[:, :, 0]).all()
            assert (px[:, :, 2] == px[:, :, 0]).all()


def test_lossy_bounds_on_general_images():
    """Random (worst-case) and smooth images decode within the error a
    flat q=16 quantizer implies — the general entropy-decode + IDCT
    path with nonzero AC coefficients, runs, and EOBs."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 16)).astype(np.int64)
    px = decode_jpeg(synth_jpeg(img))
    assert px is not None and px.shape == (24, 16, 1)
    assert np.abs(px[:, :, 0].astype(np.float64) - img).mean() < 12
    xs, ys = np.meshgrid(np.arange(16), np.arange(16))
    smooth = (128 + 60 * np.sin(xs / 5) * np.cos(ys / 7)).astype(np.int64)
    px = decode_jpeg(synth_jpeg(smooth))
    assert np.abs(px[:, :, 0].astype(np.float64) - smooth).mean() < 4


def test_roundtrip_determinism_and_stuffing():
    """Same input → same bytes; entropy segment must not contain a bare
    0xFF followed by a non-zero non-marker byte (stuffing check)."""
    lum = _block_constant(11)
    a, b = synth_jpeg(lum), synth_jpeg(lum)
    assert a == b
    # between SOS payload start and EOI, every 0xFF is followed by 0x00
    sos = a.find(b"\xff\xda")
    seg_len = struct.unpack(">H", a[sos + 2 : sos + 4])[0]
    ent = a[sos + 2 + seg_len : -2]
    i = 0
    while i < len(ent) - 1:
        if ent[i] == 0xFF:
            assert ent[i + 1] == 0x00, f"unstuffed 0xFF at {i}"
            i += 2
        else:
            i += 1


def test_out_of_subset_variants_rejected():
    lum = _block_constant(5, 2, 2)
    raw = bytearray(synth_jpeg(lum))

    def patched(mutate):
        p = bytearray(raw)
        mutate(p)
        return decode_jpeg(bytes(p))

    sof = raw.find(b"\xff\xc0")
    # progressive (SOF2) is out of subset
    assert patched(lambda p: p.__setitem__(sof + 1, 0xC2)) is None
    # chroma subsampling (2x2 sampling factors) is out of subset
    assert patched(lambda p: p.__setitem__(sof + 11, 0x22)) is None
    # truncated entropy stream → graceful None
    assert decode_jpeg(bytes(raw[: len(raw) // 2])) is None
    assert decode_jpeg(b"\xff\xd8\xff\xe0 not a real jpeg") is None


def test_decode_pixels_dispatch_and_hashing():
    """decode_pixels routes JPEG payloads to the codec, and the
    perceptual-hash stack works on the decoded pixels."""
    from danae_spark.multimodal.pixels import dhash_bits, luma_grid

    lum = _block_constant(13, 2, 2)  # 16x16
    px = decode_pixels(synth_jpeg(lum, color=True))
    assert px is not None and px.shape == (16, 16, 3)
    assert (px[:, :, 0].astype(np.int64) == lum).all()
    h = dhash_bits(luma_grid(px))
    assert isinstance(h, int) and 0 <= h < (1 << 56)
