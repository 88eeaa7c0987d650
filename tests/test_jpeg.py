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
    # 12-bit precision is out of subset
    assert patched(lambda p: p.__setitem__(sof + 4, 12)) is None
    # 16-bit quant tables (Pq=1) are out of subset
    dqt = raw.find(b"\xff\xdb")
    assert patched(lambda p: p.__setitem__(dqt + 4, 0x10)) is None
    # truncated entropy stream → graceful None
    assert decode_jpeg(bytes(raw[: len(raw) // 2])) is None
    assert decode_jpeg(b"\xff\xd8\xff\xe0 not a real jpeg") is None


def test_sampling_factors_ignored_for_single_component_scan():
    """T.81 A.2.2: a single-component scan is never interleaved, so SOF
    sampling factors must not change its block layout (r7 rejected
    these files; r8 decodes them)."""
    lum = _block_constant(5, 2, 2)
    raw = bytearray(synth_jpeg(lum))
    sof = raw.find(b"\xff\xc0")
    raw[sof + 11] = 0x22  # claim 2x2 sampling on the only component
    px = decode_jpeg(bytes(raw))
    assert px is not None
    assert (px[:, :, 0].astype(np.int64) == lum).all()


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


def test_fdct_matches_t81_formula():
    """Cross-check the matrix FDCT against the literal T.81 A.3.3
    double-sum — pins the coefficient scale to the SPEC, not to our own
    IDCT (the r7 advisor found a 2x self-consistent-only scale here)."""
    from danae_spark.multimodal.jpegcodec import _fdct, _idct

    rng = np.random.default_rng(21)
    block = rng.integers(0, 256, (8, 8)).astype(np.float64) - 128.0
    ref = np.zeros((8, 8))
    for v in range(8):
        for u in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (
                        block[y, x]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            ref[v, u] = 0.25 * cu * cv * s
    assert np.abs(_fdct(block) - ref).max() < 1e-9
    assert np.abs(_idct(ref) - block).max() < 1e-9


def test_420_block_constant_exact_roundtrip():
    """4:2:0 MCU-interleaved encode/decode: block-constant luma in DC
    quant multiples + neutral chroma reconstructs exactly through the
    subsampled path (2x2 Y blocks per MCU, chroma upsample)."""
    lum = _block_constant(17, 4, 6)  # 32x48, multiple of 16
    px = decode_jpeg(synth_jpeg(lum, color=True, subsample="420"))
    assert px is not None and px.shape == (32, 48, 3)
    for c in range(3):
        assert (px[:, :, c].astype(np.int64) == lum).all()


def test_420_with_restart_markers():
    """DRI/RSTn: restart every 2 MCUs — byte-aligned RSTn markers in the
    stream, DC predictors reset on both sides, exact reconstruction."""
    lum = _block_constant(19, 4, 4)  # 32x32 -> 4 MCUs at 4:2:0
    raw = synth_jpeg(lum, color=True, subsample="420", restart_interval=2)
    assert b"\xff\xdd" in raw  # DRI segment
    sos = raw.find(b"\xff\xda")
    ent = raw[sos:]
    assert any(bytes([0xFF, 0xD0 + i]) in ent for i in range(8))
    px = decode_jpeg(raw)
    assert px is not None
    for c in range(3):
        assert (px[:, :, c].astype(np.int64) == lum).all()


def test_444_and_gray_with_restart_markers():
    lum = _block_constant(23, 3, 3)
    for kwargs in ({"color": False}, {"color": True}):
        raw = synth_jpeg(lum, restart_interval=3, **kwargs)
        px = decode_jpeg(raw)
        assert px is not None
        assert (px[:, :, 0].astype(np.int64) == lum).all()


def test_420_nonneutral_chroma_color_conversion():
    """Constant non-neutral chroma through the 4:2:0 path: decoded RGB
    must match the BT.601 conversion within the lossy bound."""
    lum = np.full((16, 16), 128, dtype=np.int64)
    px = decode_jpeg(
        synth_jpeg(lum, color=True, subsample="420", chroma=(90, 170))
    )
    assert px is not None
    r = 128 + 1.402 * (170 - 128)
    g = 128 - 0.344136 * (90 - 128) - 0.714136 * (170 - 128)
    b = 128 + 1.772 * (90 - 128)
    got = px.astype(np.float64)
    assert abs(got[:, :, 0].mean() - r) < 12
    assert abs(got[:, :, 1].mean() - g) < 12
    assert abs(got[:, :, 2].mean() - b) < 12


def test_420_lossy_bound_general_image():
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (32, 32)).astype(np.int64)
    px = decode_jpeg(synth_jpeg(img, color=True, subsample="420",
                                restart_interval=1))
    assert px is not None and px.shape == (32, 32, 3)
    assert np.abs(px[:, :, 0].astype(np.float64) - img).mean() < 12


def test_fill_bytes_and_stray_length_less_markers_in_walk():
    """B.1.1.2: optional 0xFF fill bytes before a marker and standalone
    TEM markers must not derail the marker walk."""
    lum = _block_constant(31, 2, 2)
    raw = synth_jpeg(lum)
    sof = raw.find(b"\xff\xc0")
    # a fill byte and a TEM marker injected between segments
    patched = raw[:sof] + b"\xff" + raw[sof:]
    assert (decode_jpeg(patched)[:, :, 0].astype(np.int64) == lum).all()
    patched = raw[:sof] + b"\xff\x01" + raw[sof:]
    assert (decode_jpeg(patched)[:, :, 0].astype(np.int64) == lum).all()


def test_progressive_decodes_identical_to_sequential():
    """Progressive vs sequential JPEG differ ONLY in entropy-coding
    order — the reconstructed quantized coefficients are the same, so
    decode must be bit-identical. Random images exercise DC first/
    refine, AC-first EOB runs, and AC-refine correction bits."""
    from danae_spark.multimodal.jpegcodec import synth_jpeg_progressive

    rng = np.random.default_rng(41)
    for trial in range(6):
        h8, w8 = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        img = rng.integers(0, 256, (h8 * 8, w8 * 8)).astype(np.int64)
        color = bool(trial % 2)
        chroma = (
            (int(rng.integers(0, 256)), int(rng.integers(0, 256)))
            if color
            else (128, 128)
        )
        seq = decode_jpeg(synth_jpeg(img, color=color, chroma=chroma))
        prog = decode_jpeg(
            synth_jpeg_progressive(img, color=color, chroma=chroma)
        )
        assert prog is not None
        assert (prog == seq).all(), f"trial {trial}"


def test_progressive_with_restart_markers():
    """RSTn inside progressive scans: DC predictors, EOB runs, and the
    refinement bit stream all reset/align correctly."""
    from danae_spark.multimodal.jpegcodec import synth_jpeg_progressive

    rng = np.random.default_rng(43)
    img = rng.integers(0, 256, (32, 24)).astype(np.int64)
    for ri in (1, 2, 5):
        raw = synth_jpeg_progressive(img, color=True, restart_interval=ri)
        assert b"\xff\xdd" in raw
        prog = decode_jpeg(raw)
        seq = decode_jpeg(synth_jpeg(img, color=True))
        assert prog is not None and (prog == seq).all(), f"ri={ri}"


def test_progressive_block_constant_exact():
    """The lossy-oracle construction survives the progressive path: DC
    multiples reconstruct exactly through shifted first scans plus
    refinements."""
    from danae_spark.multimodal.jpegcodec import synth_jpeg_progressive

    lum = _block_constant(47, 3, 3)
    px = decode_jpeg(synth_jpeg_progressive(lum))
    assert px is not None
    assert (px[:, :, 0].astype(np.int64) == lum).all()


def test_progressive_dispatches_through_decode_pixels():
    from danae_spark.multimodal.jpegcodec import synth_jpeg_progressive

    lum = _block_constant(53, 2, 2)
    px = decode_pixels(synth_jpeg_progressive(lum))
    assert px is not None and (px[:, :, 0].astype(np.int64) == lum).all()


def test_progressive_rejects_malformed_scan_headers():
    """A SOF2 frame with a baseline-shaped (Ss=0, Se=63) scan is not a
    legal progressive stream and must return None, not garbage."""
    lum = _block_constant(59, 2, 2)
    raw = bytearray(synth_jpeg(lum))
    sof = raw.find(b"\xff\xc0")
    raw[sof + 1] = 0xC2  # claim progressive, keep the baseline scan
    assert decode_jpeg(bytes(raw)) is None
