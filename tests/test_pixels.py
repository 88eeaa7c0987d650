"""Real pixel decode (multimodal/pixels.py): decoder round-trips across
formats and filters, perceptual-hash behavior on variant images, and the
Spark near-dup pipeline on real decoded pixels."""

from __future__ import annotations

import numpy as np
import pytest

from danae_spark.multimodal.pixels import (
    _RT_FORMATS,
    avg_hash_bits,
    decode_pixels,
    dhash_bits,
    dhash_frame,
    image_near_dup,
    luma_grid,
    synth_bmp,
    synth_image,
    synth_png,
    synth_pnm,
)


def _rand_lum(seed, h=16, w=16):
    return np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.int64)


@pytest.mark.parametrize("fmt_ix", range(len(_RT_FORMATS)))
def test_synth_decode_roundtrip_all_formats(fmt_ix):
    n = len(_RT_FORMATS)
    for doc_id in (fmt_ix, fmt_ix + n, fmt_ix + 41 * n):
        px = decode_pixels(synth_image(doc_id))
        assert px is not None, _RT_FORMATS[doc_id % n]
        assert px.shape[:2] == (8, 8)


@pytest.mark.parametrize("ftype", range(5))
def test_png_each_filter_type_roundtrips(ftype):
    """Every PNG row filter (None/Sub/Up/Average/Paeth) must invert
    exactly, gray and RGB."""
    lum = _rand_lum(ftype)
    for rgb in (False, True):
        payload = synth_png(lum, rgb=rgb, filter_of_row=lambda y: ftype)
        px = decode_pixels(payload)
        assert px is not None
        got = px[:, :, 0].astype(np.int64)
        assert (got == lum).all(), f"filter {ftype} rgb={rgb}"


def test_bmp_roundtrip_with_row_padding():
    # width 5 → stride 16 ≠ 15: exercises the 4-byte row padding
    lum = _rand_lum(3, h=4, w=5)
    px = decode_pixels(synth_bmp(lum))
    assert px is not None and px.shape == (4, 5, 3)
    assert (px[:, :, 0].astype(np.int64) == lum).all()


def test_pnm_comment_and_whitespace_header():
    lum = _rand_lum(4, h=3, w=3)
    raw = synth_pnm(lum)
    # inject a comment line into the header
    assert raw.startswith(b"P5\n")
    patched = b"P5\n# a comment\n" + raw[3:]
    px = decode_pixels(patched)
    assert px is not None
    assert (px[:, :, 0].astype(np.int64) == lum).all()


def test_undecodable_and_truncated_payloads_return_none():
    assert decode_pixels(b"") is None
    assert decode_pixels(b"\xff\xd8\xff\xe0 jpeg-ish") is None
    whole = synth_image(7)
    assert decode_pixels(whole[: len(whole) // 2]) is None
    # 16-bit PNG is outside the subset
    lum = _rand_lum(5, 4, 4)
    p = bytearray(synth_png(lum))
    p[24] = 16  # bit depth inside IHDR (crc now wrong too, but depth gates first)
    assert decode_pixels(bytes(p)) is None


def test_perceptual_hash_variant_vs_unrelated():
    """Two single-digit-pixel variants of one 32×32 image hash within a
    tight hamming distance; an unrelated image is far — on REAL decoded
    pixels through the resize path."""
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (32, 32)).astype(np.int64)
    var = base.copy()
    var[3, 4] = (var[3, 4] + 9) % 256
    var[20, 11] = (var[20, 11] + 247) % 256
    unrelated = rng.integers(0, 256, (32, 32)).astype(np.int64)
    h_base = dhash_bits(luma_grid(decode_pixels(synth_png(base, rgb=True))))
    h_var = dhash_bits(luma_grid(decode_pixels(synth_bmp(var))))
    h_un = dhash_bits(luma_grid(decode_pixels(synth_pnm(unrelated))))
    assert bin(h_base ^ h_var).count("1") <= 6
    assert bin(h_base ^ h_un).count("1") > 6
    a_base = avg_hash_bits(luma_grid(decode_pixels(synth_png(base))))
    a_var = avg_hash_bits(luma_grid(decode_pixels(synth_bmp(var))))
    assert bin(a_base ^ a_var).count("1") <= 6


def test_near_dup_pipeline_finds_planted_variants(spark):
    """Spark end-to-end: payloads (mixed formats) → real decode → dHash
    → banded hamming join. The two planted variants of one image pair
    up; the unrelated images don't; an undecodable payload flows
    through the fallback without pairing."""
    rng = np.random.default_rng(23)
    base = rng.integers(0, 256, (16, 16)).astype(np.int64)
    var = base.copy()
    var[2, 2] = (var[2, 2] + 5) % 256
    rows = [
        (0, bytearray(synth_png(base, rgb=True))),
        (1, bytearray(synth_bmp(var))),
        (2, bytearray(synth_pnm(rng.integers(0, 256, (16, 16)).astype(np.int64)))),
        (3, bytearray(b"not an image at all, just bytes " * 4)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = dhash_frame(df)
    got = {r.doc_id: r for r in hashes.collect()}
    assert got[0].decoded and got[1].decoded and got[2].decoded
    assert not got[3].decoded
    pairs = image_near_dup(hashes, max_hamming=4).collect()
    assert [(p.d1, p.d2) for p in pairs] == [(0, 1)]


def test_gif_lzw_roundtrip_shapes_and_compression():
    """Real LZW: random data (worst case), structured data (dictionary
    actually compresses), constant data (repeated table growth), and a
    256×256 image that forces 4096-entry table resets."""
    from danae_spark.multimodal.pixels import synth_gif

    rng = np.random.default_rng(5)
    for shape in [(8, 8), (16, 16), (64, 64), (3, 5), (1, 1)]:
        lum = rng.integers(0, 256, shape).astype(np.int64)
        px = decode_pixels(synth_gif(lum))
        assert px is not None and px.shape == (*shape, 3)
        assert (px[:, :, 0].astype(np.int64) == lum).all(), shape
        assert (px[:, :, 1] == px[:, :, 0]).all()  # grayscale palette
    structured = np.tile(np.arange(64) % 7, (64, 1)).astype(np.int64)
    raw = synth_gif(structured)
    assert (decode_pixels(raw)[:, :, 0].astype(np.int64) == structured).all()
    # dictionary compression must beat the 1-byte-per-pixel floor
    assert len(raw) < structured.size
    big = rng.integers(0, 256, (256, 256)).astype(np.int64)
    assert (decode_pixels(synth_gif(big))[:, :, 0].astype(np.int64) == big).all()


def test_gif_interlaced_decode():
    """Interlaced GIFs deinterlace through the four spec passes: encode
    rows in pass order with the interlace flag set, expect the original
    row order back."""
    import struct as _struct

    from danae_spark.multimodal.pixels import (
        _GIF_INTERLACE_PASSES,
        _lzw_encode,
        synth_gif,
    )

    rng = np.random.default_rng(9)
    lum = rng.integers(0, 256, (16, 8)).astype(np.int64)
    h, w = lum.shape
    pass_rows = [
        lum[y] for start, step in _GIF_INTERLACE_PASSES for y in range(start, h, step)
    ]
    interleaved = np.stack(pass_rows)
    raw = bytearray(synth_gif(interleaved))
    # flip the interlace bit in the image descriptor (after 13-byte
    # header + 768-byte GCT: 0x2C, left/top/w/h, packed)
    ip = 13 + 768 + 9
    assert raw[13 + 768] == 0x2C
    raw[ip] |= 0x40
    px = decode_pixels(bytes(raw))
    assert px is not None
    assert (px[:, :, 0].astype(np.int64) == lum).all()


def test_wav_pcm_roundtrip_mono_and_stereo():
    """16-bit PCM decode: byte packing, RIFF chunk walk, LE int16,
    channel de-interleave — exact sample equality against the formula."""
    from danae_spark.multimodal.pixels import (
        _pcm_sample,
        audio_energy_fingerprint,
        decode_wav_samples,
        synth_wav_pcm,
    )

    for d in (0, 1, 6, 13):
        samples, rate = decode_wav_samples(synth_wav_pcm(d))
        ch = 1 + d % 2
        assert samples.shape == (1024, ch)
        assert rate == 8000 + (d % 8) * 1000
        for i in (0, 1, 500, 1023):
            for c in range(ch):
                assert samples[i, c] == _pcm_sample(d, i, c)
        total, bits = audio_energy_fingerprint(samples)
        assert total == sum(
            _pcm_sample(d, i, c) ** 2 for i in range(1024) for c in range(ch)
        )
        assert 0 <= bits < (1 << 63)


def test_wav_pcm_out_of_subset_rejected():
    import struct as _s

    from danae_spark.multimodal.pixels import decode_wav_samples, synth_wav_pcm

    raw = bytearray(synth_wav_pcm(3))
    assert decode_wav_samples(bytes(raw[:30])) is None  # truncated
    assert decode_wav_samples(b"RIFFxxxxWAVE") is None  # no chunks
    # non-PCM format code
    p = bytearray(raw)
    fmt_at = bytes(p).find(b"fmt ") + 8
    p[fmt_at : fmt_at + 2] = _s.pack("<H", 3)  # IEEE float
    assert decode_wav_samples(bytes(p)) is None
    # bits patched 16->8 with block_align/byte_rate left at the 16-bit
    # values: an internally-inconsistent header — since r9 the decoder
    # cross-checks block_align == channels*bits/8 (and byte_rate) and
    # rejects rather than reinterpreting 16-bit bytes as 8-bit garbage.
    p = bytearray(raw)
    p[fmt_at + 14 : fmt_at + 16] = _s.pack("<H", 8)
    assert decode_wav_samples(bytes(p)) is None
    # block_align alone corrupted (bits/channels/byte_rate untouched)
    p = bytearray(raw)
    p[fmt_at + 12 : fmt_at + 14] = _s.pack("<H", 7)
    assert decode_wav_samples(bytes(p)) is None
    # byte_rate alone corrupted
    p = bytearray(raw)
    p[fmt_at + 8 : fmt_at + 12] = _s.pack("<I", 1)
    assert decode_wav_samples(bytes(p)) is None


def test_decoders_never_crash_on_arbitrary_bytes():
    """Fuzz: decode_pixels / decode_wav_samples on random and
    prefix-mutated payloads must return a value or None — never raise
    (a crawl feeds these raw bytes inside executor tasks)."""
    import numpy as _np

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from danae_spark.multimodal.jpegcodec import synth_jpeg
    from danae_spark.multimodal.pixels import (
        decode_pixels,
        decode_wav_samples,
        synth_gif,
        synth_image,
        synth_wav_pcm,
    )

    seeds = [
        synth_image(7),
        synth_gif(_np.arange(64).reshape(8, 8).astype(_np.int64)),
        synth_jpeg(_np.zeros((8, 8), dtype=_np.int64)),
        synth_wav_pcm(5),
    ]

    @settings(max_examples=200, deadline=None)
    @given(st.data())
    def fuzz(data):
        mode = data.draw(st.integers(0, 2))
        if mode == 0:
            payload = data.draw(st.binary(min_size=0, max_size=300))
        else:
            base = bytearray(seeds[data.draw(st.integers(0, len(seeds) - 1))])
            if mode == 1:  # truncate
                payload = bytes(base[: data.draw(st.integers(0, len(base)))])
            else:  # flip bytes
                for _ in range(data.draw(st.integers(1, 8))):
                    ix = data.draw(st.integers(0, len(base) - 1))
                    base[ix] = data.draw(st.integers(0, 255))
                payload = bytes(base)
        decode_pixels(payload)
        decode_wav_samples(payload)

    fuzz()


def test_near_dup_banding_complete_at_requested_radius(spark):
    """r7 advisor finding: 4 fixed bands only guaranteed recall for
    hamming < 4. A pair at hamming 6 whose differing bits hit SIX of
    the old 14-bit bands' positions must still pair up under the
    default (max_hamming + 1 = 7 bands), and an under-banded call is
    rejected instead of silently lossy."""
    import pytest

    h1 = 0
    # one flipped bit in each of six 8-bit bands -> hamming 6; under the
    # old 4x14 banding these hit bits 0,8,16,24,32,40 = four distinct
    # 14-bit bands, all of which differ -> zero shared wide bands among
    # the first four... construct to break ALL old bands: bits 0, 14,
    # 28, 42 differ (one per old band) plus 2 more -> hamming 6.
    h2 = (1 << 0) | (1 << 14) | (1 << 28) | (1 << 42) | (1 << 1) | (1 << 15)
    df = spark.createDataFrame(
        [(1, h1, True), (2, h2, True)], "doc_id long, dhash long, decoded boolean"
    )
    pairs = image_near_dup(df, max_hamming=6).collect()
    assert [(p.d1, p.d2, p.hamming) for p in pairs] == [(1, 2, 6)]
    with pytest.raises(ValueError, match="complete only"):
        image_near_dup(df, max_hamming=6, n_bands=4)


def test_near_dup_composite_band_keys_identical_output(spark):
    """band_k=2 (the big-corpus scale knob) must return exactly the
    k=1 pairs: completeness holds for n_bands >= max_hamming + k and
    the verify filter is shared. Includes pairs at the full radius."""
    import pytest
    from pyspark.sql import functions as F

    base = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.abs(F.xxhash64("id")).bitwiseAND(F.lit((1 << 56) - 1)).alias("dhash"),
        F.lit(True).alias("decoded"),
    )
    twins = base.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 2000).alias("doc_id"),
        # hamming exactly 6 from the base: the radius edge
        F.col("dhash").bitwiseXOR(
            F.lit((1 << 2) | (1 << 9) | (1 << 17) | (1 << 25) | (1 << 33) | (1 << 41))
        ).alias("dhash"),
        F.lit(True).alias("decoded"),
    )
    hashes = base.unionByName(twins)
    k1 = {(r.d1, r.d2, r.hamming) for r in image_near_dup(hashes, max_hamming=6).collect()}
    k2 = {(r.d1, r.d2, r.hamming) for r in image_near_dup(hashes, max_hamming=6, band_k=2).collect()}
    assert len(k1) >= 40  # the planted radius-6 twins are all found
    assert k1 == k2
    with pytest.raises(ValueError, match="complete only"):
        image_near_dup(hashes, max_hamming=6, n_bands=7, band_k=2)

    # r9 auto-select: band_k=None picks k at the measured crossover —
    # k=1 below it, k=2 at/above it (driven here by the n_docs hint so
    # the big-corpus branch is exercised without a 300k-row frame).
    from danae_spark.multimodal.pixels import BAND_K_AUTO_CROSSOVER, auto_band_k

    assert auto_band_k(BAND_K_AUTO_CROSSOVER - 1) == 1
    assert auto_band_k(BAND_K_AUTO_CROSSOVER) == 2
    small = image_near_dup(hashes, max_hamming=6, n_docs=1000)
    big = image_near_dup(hashes, max_hamming=6, n_docs=1_000_000)

    # the auto choice actually lands: plan shape (modulo expr ids)
    # equals the explicit-k plan
    import re

    def plan(df):
        return re.sub(r"#\d+", "#x", df._jdf.queryExecution().analyzed().toString())

    assert plan(small) == plan(image_near_dup(hashes, max_hamming=6, band_k=1))
    assert plan(big) == plan(image_near_dup(hashes, max_hamming=6, band_k=2))
    # and the identical-output invariant holds across the switch
    assert {(r.d1, r.d2, r.hamming) for r in big.collect()} == k1


def test_png_adam7_and_16bit_roundtrip_exact():
    """r8: Adam7 interlace (seven independently-filtered sub-images)
    and 16-bit samples (big-endian, high byte kept) decode exactly —
    including non-multiple-of-8 dims where late passes are empty."""
    rng = np.random.default_rng(61)
    for h, w in ((1, 1), (3, 2), (7, 9), (16, 16), (13, 21)):
        lum = rng.integers(0, 256, (h, w)).astype(np.int64)
        for interlace in (False, True):
            for bit_depth in (8, 16):
                for rgb in (False, True):
                    px = decode_pixels(
                        synth_png(
                            lum, rgb=rgb, interlace=interlace, bit_depth=bit_depth
                        )
                    )
                    assert px is not None, (h, w, interlace, bit_depth, rgb)
                    assert (
                        px[:, :, 0].astype(np.int64) == lum
                    ).all(), (h, w, interlace, bit_depth, rgb)


def test_png_16bit_palette_rejected():
    lum = np.zeros((8, 8), dtype=np.int64)
    raw = bytearray(synth_png(lum, bit_depth=16))
    # IHDR color type byte: palette (3) with 16-bit depth is illegal
    ihdr = raw.find(b"IHDR")
    raw[ihdr + 13] = 3
    from danae_spark.multimodal.pixels import decode_pixels as dp

    assert dp(bytes(raw)) is None


def test_png_sub_byte_depths_roundtrip():
    """r8: 1/2/4-bit grayscale PNGs (MSB-first packed scanlines,
    byte-aligned rows, full-range scaling 255/(2^d-1)) decode exactly,
    plain and Adam7-interlaced — PNG depth coverage is now complete."""
    rng = np.random.default_rng(67)
    for d in (1, 2, 4):
        for interlace in (False, True):
            lum = rng.integers(0, 1 << d, (7, 11)).astype(np.int64)
            px = decode_pixels(synth_png(lum, bit_depth=d, interlace=interlace))
            assert px is not None
            expected = lum * 255 // ((1 << d) - 1)
            assert (px[:, :, 0].astype(np.int64) == expected).all(), (d, interlace)


def test_bmp_palettized_and_rle8_roundtrip():
    """r8: 8-bit palettized BMP (identity gray palette), raw and
    BI_RLE8 (encoded runs, absolute runs, EOL/EOB escapes), bottom-up
    and top-down row orders — all decode exactly."""
    from danae_spark.multimodal.pixels import synth_bmp8

    rng = np.random.default_rng(71)
    lum = np.where(
        rng.random((13, 17)) < 0.6, 77, rng.integers(0, 256, (13, 17))
    ).astype(np.int64)
    for rle in (False, True):
        for top_down in (False, True):
            px = decode_pixels(synth_bmp8(lum, rle=rle, top_down=top_down))
            assert px is not None, (rle, top_down)
            assert (px[:, :, 0].astype(np.int64) == lum).all(), (rle, top_down)


def test_wav_pcm_all_integer_depths_roundtrip():
    """r8: the PCM reader covers 8 (unsigned->signed), 16, 24
    (sign-extended 3-byte LE), and 32-bit depths, mono and stereo."""
    from danae_spark.multimodal.pixels import decode_wav_samples, synth_wav

    rng = np.random.default_rng(73)
    for bits, lo, hi in ((8, -128, 128), (16, -(1 << 15), 1 << 15),
                         (24, -(1 << 23), 1 << 23), (32, -(1 << 31), 1 << 31)):
        for channels in (1, 2):
            samples = rng.integers(lo, hi, (257, channels)).astype(np.int64)
            got = decode_wav_samples(synth_wav(samples, bits=bits))
            assert got is not None, (bits, channels)
            arr, rate = got
            assert rate == 8000
            assert (arr.astype(np.int64) == samples).all(), (bits, channels)


def test_audio_near_dup_cluster_structure(spark):
    """The audio near-dup pipeline (real WAV/FLAC decode → 63-bit
    energy-gradient hash → 7×9-bit banded LSH) finds exactly the
    intra-cluster pairs: every C(4,2) pair within a 4-variant base,
    nothing across bases, all within hamming 6."""
    from danae_spark.multimodal.pixels import (
        audio_fp_frame,
        image_near_dup,
        synth_cluster_audio,
    )

    n_docs = 48
    rows = [(d, bytearray(synth_cluster_audio(d))) for d in range(n_docs)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = audio_fp_frame(df)
    assert all(r["decoded"] for r in hashes.collect())
    pairs = image_near_dup(hashes, max_hamming=6, band_k=1, n_bits=63).collect()
    got = {(r["d1"], r["d2"]) for r in pairs}
    expected = {
        (b * 4 + i, b * 4 + j)
        for b in range(n_docs // 4)
        for i in range(4)
        for j in range(i + 1, 4)
    }
    assert got == expected
    assert all(r["hamming"] <= 6 for r in pairs)


def test_audio_fp_frame_container_invariance_and_fallback(spark):
    """WAV and FLAC encodings of the same PCM produce the SAME
    fingerprint (lossless container invariance); garbage falls back to
    decoded=false with the histogram hash."""
    import numpy as np

    from danae_spark.multimodal.flac import synth_flac
    from danae_spark.multimodal.pixels import audio_fp_frame, synth_wav

    arr = np.array([[((i * i * 5 + i) % 900) - 450] for i in range(1024)], dtype=np.int64)
    rows = [
        (1, bytearray(synth_wav(arr, bits=16))),
        (2, bytearray(synth_flac(arr, bits=16, seed=3))),
        (3, bytearray(b"neither container")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in audio_fp_frame(df).collect()}
    assert out[1]["decoded"] and out[2]["decoded"] and not out[3]["decoded"]
    assert out[1]["dhash"] == out[2]["dhash"]


# ------------------------- r15: BMP 16/32-bit + plain (ASCII) PNM


def _bmp32(px, flip=True):
    import struct

    h, w, _ = px.shape
    rows = px[::-1] if flip else px
    body = bytearray()
    for y in range(h):
        for x in range(w):
            r, g, b = rows[y, x]
            body += bytes([b, g, r, 255])
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    hdr += struct.pack(
        "<IiiHHIIiiII", 40, w, h if flip else -h, 1, 32, 0, len(body), 0, 0, 0, 0
    )
    return bytes(hdr) + bytes(body)


def _bmp16(px, masks=None):
    import struct

    h, w, _ = px.shape
    comp = 3 if masks else 0
    m = masks or (0x7C00, 0x03E0, 0x001F)
    data_off = 66 if masks else 54
    body = bytearray()
    pad = (-(w * 2)) % 4
    for y in range(h - 1, -1, -1):
        for x in range(w):
            r, g, b = int(px[y, x, 0]), int(px[y, x, 1]), int(px[y, x, 2])
            if m[1] == 0x07E0:
                v = ((r >> 3) << 11) | ((g >> 2) << 5) | (b >> 3)
            else:
                v = ((r >> 3) << 10) | ((g >> 3) << 5) | (b >> 3)
            body += struct.pack("<H", v)
        body += b"\x00" * pad
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    hdr += struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 16, comp, len(body), 0, 0, 0, 0
    )
    if masks:
        hdr += struct.pack("<III", *masks)
    return bytes(hdr) + bytes(body)


def test_bmp32_decodes_bgra():
    import random

    rng = random.Random(3)
    px = np.array(
        [[[rng.randrange(256) for _ in range(3)] for _ in range(8)] for _ in range(8)],
        dtype=np.uint8,
    )
    got = decode_pixels(_bmp32(px))
    assert got is not None and got.shape == (8, 8, 4)
    assert (got[:, :, :3] == px).all() and (got[:, :, 3] == 255).all()
    got = decode_pixels(_bmp32(px, flip=False))  # top-down negative height
    assert (got[:, :, :3] == px).all()


def test_bmp16_555_and_565_bit_replication():
    import random

    rng = random.Random(5)
    px = (
        np.array(
            [[[rng.randrange(256) for _ in range(3)] for _ in range(8)] for _ in range(8)],
            dtype=np.uint8,
        )
        & 0xF8
    )
    got = decode_pixels(_bmp16(px))
    want = (px.astype(int) | (px.astype(int) >> 5)).astype(np.uint8)
    assert (got == want).all()
    assert decode_pixels(_bmp16(px, masks=(0xF800, 0x07E0, 0x001F))) is not None
    # nonstandard masks: out of subset, reject
    assert decode_pixels(_bmp16(px, masks=(0xF000, 0x0F00, 0x00F0))) is None


def test_plain_ascii_pnm():
    p2 = b"P2\n# comment\n4 2\n255\n" + b" ".join(
        str((i * 37) % 256).encode() for i in range(8)
    )
    got = decode_pixels(p2)
    assert got.shape == (2, 4, 1)
    assert got.flatten().tolist() == [(i * 37) % 256 for i in range(8)]
    p3 = b"P3 2 2 255 " + b" ".join(str((i * 11) % 256).encode() for i in range(12))
    assert decode_pixels(p3).shape == (2, 2, 3)
    assert decode_pixels(b"P2 2 2 255 1 2 3") is None  # short sample list
    assert decode_pixels(b"P2 2 2 255 1 2 3 4 5") is None  # trailing sample
    assert decode_pixels(b"P3 1 1 255 300 0 0") is None  # out-of-range value
