"""FLAC codec (multimodal/flac.py) — lossless round trip, spec-pinned
bit layout (hand-assembled frames independent of the encoder),
corruption rejection, and Spark plumbing."""

import hashlib

import numpy as np
import pytest

from danae_spark.multimodal.flac import (
    crc8,
    crc16,
    decode_flac,
    flac_pcm_frame,
    synth_flac,
    synth_flac_pcm,
    _flac_params,
    _flac_sample,
)


# ------------------------------------------------- external check values


def test_crc_check_vectors():
    """CRC-8 (poly 0x07) and CRC-16 (poly 0x8005, CRC-16/BUYPASS) against
    their published '123456789' check values — external pins, so a
    mis-built table can't silently self-agree between encode and decode."""
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


# ----------------------------------------------------- lossless roundtrip


def test_lossless_roundtrip_doc_grid():
    """Every doc decodes to EXACTLY the samples that were encoded — all
    depths (8/16/24), mono/stereo, every subframe type the seed cycle
    picks — with CRC-8/CRC-16 and the STREAMINFO MD5 verified inside
    decode_flac."""
    for d in range(24):
        rate, bits, channels, m = _flac_params(d)
        out = decode_flac(synth_flac_pcm(d, 512))
        assert out is not None, d
        samples, r = out
        assert r == rate and samples.shape == (512, channels)
        exp = np.array(
            [[_flac_sample(d, i, c, m) for c in range(channels)] for i in range(512)]
        )
        assert (samples == exp).all(), d


def test_roundtrip_exercises_every_subframe_type():
    """The doc grid must hit constant, verbatim, all five fixed orders,
    LPC, both Rice methods and at least one escape partition — otherwise
    the round-trip proves less than it claims."""
    import danae_spark.multimodal.flac as fl

    seen_kinds = set()
    seen_methods = set()
    escapes = 0
    orig_sub, orig_res = fl._decode_subframe, fl._decode_residual

    def spy_sub(r, bs, bps):
        p0 = r.pos
        r.bits(1)
        t = r.bits(6)
        r.pos = p0
        if t == 0:
            seen_kinds.add("constant")
        elif t == 1:
            seen_kinds.add("verbatim")
        elif 8 <= t <= 12:
            seen_kinds.add(f"fixed{t - 8}")
        elif t >= 32:
            seen_kinds.add("lpc")
        return orig_sub(r, bs, bps)

    def spy_res(r, bs, order):
        nonlocal escapes
        p0 = r.pos
        m = r.bits(2)
        r.bits(4)
        pbits = 4 if m == 0 else 5
        if r.bits(pbits) == (1 << pbits) - 1:
            escapes += 1
        r.pos = p0
        seen_methods.add(m)
        return orig_res(r, bs, order)

    fl._decode_subframe, fl._decode_residual = spy_sub, spy_res
    try:
        for d in range(60):
            assert fl.decode_flac(synth_flac_pcm(d, 1024)) is not None, d
    finally:
        fl._decode_subframe, fl._decode_residual = orig_sub, orig_res

    assert {"constant", "verbatim", "fixed0", "fixed1", "fixed2", "fixed3",
            "fixed4", "lpc"} <= seen_kinds
    assert seen_methods == {0, 1}
    assert escapes > 0


def test_stereo_decorrelation_modes_roundtrip():
    """All four channel assignments reconstruct exactly, including the
    odd mid/side case (side LSB carries the dropped mid bit)."""
    arr = np.array([[5, -2], [7, 7], [-128, 127], [1, 0]] * 64, dtype=np.int64)
    for seed in range(4):  # frame-0 decor cycles with seed: None,8,9,10
        out = decode_flac(synth_flac(arr, rate=8000, bits=16, seed=seed))
        assert out is not None, seed
        assert (out[0] == arr).all(), seed


# ------------------------------------- spec-pinned hand-assembled frames


class _Bits:
    """Minimal MSB-first assembler local to the tests — deliberately NOT
    the module's _Writer, so these fixtures pin the spec, not the
    encoder."""

    def __init__(self):
        self.s = ""

    def put(self, v, n):
        self.s += format(v & ((1 << n) - 1), f"0{n}b")

    def bytes(self) -> bytes:
        s = self.s + "0" * (-len(self.s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _streaminfo(rate, channels, bits, n, md5):
    b = _Bits()
    b.put(16, 16)  # min block
    b.put(16, 16)  # max block
    b.put(0, 24)
    b.put(0, 24)
    b.put(rate, 20)
    b.put(channels - 1, 3)
    b.put(bits - 1, 5)
    b.put(n, 36)
    body = b.bytes() + md5
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def test_handbuilt_fixed_order1_frame():
    """A frame assembled bit-by-bit from RFC 9639's field layout: mono
    8-bit, 16 samples 10..25 as FIXED order 1 with Rice(param=1)
    residuals. Pins unary polarity (q zero-bits then a 1), the zigzag
    mapping (+1 → 2 → quotient 1 remainder 0 → bits 0,1,0), the
    subframe type code (001001), and the residual header layout —
    independently of synth_flac."""
    samples = list(range(10, 26))
    md5 = hashlib.md5(
        b"".join(int(v).to_bytes(1, "little", signed=True) for v in samples)
    ).digest()

    h = _Bits()
    h.put(0b11111111111110, 14)  # sync
    h.put(0, 1)  # reserved
    h.put(0, 1)  # fixed blocking
    h.put(6, 4)  # block size: 8-bit at end
    h.put(4, 4)  # sample rate: 8 kHz table code
    h.put(0, 4)  # mono
    h.put(1, 3)  # 8-bit sample size
    h.put(0, 1)  # reserved
    h.put(0, 8)  # coded frame number 0
    h.put(15, 8)  # block size - 1
    hdr = h.bytes()
    hdr += bytes([crc8(hdr)])

    s = _Bits()
    s.put(0, 1)  # subframe pad bit
    s.put(0b001001, 6)  # FIXED order 1
    s.put(0, 1)  # no wasted bits
    s.put(10, 8)  # warmup sample
    s.put(0, 2)  # residual method: 4-bit Rice
    s.put(0, 4)  # partition order 0
    s.put(1, 4)  # Rice param 1
    for _ in range(15):  # residual +1: zigzag 2, q=1 ('01'), rem 0
        s.put(0b010, 3)
    frame = hdr + s.bytes()
    frame += crc16(frame).to_bytes(2, "big")

    payload = _streaminfo(8000, 1, 8, 16, md5) + frame
    out = decode_flac(payload)
    assert out is not None
    dec, rate = out
    assert rate == 8000
    assert dec[:, 0].tolist() == samples


def test_handbuilt_wasted_bits_constant():
    """Wasted-bits: flag 1 + unary(k-1), samples decoded at bps-k then
    shifted left k. Constant 3 with k=2 must decode to 12."""
    samples = [12] * 16
    md5 = hashlib.md5(
        b"".join(int(v).to_bytes(1, "little", signed=True) for v in samples)
    ).digest()

    h = _Bits()
    h.put(0b11111111111110, 14)
    h.put(0, 2)
    h.put(6, 4)
    h.put(4, 4)
    h.put(0, 4)
    h.put(1, 3)
    h.put(0, 1)
    h.put(0, 8)
    h.put(15, 8)
    hdr = h.bytes()
    hdr += bytes([crc8(hdr)])

    s = _Bits()
    s.put(0, 1)
    s.put(0, 6)  # CONSTANT
    s.put(1, 1)  # wasted-bits flag
    s.put(0b01, 2)  # unary k-1 = 1 → k = 2
    s.put(3, 6)  # constant value at bps-k = 6 bits
    frame = hdr + s.bytes()
    frame += crc16(frame).to_bytes(2, "big")

    payload = _streaminfo(8000, 1, 8, 16, md5) + frame
    out = decode_flac(payload)
    assert out is not None
    assert out[0][:, 0].tolist() == samples


# ------------------------------------------------------------- rejection


def _good() -> bytes:
    return synth_flac_pcm(7, 512)


def test_rejects_frame_body_corruption():
    p = bytearray(_good())
    p[-40] ^= 0x01  # inside the last frame body → CRC-16 breaks
    assert decode_flac(bytes(p)) is None


def test_rejects_header_corruption():
    p = bytearray(_good())
    # byte 46 = second byte of the first frame header region
    first_frame = p.index(0xFF, 8)
    p[first_frame + 2] ^= 0x10
    assert decode_flac(bytes(p)) is None


def test_rejects_md5_mismatch():
    p = bytearray(_good())
    p[26] ^= 0xFF  # inside the 16-byte STREAMINFO MD5 (bytes 26..41)
    assert decode_flac(bytes(p)) is None


def test_rejects_total_sample_mismatch():
    rate, bits, channels, m = _flac_params(7)
    good = bytearray(_good())
    # total_samples is the 36 bits ending at STREAMINFO byte 26; bump
    # its low byte (byte 25)
    good[25] ^= 0x01
    assert decode_flac(bytes(good)) is None


def test_rejects_truncation_and_garbage():
    p = _good()
    for cut in (0, 3, 7, 20, 41, len(p) // 2, len(p) - 1):
        assert decode_flac(p[:cut]) is None
    assert decode_flac(b"") is None
    assert decode_flac(b"OggS" + p[4:]) is None
    assert decode_flac(b"\xff" * 300) is None


def test_mutation_sweep_never_raises():
    """Deterministic corruption sweep: every single-byte mutation either
    decodes (if it lands in dead padding) or returns None — never an
    executor-killing exception."""
    p = bytearray(_good())
    for off in range(0, len(p), 7):
        q = bytearray(p)
        q[off] ^= 0x55
        decode_flac(bytes(q))  # must not raise


# --------------------------------------------------------- Spark plumbing


def test_flac_frame_nulls_for_garbage(spark):
    rows = [
        (1, bytearray(b"not flac at all")),
        (2, bytearray(synth_flac_pcm(2, 512))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in flac_pcm_frame(df).collect()}
    assert out[1]["n_samples"] is None
    assert out[2]["n_samples"] == 512
    rate, bits, channels, m = _flac_params(2)
    assert out[2]["sample_rate"] == rate
    assert out[2]["channels"] == channels
