"""FLAC (RFC 9639) — real lossless audio CODEC, encode AND decode.

This closes the audio-codec-frames gap the MP3 module deliberately
declares out of scope (multimodal/mp3.py docstring): unlike MP3, FLAC
carries EVERY decode table in-band — LPC coefficients, Rice parameters,
partition geometry are all read from the stream, and the container
itself ships ground truth for the decoded output (STREAMINFO holds the
MD5 of the raw PCM, which `hashlib` verifies externally). So a
from-scratch decoder here is certifiable the way the MP3 synthesis
filterbank is not: no out-of-band constant can be silently
mis-transcribed without the MD5 (or a CRC) catching it.

Decoder surface (decode_flac):
  - STREAMINFO parse + metadata-block walk (§8.1-8.2)
  - frame headers: sync, blocking strategy, all block-size/sample-rate/
    sample-size code paths incl. the end-of-header uncommon fields,
    UTF-8-style coded frame/sample numbers, CRC-8 (§9.1)
  - subframes: CONSTANT / VERBATIM / FIXED orders 0-4 / LPC orders
    1-32 with in-stream quantized coefficients + shift, wasted-bits
    unary prefix (§9.2.1-9.2.6)
  - residuals: 4-bit Rice and 5-bit Rice2 partitioned coding with
    escape-to-raw partitions, zigzag mapping (§9.2.7)
  - stereo decorrelation: independent, left/side, right/side, mid/side
    (side channel at bps+1) (§4.2)
  - integrity: frame-header CRC-8, whole-frame CRC-16 (§9.3), total
    sample count vs STREAMINFO, and the PCM MD5 — any mismatch rejects
    the file whole (returns None), same contract as the WAV/MP4
    validation work.

Encoder surface (synth_flac): a real spec-conformant encoder used to
synthesize fixtures byte-for-byte — it deliberately cycles through
every subframe type, both Rice methods, escape partitions, multiple
partition orders, all four channel assignments and the uncommon
header-field paths so the round-trip exercises the full decoder.

Reference parity note: the reference system (smartdatalake/danae,
ingest/profiling/profiler.py) treats any non-tabular file as an
opaque "Unsupported" blob; audio decode has no reference counterpart
and is part of the mandated multimodal extension surface.
"""

from __future__ import annotations

import bisect
import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd

__all__ = [
    "decode_flac",
    "decode_flac_full",
    "synth_flac",
    "flac_pcm_frame",
    "flac_pcm_roundtrip",
    "FLAC_PCM_ORACLE",
]

# ------------------------------------------------------------- CRCs (§9.3)
# CRC-8: x^8 + x^2 + x + 1 (0x07), init 0, MSB-first, no reflection.
# CRC-16: x^16 + x^15 + x^2 + 1 (0x8005), init 0, MSB-first.
# Both pinned against published check values in tests/test_flac.py
# (crc8("123456789") == 0xF4, crc16("123456789") == 0xFEE8).


def _make_crc8_table() -> list[int]:
    tbl = []
    for b in range(256):
        r = b
        for _ in range(8):
            r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
        tbl.append(r)
    return tbl


def _make_crc16_table() -> list[int]:
    tbl = []
    for b in range(256):
        r = b << 8
        for _ in range(8):
            r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 else (r << 1) & 0xFFFF
        tbl.append(r)
    return tbl


_CRC8_TABLE = _make_crc8_table()
_CRC16_TABLE = _make_crc16_table()


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TABLE[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16_TABLE[((r >> 8) ^ b) & 0xFF]
    return r


# --------------------------------------------------------------- bit I/O


class _Reader:
    """MSB-first bit reader over the whole file; IndexError on overrun
    (caught at the decode_flac boundary → None). Word-based: bits(n)
    assembles from a byte-slice int instead of a per-bit loop, and
    unary() binary-searches a once-per-file table of 1-bit positions —
    together these are the decode hot path (profiled ~50% of wall
    time in the naive per-bit form)."""

    def __init__(self, data: bytes):
        self.data = data
        self.nbits = len(data) * 8
        self.pos = 0  # bit position
        self._ones = None  # lazy np.flatnonzero of the unpacked bits

    def bits(self, n: int) -> int:
        p = self.pos
        if p + n > self.nbits:
            raise IndexError("bitstream overrun")
        start = p >> 3
        end = (p + n + 7) >> 3
        word = int.from_bytes(self.data[start:end], "big")
        self.pos = p + n
        return (word >> (end * 8 - (p + n))) & ((1 << n) - 1)

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        """Count 0 bits up to the terminating 1 bit (§9.2.7.1)."""
        if self._ones is None:
            # plain list + bisect beats np.searchsorted per-call overhead
            self._ones = np.flatnonzero(
                np.unpackbits(np.frombuffer(self.data, dtype=np.uint8))
            ).tolist()
        p = self.pos
        ones = self._ones
        idx = bisect.bisect_left(ones, p)
        if idx >= len(ones):
            raise IndexError("bitstream overrun")
        one_at = ones[idx]
        self.pos = one_at + 1
        return one_at - p

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _Writer:
    """MSB-first bit writer (word-based: accumulate n bits at once,
    flush whole bytes — ~8× fewer Python ops than per-bit)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def unary(self, q: int) -> None:
        # q zero bits then a one bit == the value 1 written in q+1 bits
        self.write(1, q + 1)

    def align(self) -> None:
        while self.nacc:
            self.write(0, 1)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


# ------------------------------------------------- shared codec constants

# frame-header sample-rate code → Hz (§9.1.2); None = uncommon/streaminfo
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_RATE_TO_CODE = {v: k for k, v in _RATE_CODES.items()}

# frame-header sample-size code → bits (§9.1.3); 0 = streaminfo, 3 reserved
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_BPS_TO_CODE = {v: k for k, v in _BPS_CODES.items()}

# fixed-predictor coefficients, order 0..4 (§9.2.3)
_FIXED_COEFS = [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]]


def _pcm_bytes(samples: np.ndarray, bps: int) -> bytes:
    """Interleaved little-endian signed PCM at ceil(bps/8) bytes per
    sample (§8.2 MD5 input) — vectorized; 24-bit packs via int32 with
    the top byte stripped."""
    inter = samples.reshape(-1)
    bysam = (bps + 7) // 8
    if bysam == 1:
        return inter.astype("<i1").tobytes()
    if bysam == 2:
        return inter.astype("<i2").tobytes()
    raw32 = inter.astype("<i4").tobytes()
    if bysam == 4:
        return raw32
    return (
        np.frombuffer(raw32, dtype=np.uint8).reshape(-1, 4)[:, :3].tobytes()
    )


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _utf8_coded(value: int) -> bytes:
    """FLAC's UTF-8-style coded number, up to 36 bits (§9.1.5)."""
    if value < 0x80:
        return bytes([value])
    for nbytes, maxbits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if value < (1 << maxbits):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            out = [lead | (value >> (6 * (nbytes - 1)))]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((value >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("coded number exceeds 36 bits")


def _read_utf8_coded(r: _Reader) -> int | None:
    b0 = r.bits(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    for i in range(7):
        if not (b0 >> (7 - i)) & 1:
            break
        nbytes += 1
    if nbytes < 2 or nbytes > 7:
        return None
    value = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = r.bits(8)
        if b & 0xC0 != 0x80:
            return None
        value = (value << 6) | (b & 0x3F)
    return value


# ------------------------------------------------------------- decoder


def _decode_residual(r: _Reader, block_size: int, order: int) -> list[int] | None:
    method = r.bits(2)
    if method > 1:
        return None  # reserved coding method
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.bits(4)
    if block_size % (1 << porder) != 0:
        return None
    part_n = block_size >> porder
    if part_n <= order and porder > 0:
        return None
    if porder == 0 and block_size - order < 0:
        return None
    out: list[int] = []
    for p in range(1 << porder):
        n = part_n - (order if p == 0 else 0)
        if n < 0:
            return None
        param = r.bits(pbits)
        if param == escape:
            raw = r.bits(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                out.extend(r.signed(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = r.unary()
                u = (q << param) | r.bits(param)
                out.append(_unzigzag(u))
    return out


def _decode_subframe(r: _Reader, block_size: int, bps: int) -> list[int] | None:
    if r.bits(1) != 0:
        return None  # mandatory zero pad bit
    ftype = r.bits(6)
    wasted = 0
    if r.bits(1):
        wasted = r.unary() + 1
    ebps = bps - wasted
    if ebps <= 0:
        return None

    if ftype == 0:  # CONSTANT
        v = r.signed(ebps)
        samples = [v] * block_size
    elif ftype == 1:  # VERBATIM
        samples = [r.signed(ebps) for _ in range(block_size)]
    elif 8 <= ftype <= 12:  # FIXED, order = ftype - 8
        order = ftype - 8
        if order > block_size:
            return None
        warm = [r.signed(ebps) for _ in range(order)]
        resid = _decode_residual(r, block_size, order)
        if resid is None:
            return None
        samples = list(warm)
        coefs = _FIXED_COEFS[order]
        for i in range(order, block_size):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            samples.append(resid[i - order] + pred)
    elif ftype >= 32:  # LPC, order = (ftype & 31) + 1
        order = (ftype & 31) + 1
        if order > block_size:
            return None
        warm = [r.signed(ebps) for _ in range(order)]
        prec = r.bits(4)
        if prec == 15:
            return None  # invalid precision code
        prec += 1
        shift = r.signed(5)
        if shift < 0:
            return None
        coefs = [r.signed(prec) for _ in range(order)]
        resid = _decode_residual(r, block_size, order)
        if resid is None:
            return None
        samples = list(warm)
        for i in range(order, block_size):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs)) >> shift
            samples.append(resid[i - order] + pred)
    else:
        return None  # reserved subframe type

    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _parse_streaminfo(body: bytes) -> dict | None:
    if len(body) < 34:
        return None
    r = _Reader(body)
    info = {
        "min_block": r.bits(16),
        "max_block": r.bits(16),
        "min_frame": r.bits(24),
        "max_frame": r.bits(24),
        "rate": r.bits(20),
        "channels": r.bits(3) + 1,
        "bps": r.bits(5) + 1,
        "total_samples": r.bits(36),
        "md5": body[18:34],
    }
    if info["rate"] == 0 or info["min_block"] < 16:
        return None
    return info


def decode_flac(payload: bytes) -> tuple[np.ndarray, int] | None:
    """Decode a FLAC file to ((n_samples, channels) int32, rate).

    Full validation: metadata walk, per-frame header CRC-8 and frame
    CRC-16, inter-frame consistency (rate/channels/bps fixed per
    stream), STREAMINFO total-sample count, and the STREAMINFO MD5 of
    the reconstructed PCM. Any violation → None (reject the file
    whole — corrupt crawl bytes must not silently yield wrong audio).
    """
    full = decode_flac_full(payload)
    return None if full is None else full[:2]


def _decode_flac_inner(payload: bytes) -> tuple[np.ndarray, int, int] | None:
    if len(payload) < 42 or payload[:4] != b"fLaC":
        return None
    pos = 4
    info = None
    first = True
    while True:
        if pos + 4 > len(payload):
            return None
        hdr = payload[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) != blen or btype == 127:
            return None
        if first:
            if btype != 0:
                return None  # STREAMINFO must be first (§8.1)
            info = _parse_streaminfo(body)
            if info is None:
                return None
            first = False
        pos += 4 + blen
        if last:
            break
    assert info is not None
    channels = info["channels"]
    bps0 = info["bps"]
    rate0 = info["rate"]

    chans: list[list[int]] = [[] for _ in range(channels)]
    expected_next = 0  # next frame number (fixed) / sample number (variable)
    # ONE reader for the whole frame walk: unary()'s ones-table (an
    # np.unpackbits pass over the entire payload) is built lazily per
    # reader, so constructing a reader per frame made decode quadratic
    # in file size (measured ~14x wall for 4x input at 256 frames).
    r = _Reader(payload)
    while pos < len(payload):
        frame_start = pos
        r.pos = pos * 8
        if r.bits(14) != 0b11111111111110 or r.bits(1) != 0:
            return None
        variable = r.bits(1)
        bs_code = r.bits(4)
        sr_code = r.bits(4)
        ch_code = r.bits(4)
        ss_code = r.bits(3)
        if r.bits(1) != 0:
            return None
        coded = _read_utf8_coded(r)
        if coded is None or coded != expected_next:
            return None

        if bs_code == 0:
            return None  # reserved
        elif bs_code == 1:
            block_size = 192
        elif bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = r.bits(8) + 1
        elif bs_code == 7:
            block_size = r.bits(16) + 1
        else:
            block_size = 256 << (bs_code - 8)

        if sr_code == 0:
            rate = rate0
        elif sr_code in _RATE_CODES:
            rate = _RATE_CODES[sr_code]
        elif sr_code == 12:
            rate = r.bits(8) * 1000
        elif sr_code == 13:
            rate = r.bits(16)
        elif sr_code == 14:
            rate = r.bits(16) * 10
        else:
            return None
        if rate != rate0:
            return None  # stream reconfiguration: reject like the MP3 walk

        if ch_code <= 7:
            n_ch, decor = ch_code + 1, None
        elif ch_code <= 10:
            n_ch, decor = 2, ch_code
        else:
            return None
        if n_ch != channels:
            return None

        if ss_code == 0:
            bps = bps0
        elif ss_code in _BPS_CODES:
            bps = _BPS_CODES[ss_code]
        else:
            return None
        if bps != bps0:
            return None

        r.align()
        crc_byte = r.bits(8)
        if crc8(payload[frame_start : r.byte_pos() - 1]) != crc_byte:
            return None

        subs: list[list[int]] = []
        for c in range(channels):
            sbps = bps
            if decor == 8 and c == 1:  # left/side: side at bps+1
                sbps += 1
            elif decor == 9 and c == 0:  # right/side
                sbps += 1
            elif decor == 10 and c == 1:  # mid/side
                sbps += 1
            sub = _decode_subframe(r, block_size, sbps)
            if sub is None:
                return None
            subs.append(sub)
        r.align()
        fcrc = r.bits(16)
        if crc16(payload[frame_start : r.byte_pos() - 2]) != fcrc:
            return None

        if decor == 8:  # left/side
            left, side = subs
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif decor == 9:  # right/side
            side, right = subs
            subs = [[rv + s for rv, s in zip(right, side)], right]
        elif decor == 10:  # mid/side
            mid, side = subs
            left, right = [], []
            for m, s in zip(mid, side):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
            subs = [left, right]

        for c in range(channels):
            chans[c].extend(subs[c])
        pos = r.byte_pos()
        expected_next = (expected_next + 1) if not variable else (expected_next + block_size)

    n = len(chans[0])
    if info["total_samples"] and n != info["total_samples"]:
        return None
    samples = np.array(chans, dtype=np.int64).T.reshape(n, channels)

    # STREAMINFO MD5 over the raw PCM: interleaved, little-endian,
    # signed, ceil(bps/8) bytes per sample (§8.2). hashlib is the
    # external ground truth that certifies the whole decode path.
    if info["md5"] != b"\x00" * 16:
        if hashlib.md5(_pcm_bytes(samples, bps0)).digest() != info["md5"]:
            return None
    lo, hi = -(1 << (bps0 - 1)), (1 << (bps0 - 1)) - 1
    if samples.min() < lo or samples.max() > hi:
        return None
    return samples.astype(np.int32), rate0, bps0


def decode_flac_full(payload: bytes) -> tuple[np.ndarray, int, int] | None:
    """decode_flac plus the stream's bits-per-sample:
    ((n, channels) int32, rate, bps) — the census entry point."""
    try:
        return _decode_flac_inner(payload)
    except (IndexError, ValueError, struct.error):
        return None


# ------------------------------------------------------------- encoder


def _encode_residual(
    w: _Writer, resid: list[int], block_size: int, order: int,
    method: int, porder: int, escape_parts: set[int],
) -> None:
    """Partitioned Rice coding (§9.2.7). Caller guarantees
    block_size % 2**porder == 0 and partition 0 non-negative length."""
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    w.write(method, 2)
    w.write(porder, 4)
    part_n = block_size >> porder
    idx = 0
    for p in range(1 << porder):
        n = part_n - (order if p == 0 else 0)
        vals = resid[idx : idx + n]
        idx += n
        if p in escape_parts:
            raw = max((abs(v).bit_length() + 1 for v in vals), default=1)
            raw = min(raw, 31)
            w.write(escape, pbits)
            w.write(raw, 5)
            for v in vals:
                w.write_signed(v, raw)
            continue
        us = [_zigzag(v) for v in vals]
        # smallest param keeping every quotient ≤ 30 (bounded unary runs)
        param = 0
        while param < escape - 1 and any(u >> param > 30 for u in us):
            param += 1
        w.write(param, pbits)
        for u in us:
            w.unary(u >> param)
            w.write(u & ((1 << param) - 1), param)


def _encode_subframe(
    w: _Writer, samples: list[int], bps: int, kind: tuple,
    method: int, porder: int, escape_parts: set[int],
) -> None:
    n = len(samples)
    if porder and (n % (1 << porder) != 0):
        porder = 0
    if kind[0] == "constant":
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write_signed(samples[0], bps)
        return
    if kind[0] == "verbatim":
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in samples:
            w.write_signed(v, bps)
        return
    if kind[0] == "fixed":
        order = kind[1]
        if order >= n:
            order = 0
        if porder and (n >> porder) <= order:
            porder = 0
        w.write(0, 1)
        w.write(8 | order, 6)
        w.write(0, 1)
        coefs = _FIXED_COEFS[order]
        for v in samples[:order]:
            w.write_signed(v, bps)
        resid = [
            samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, n)
        ]
        _encode_residual(w, resid, n, order, method, porder, escape_parts)
        return
    # LPC: kind = ("lpc", order, precision, shift, coefs)
    _, order, prec, shift, coefs = kind
    if order >= n:
        _encode_subframe(w, samples, bps, ("fixed", 0), method, porder, escape_parts)
        return
    if porder and (n >> porder) <= order:
        porder = 0
    w.write(0, 1)
    w.write(32 | (order - 1), 6)
    w.write(0, 1)
    for v in samples[:order]:
        w.write_signed(v, bps)
    w.write(prec - 1, 4)
    w.write_signed(shift, 5)
    for c in coefs:
        w.write_signed(c, prec)
    resid = [
        samples[i] - (sum(c * samples[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
        for i in range(order, n)
    ]
    _encode_residual(w, resid, n, order, method, porder, escape_parts)


def synth_flac(
    samples: np.ndarray,
    rate: int = 8000,
    bits: int = 16,
    block_size: int = 256,
    seed: int = 0,
) -> bytes:
    """Encode (n, channels) int samples as a spec-conformant FLAC file.

    Deterministically cycles encoding strategies from `seed` so a doc
    grid exercises the whole decoder: subframe types (constant when a
    block is flat, verbatim, fixed 0-4, LPC 2/4/8), Rice vs Rice2,
    partition orders 0-2, escape partitions, all four stereo
    assignments, and the three sample-rate header paths (table code,
    16-bit uncommon field, from-streaminfo). Lossless by construction;
    STREAMINFO carries the true PCM MD5.
    """
    if samples.ndim != 2:
        raise ValueError("samples must be (n, channels)")
    n, channels = samples.shape
    if channels > 8:
        raise ValueError("FLAC supports up to 8 channels")
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if samples.min() < lo or samples.max() > hi:
        raise ValueError("samples exceed bit depth")

    md5 = hashlib.md5(_pcm_bytes(samples.astype(np.int64), bits)).digest()

    si = _Writer()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    streaminfo = si.flush() + md5

    out = bytearray(b"fLaC")
    out.append(0x80 | 0)  # last-metadata-block, type 0 = STREAMINFO
    out += len(streaminfo).to_bytes(3, "big")
    out += streaminfo

    _BS_TO_CODE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                   256: 8, 512: 9, 1024: 10}

    frame_no = 0
    off = 0
    while off < n:
        bs = min(block_size, n - off)
        block = samples[off : off + bs]
        w = _Writer()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking strategy; coded number = frame no

        if bs in _BS_TO_CODE:
            bs_code, bs_extra = _BS_TO_CODE[bs], None
        elif bs <= 256:
            bs_code, bs_extra = 6, ("u8", bs - 1)
        else:
            bs_code, bs_extra = 7, ("u16", bs - 1)

        rsel = (seed + frame_no) % 3
        if rsel == 0 and rate in _RATE_TO_CODE:
            sr_code, sr_extra = _RATE_TO_CODE[rate], None
        elif rsel == 1 and rate % 10 == 0 and rate // 10 < 65536:
            sr_code, sr_extra = 14, ("u16", rate // 10)
        elif rate < 65536:
            sr_code, sr_extra = 13, ("u16", rate)
        else:
            sr_code, sr_extra = 0, None

        decor = None
        if channels == 2:
            m = (seed + frame_no) % 4
            decor = (None, 8, 9, 10)[m]
        ch_code = channels - 1 if decor is None else decor

        ss_code = _BPS_TO_CODE[bits] if (seed + frame_no) % 2 == 0 else 0

        w.write(bs_code, 4)
        w.write(sr_code, 4)
        w.write(ch_code, 4)
        w.write(ss_code, 3)
        w.write(0, 1)
        for b in _utf8_coded(frame_no):
            w.write(b, 8)
        if bs_extra is not None:
            w.write(bs_extra[1], 8 if bs_extra[0] == "u8" else 16)
        if sr_extra is not None:
            w.write(sr_extra[1], 16)
        hdr = w.flush()
        hdr += bytes([crc8(hdr)])

        fw = _Writer()
        sub_blocks: list[tuple[list[int], int]] = []
        if decor is None:
            for c in range(channels):
                sub_blocks.append(([int(v) for v in block[:, c]], bits))
        else:
            left = [int(v) for v in block[:, 0]]
            right = [int(v) for v in block[:, 1]]
            side = [l - r for l, r in zip(left, right)]
            if decor == 8:
                sub_blocks = [(left, bits), (side, bits + 1)]
            elif decor == 9:
                sub_blocks = [(side, bits + 1), (right, bits)]
            else:
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                sub_blocks = [(mid, bits), (side, bits + 1)]

        for c, (vals, sbps) in enumerate(sub_blocks):
            k = (seed + frame_no * channels + c) % 8
            if k == 0 and len(set(vals)) == 1:
                kind: tuple = ("constant",)
            elif k in (0, 1):
                kind = ("verbatim",)
            elif k <= 5:
                kind = ("fixed", k - 2)  # orders 0..3
            elif k == 6:
                kind = ("fixed", 4)
            else:
                order = (2, 4, 8)[(seed + frame_no) % 3]
                coefs = [
                    ((seed * 5 + frame_no * 3 + c * 7 + j * 11) % 63) - 31 or 1
                    for j in range(order)
                ]
                kind = ("lpc", order, 12, 4, coefs)
            method = (seed + frame_no + c) % 2
            porder = (seed + frame_no + c) % 3
            escape_parts = (
                {0} if (seed + frame_no + c) % 5 == 0 else set()
            )
            _encode_subframe(fw, vals, sbps, kind, method, porder, escape_parts)
        body = fw.flush()

        frame = hdr + body
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
        off += bs
        frame_no += 1

    return bytes(out)


# ----------------------------------------------------- Spark entry points


def _flac_params(doc_id: int) -> tuple[int, int, int, int]:
    """(rate, bits, channels, M) for the doc grid — every combination of
    depth 8/16/24, mono/stereo, and rate-code path appears; M is the
    sample-value modulus sized to the depth (mirrored in the oracle)."""
    bits = (8, 16, 24)[doc_id % 3]
    m = (200, 2048, 65536)[doc_id % 3]
    rate = 8000 + (doc_id % 8) * 1000
    channels = 1 + (doc_id % 2)
    return rate, bits, channels, m


def _flac_sample(doc_id: int, i: int, c: int, m: int) -> int:
    return ((doc_id * 7 + i * i * 3 + c * 13) % m) - m // 2


def synth_flac_pcm(doc_id: int, n_samples: int = 1024) -> bytes:
    """Doc-deterministic FLAC fixture (samples mirror the WAV entry's
    quadratic formula, scaled to the doc's bit depth)."""
    rate, bits, channels, m = _flac_params(doc_id)
    arr = np.empty((n_samples, channels), dtype=np.int64)
    for i in range(n_samples):
        for c in range(channels):
            arr[i, c] = _flac_sample(doc_id, i, c, m)
    return synth_flac(arr, rate=rate, bits=bits, block_size=256, seed=doc_id)


def flac_pcm_frame(
    df, id_col: str = "doc_id", payload_col: str = "payload"
):
    """Decode a (id, flac-bytes) frame to the PCM census columns; None
    row-wise for undecodable payloads (never raises in an executor)."""
    from danae_spark.multimodal.pixels import audio_energy_fingerprint

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                decoded = (
                    decode_flac_full(bytes(payload)) if payload is not None else None
                )
                if decoded is None:
                    rows.append({id_col: rid, "sample_rate": None, "channels": None,
                                 "bits": None, "n_samples": None,
                                 "energy_sum": None, "grad_hash": None})
                    continue
                samples, rate, bps = decoded
                total, gbits = audio_energy_fingerprint(samples)
                rows.append({id_col: rid, "sample_rate": rate,
                             "channels": samples.shape[1],
                             "bits": bps, "n_samples": samples.shape[0],
                             "energy_sum": total, "grad_hash": gbits})
            yield pd.DataFrame(
                rows, columns=[id_col, "sample_rate", "channels", "bits",
                               "n_samples", "energy_sum", "grad_hash"])

    return df.mapInPandas(
        batches,
        schema=(f"{id_col} bigint, sample_rate int, channels int, bits int, "
                "n_samples int, energy_sum bigint, grad_hash bigint"),
    )


def flac_pcm_roundtrip(spark, sf_dir: str):
    """Oracle-checkable LOSSLESS codec round-trip: per document a FLAC
    stream is encoded byte-for-byte by the real encoder (cycling every
    subframe type / Rice method / partition order / stereo assignment),
    decoded back by the real decoder (with CRC-8/CRC-16 and the
    STREAMINFO-MD5 hashlib check active), and fingerprinted. Because
    FLAC is lossless, the DuckDB oracle restates the decoded samples as
    pure doc_id arithmetic — any bit-level bug on either side breaks
    the MD5 first and the value hash second."""
    from danae_spark.catalog import load_table
    from danae_spark.multimodal.pixels import audio_energy_fingerprint
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                decoded = decode_flac(synth_flac_pcm(d))
                if decoded is None:
                    rows.append({"doc_id": d, "sample_rate": None,
                                 "channels": None, "bits": None,
                                 "n_samples": None, "energy_sum": None,
                                 "grad_hash": None})
                    continue
                samples, rate = decoded
                total, gbits = audio_energy_fingerprint(samples)
                rows.append({"doc_id": d, "sample_rate": rate,
                             "channels": samples.shape[1],
                             "bits": _flac_params(d)[1],
                             "n_samples": samples.shape[0],
                             "energy_sum": total, "grad_hash": gbits})
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "channels", "bits",
                               "n_samples", "energy_sum", "grad_hash"])

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(
            batches,
            schema=("doc_id bigint, sample_rate int, channels int, bits int, "
                    "n_samples int, energy_sum bigint, grad_hash bigint"),
        )
        .orderBy("doc_id")
    )


FLAC_PCM_ORACLE = """
WITH p AS (
  SELECT doc_id,
         CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
         CAST(1 + (doc_id % 2) AS INT) AS channels,
         CAST(CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 24 END AS INT) AS bits,
         CASE doc_id % 3 WHEN 0 THEN 200 WHEN 1 THEN 2048 ELSE 65536 END AS m
  FROM documents
),
s AS (
  SELECT p.doc_id, g.i, c.c,
         (p.doc_id * 7 + g.i * g.i * 3 + c.c * 13) % p.m - p.m // 2 AS v
  FROM p,
       generate_series(0, 1023) g(i),
       generate_series(0, 1) c(c)
  WHERE c.c < p.channels
),
tot AS (
  SELECT doc_id, CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS energy_sum
  FROM s GROUP BY doc_id
),
blk AS (
  SELECT doc_id, i // 16 AS b,
         CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS e
  FROM s WHERE c = 0 GROUP BY doc_id, i // 16
),
gh AS (
  SELECT l.doc_id,
         CAST(coalesce(sum(CASE WHEN l.e < r.e
                       THEN (CAST(1 AS BIGINT) << l.b) ELSE 0 END), 0) AS BIGINT)
           AS grad_hash
  FROM blk l JOIN blk r ON l.doc_id = r.doc_id AND r.b = l.b + 1
  GROUP BY l.doc_id
)
SELECT t.doc_id, p.sample_rate, p.channels, p.bits,
       1024 AS n_samples, t.energy_sum, gh.grad_hash
FROM tot t JOIN gh USING (doc_id) JOIN p USING (doc_id)
ORDER BY doc_id
"""
