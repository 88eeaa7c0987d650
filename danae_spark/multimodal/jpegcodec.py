"""Baseline JPEG (ITU-T.81 sequential DCT) encode/decode, numpy-only.

This closes the last image-codec stub: the decoder handles real
baseline JPEGs — marker walk (incl. optional 0xFF fill bytes and
length-less TEM/RSTn markers, B.1.1.2), DQT/DHT table loading (tables
are read from the FILE, per spec, so no hard-coded Annex K data),
Huffman entropy decode with byte-unstuffing, differential DC
prediction, restart-marker handling (DRI/RSTn: byte-align, reset DC
predictors, E.2.4), dequantization, 2-D IDCT, level shift, chroma
upsampling for subsampled scans (4:2:0, 4:2:2 — any integer-ratio
sampling factors), and YCbCr→RGB. Out-of-subset files (progressive,
arithmetic-coded, 12-bit, 16-bit quant tables, truncated) return None
and fall back to `parse_image_header` metadata.

DCT scale: the orthonormal DCT-II matrix C (rows √(1/8) for k=0,
√(2/8) otherwise) applied as C·b·Cᵀ IS the T.81 A.3.3 FDCT — the
(1/4)·C(u)C(v) factors fold exactly into the matrix normalization
((1/√8)² = 1/8 = (1/4)(1/√2)(1/√2) for DC, etc.). No extra scaling:
an r7 advisor finding showed a 2× factor here made the codec only
self-consistent (real-world JPEGs decoded at half contrast); a pytest
now pins the coefficients against the direct T.81 double-sum formula.

The encoder emits spec-conformant files (SOI, DQT, SOF0, DHT,
optional DRI, SOS, entropy-coded segment with 0xFF00 stuffing and
RSTn markers, EOI) using canonical Huffman tables embedded in DHT —
any standard JPEG decoder can read them. It can write grayscale,
4:4:4, and 4:2:0 (MCU-interleaved 2×2 Y + Cb + Cr), with an optional
restart interval — which gives the decoder's subsampled/restart paths
a synthesizable test surface. JPEG is lossy, so the oracle strategy
differs from the other formats: an image that is CONSTANT PER 8×8
BLOCK with values whose level-shifted DC (8·(v−128)) is an exact
multiple of the quantization step reconstructs EXACTLY (every AC
coefficient is zero; the DC quantizes without error), which makes the
full encode→decode→hash round trip DuckDB-value-checkable even for a
lossy codec, while general images are covered by lossy error-bound
pytests.
"""

from __future__ import annotations

import struct

import numpy as np

# flat quantization tables: DC step 16 (block-constant images whose
# scaled level-shifted DC 8·(v−128) is a multiple of 16 reconstruct
# exactly), AC step 16
Q_STEP = 16
QTABLE = np.full(64, Q_STEP, dtype=np.int32)

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 2-D DCT-II basis == the T.81 FDCT/IDCT scale exactly
# (the spec's 1/4·C(u)C(v) factors are the matrix normalization):
# coeff = C · block · Cᵀ
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# ------------------------------------------------------------ Huffman

def _canonical_codes(bits: list[int], vals: list[int]):
    """(length-histogram, symbol list) → {symbol: (code, length)} per the
    T.81 canonical assignment (Annex C)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes

# DC: symbols 0..11 (magnitude categories), all 5-bit codes — 12 of 32
# slots used, the all-ones code stays unused as T.81 requires.
DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# AC: all 162 (run,size) symbols at 8 bits — 162 of 256 slots used.
AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]

_DC_ENC = _canonical_codes(DC_BITS, DC_VALS)
_AC_ENC = _canonical_codes(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """1-pad to a byte edge (spec padding, used before RSTn/EOI)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    """Entropy-segment reader: un-stuffs 0xFF00, stops at a marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                return False  # a real marker: no more entropy data
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def bits(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                # pad with 1s past the marker (decoders conventionally do)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def huffman(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")

    def restart(self) -> None:
        """Byte-align at a restart boundary and consume the RSTn marker
        (T.81 E.2.4): pad bits are discarded, fill 0xFFs skipped, and
        the entropy stream resumes after the two marker bytes. DC
        predictor reset is the caller's job."""
        self.acc = 0
        self.nbits = 0
        while (
            self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0xFF
        ):
            self.pos += 1  # optional fill bytes before the marker
        if self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected RSTn marker at restart boundary")
        self.pos += 2


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 F.1.2.1: (category size, additional bits) for a DC diff or
    AC value; negative values store value-1's low bits."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ------------------------------------------------------------- encoder

def synth_jpeg(
    lum: np.ndarray,
    color: bool = False,
    subsample: str | None = None,
    restart_interval: int = 0,
    chroma: tuple[int, int] = (128, 128),
) -> bytes:
    """Spec-conformant baseline JPEG for a (h, w) luma grid.

    color=True writes YCbCr with constant chroma (default 128,128 →
    R=G=B=Y after conversion). subsample="420" (color only) writes
    MCU-interleaved 2×2 Y + Cb + Cr with the chroma planes at half
    resolution; dimensions must then be multiples of 16 (else 8).
    restart_interval=n emits a DRI segment and an RSTn marker (with DC
    predictor reset and byte alignment) every n MCUs."""
    h, w = lum.shape
    sub = 2 if (color and subsample == "420") else 1
    if subsample not in (None, "420"):
        raise ValueError("subsample must be None or '420'")
    if subsample == "420" and not color:
        raise ValueError("4:2:0 requires color=True")
    if h % (8 * sub) or w % (8 * sub):
        raise ValueError(f"synth_jpeg needs multiple-of-{8 * sub} dimensions")
    ncomp = 3 if color else 1
    if color:
        planes = [
            lum,
            np.full((h // sub, w // sub), chroma[0], dtype=np.int64),
            np.full((h // sub, w // sub), chroma[1], dtype=np.int64),
        ]
        samps = [(sub, sub), (1, 1), (1, 1)]
    else:
        planes = [lum]
        samps = [(1, 1)]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFDB, bytes([0]) + bytes(int(QTABLE[i]) for i in range(64)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for c in range(ncomp):
        hi, vi = samps[c]
        sof += bytes([c + 1, (hi << 4) | vi, 0])  # id, sampling, qtable 0
    out += seg(0xFFC0, sof)
    dht = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    dht += bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    out += seg(0xFFC4, dht)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)

    wr = _BitWriter()
    preds = [0] * ncomp

    def put_block(block: np.ndarray, ci: int) -> None:
        coef = _fdct(block.astype(np.float64) - 128.0)
        q = np.round(coef.reshape(-1)[ZIGZAG] / QTABLE).astype(np.int64)
        diff = int(q[0]) - preds[ci]
        preds[ci] = int(q[0])
        size, bits = _magnitude(diff)
        code, ln = _DC_ENC[size]
        wr.put(code, ln)
        if size:
            wr.put(bits, size)
        run = 0
        last_nz = 0
        for i in range(1, 64):
            if q[i] != 0:
                last_nz = i
        for i in range(1, last_nz + 1):
            if q[i] == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = _AC_ENC[0xF0]
                wr.put(code, ln)
                run -= 16
            size, bits = _magnitude(int(q[i]))
            code, ln = _AC_ENC[(run << 4) | size]
            wr.put(code, ln)
            wr.put(bits, size)
            run = 0
        if last_nz < 63:
            code, ln = _AC_ENC[0x00]
            wr.put(code, ln)

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux, mcuy = w // (8 * hmax), h // (8 * vmax)
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wr.align()
                wr.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * ncomp
            for ci, (plane, (hi, vi)) in enumerate(zip(planes, samps)):
                for byi in range(vi):
                    for bxi in range(hi):
                        r = (my * vi + byi) * 8
                        c = (mx * hi + bxi) * 8
                        put_block(plane[r : r + 8, c : c + 8], ci)
            mcu += 1
    out += wr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder

def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Decode a baseline JPEG within the declared subset to (H, W, C)
    uint8 (C = 1 or 3); None for anything else (progressive,
    arithmetic-coded, 12-bit, 16-bit quant tables, non-interleaved
    multi-component scans, truncated)."""
    if payload[:2] != b"\xff\xd8":
        return None
    try:
        return _decode_jpeg_inner(payload)
    except (IndexError, ValueError, OverflowError, struct.error):
        return None


def _decode_jpeg_inner(payload: bytes) -> np.ndarray | None:
    pos = 2
    n = len(payload)
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            return None
        # optional 0xFF fill bytes before a marker (B.1.1.2)
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2  # TEM / stray RSTn: standalone, no length field
            continue
        if marker == 0xD9:
            return None  # EOI before SOS
        if pos + 4 > n:
            return None
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables out of subset
                qtables[tq] = np.frombuffer(
                    body[i + 1 : i + 65], np.uint8
                ).astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                if len(vals) < nv:
                    return None  # truncated table segment
                enc = _canonical_codes(bits, vals)
                dec = {(c, ln): sym for sym, (c, ln) in enc.items()}
                (ac_tabs if tc else dc_tabs)[th] = dec
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec = body[0]
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    return None
                comps.append((cid, hi, vi, tq))
            if prec != 8 or ncomp not in (1, 3):
                return None
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                return None
            ns = body[0]
            sel = []
            for c in range(ns):
                cs, tabs = body[1 + 2 * c : 3 + 2 * c]
                sel.append((cs, tabs >> 4, tabs & 0x0F))
            h, w, comps = frame
            if ns == 1 and len(comps) > 1:
                return None  # non-interleaved multi-component scans
            if ns != len(comps):
                return None
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if any(hmax % c[1] or vmax % c[2] for c in comps):
                return None  # non-integer upsampling ratios
            # single-component scans are never interleaved (A.2.2):
            # sampling factors don't partition the scan into MCUs
            if ns == 1:
                hmax = vmax = 1
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            mcuy = -(-h // (8 * vmax))
            mcux = -(-w // (8 * hmax))
            planes = [
                np.zeros((mcuy * vi * 8, mcux * hi * 8))
                for (_cid, hi, vi, _tq) in comps
            ]
            qts = []
            dcs = []
            acs = []
            for (cid, hi, vi, tq), (_cs, td, ta) in zip(comps, sel):
                if tq not in qtables or td not in dc_tabs or ta not in ac_tabs:
                    return None
                qts.append(qtables[tq])
                dcs.append(dc_tabs[td])
                acs.append(ac_tabs[ta])
            rd = _BitReader(payload, pos + 2 + seg_len)
            preds = [0] * len(comps)

            def read_block(ci: int) -> np.ndarray:
                zz = np.zeros(64, dtype=np.int64)
                size = rd.huffman(dcs[ci])
                if size > 11:
                    raise ValueError("DC magnitude category > 11")
                diff = _extend(rd.bits(size), size)
                preds[ci] += diff
                zz[0] = preds[ci]
                i = 1
                while i < 64:
                    sym = rd.huffman(acs[ci])
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        i += 16
                        continue
                    run, sz = sym >> 4, sym & 0x0F
                    if sz > 10:
                        raise ValueError("AC magnitude category > 10")
                    i += run
                    if i >= 64:
                        raise ValueError("AC run past block end")
                    zz[i] = _extend(rd.bits(sz), sz)
                    i += 1
                coef = np.zeros(64)
                coef[ZIGZAG] = zz * qts[ci]
                return _idct(coef.reshape(8, 8)) + 128.0

            try:
                mcu = 0
                for my in range(mcuy):
                    for mx in range(mcux):
                        if restart_interval and mcu and mcu % restart_interval == 0:
                            rd.restart()
                            preds = [0] * len(comps)
                        for ci, (_cid, hi, vi, _tq) in enumerate(comps):
                            for byi in range(vi):
                                for bxi in range(hi):
                                    r = (my * vi + byi) * 8
                                    c = (mx * hi + bxi) * 8
                                    planes[ci][r : r + 8, c : c + 8] = (
                                        read_block(ci)
                                    )
                        mcu += 1
            except (IndexError, ValueError, OverflowError):
                return None
            # upsample subsampled components to full resolution
            # (sample replication; T.81 leaves the filter to the decoder)
            full = []
            for p, (_cid, hi, vi, _tq) in zip(planes, comps):
                if hi != hmax or vi != vmax:
                    p = np.repeat(
                        np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1
                    )
                full.append(p)
            out = [
                np.clip(np.round(p[:h, :w]), 0, 255).astype(np.uint8)
                for p in full
            ]
            if len(out) == 1:
                return out[0][:, :, None]
            y, cb, cr = (o.astype(np.float64) for o in out)
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b = y + 1.772 * (cb - 128.0)
            return np.stack(
                [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in (r, g, b)],
                axis=2,
            )
        pos += 2 + seg_len
        # skip APPn/COM and any other tables transparently
    return None
