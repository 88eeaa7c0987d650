"""Baseline JPEG (ITU-T.81 sequential DCT) encode/decode, numpy-only.

This closes the last image-codec stub: the decoder handles real
baseline JPEGs — marker walk, DQT/DHT table loading (tables are read
from the FILE, per spec, so no hard-coded Annex K data), Huffman
entropy decode with byte-unstuffing, differential DC prediction,
dequantization, 2-D IDCT, level shift, and YCbCr→RGB for 4:4:4 —
restricted to the declared subset: 8-bit baseline sequential,
grayscale or 4:4:4 (no chroma subsampling), no restart markers, no
progressive. Out-of-subset files return None and fall back to
`parse_image_header` metadata.

The encoder emits spec-conformant files (SOI, DQT, SOF0, DHT, SOS,
entropy-coded segment with 0xFF00 stuffing, EOI) using canonical
Huffman tables embedded in DHT — any standard JPEG decoder can read
them. JPEG is lossy, so the oracle strategy differs from the other
formats: an image that is CONSTANT PER 8×8 BLOCK with values that are
exact multiples of the DC quantization step reconstructs EXACTLY
(every AC coefficient is zero; the DC quantizes without error), which
makes the full encode→decode→hash round trip DuckDB-value-checkable
even for a lossy codec, while general images are covered by lossy
error-bound pytests.
"""

from __future__ import annotations

import struct

import numpy as np

# flat quantization tables: DC step 16 (block-constant images whose
# level-shifted DC is a multiple of 16 reconstruct exactly), AC step 16
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

# orthonormal 2-D DCT-II basis (the T.81 FDCT/IDCT up to the 1/4
# scaling folded into the matrix): coeff = C · block · Cᵀ
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _fdct(block: np.ndarray) -> np.ndarray:
    return 2.0 * (_C @ block @ _C.T)  # ×2 matches T.81's S(u,v) scale


def _idct(coef: np.ndarray) -> np.ndarray:
    return (_C.T @ (coef / 2.0) @ _C)


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

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-pad to byte edge (spec)
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

def synth_jpeg(lum: np.ndarray, color: bool = False) -> bytes:
    """Spec-conformant baseline JPEG for a (h, w) luma grid, h and w
    multiples of 8. color=True writes 4:4:4 YCbCr with neutral chroma
    (Cb=Cr=128 → R=G=B=Y after conversion)."""
    h, w = lum.shape
    if h % 8 or w % 8:
        raise ValueError("synth_jpeg needs multiple-of-8 dimensions")
    ncomp = 3 if color else 1

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFDB, bytes([0]) + bytes(int(QTABLE[i]) for i in range(64)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])  # id, 1×1 sampling, qtable 0
    out += seg(0xFFC0, sof)
    dht = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    dht += bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    out += seg(0xFFC4, dht)
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    wr = _BitWriter()
    planes = [lum]
    if color:
        planes += [np.full_like(lum, 128), np.full_like(lum, 128)]
    # 1×1 sampling → MCU is one block per component, interleaved
    preds = [0] * ncomp
    h8, w8 = h // 8, w // 8
    for by in range(h8):
        for bx in range(w8):
            for ci, plane in enumerate(planes):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                    np.float64
                ) - 128.0
                coef = _fdct(block)
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
    out += wr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder

def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Decode a baseline JPEG within the declared subset to (H, W, C)
    uint8 (C = 1 or 3); None for anything else (progressive, subsampled,
    restart-interval, 12-bit, arithmetic-coded, truncated)."""
    if payload[:2] != b"\xff\xd8":
        return None
    try:
        return _decode_jpeg_inner(payload)
    except (IndexError, ValueError, struct.error):
        return None


def _decode_jpeg_inner(payload: bytes) -> np.ndarray | None:
    pos = 2
    n = len(payload)
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD9:
            return None  # EOI before SOS
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
                if samp != 0x11:
                    return None  # subsampling out of subset
                comps.append((cid, tq))
            if prec != 8 or ncomp not in (1, 3):
                return None
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:
            return None  # restart intervals out of subset
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                return None
            ns = body[0]
            sel = []
            for c in range(ns):
                cs, tabs = body[1 + 2 * c : 3 + 2 * c]
                sel.append((cs, tabs >> 4, tabs & 0x0F))
            h, w, comps = frame
            h8, w8 = -(-h // 8), -(-w // 8)
            planes = [np.zeros((h8 * 8, w8 * 8)) for _ in comps]
            qts = []
            dcs = []
            acs = []
            for (cid, tq), (_cs, td, ta) in zip(comps, sel):
                if tq not in qtables or td not in dc_tabs or ta not in ac_tabs:
                    return None
                qts.append(qtables[tq])
                dcs.append(dc_tabs[td])
                acs.append(ac_tabs[ta])
            rd = _BitReader(payload, pos + 2 + seg_len)
            preds = [0] * len(comps)
            try:
                for by in range(h8):
                    for bx in range(w8):
                        for ci in range(len(comps)):
                            zz = np.zeros(64, dtype=np.int64)
                            size = rd.huffman(dcs[ci])
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
                                i += run
                                if i >= 64:
                                    return None
                                zz[i] = _extend(rd.bits(sz), sz)
                                i += 1
                            coef = np.zeros(64)
                            coef[ZIGZAG] = zz * qts[ci]
                            block = _idct(coef.reshape(8, 8)) + 128.0
                            planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
            except (IndexError, ValueError):
                return None
            out = [
                np.clip(np.round(p[:h, :w]), 0, 255).astype(np.uint8)
                for p in planes
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
