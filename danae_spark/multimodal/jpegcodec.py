"""Baseline JPEG (ITU-T.81 sequential DCT) encode/decode, numpy-only.

This closes the last image-codec stub: the decoder handles real
baseline JPEGs — marker walk (incl. optional 0xFF fill bytes and
length-less TEM/RSTn markers, B.1.1.2), DQT/DHT table loading (tables
are read from the FILE, per spec, so no hard-coded Annex K data),
Huffman entropy decode with byte-unstuffing, differential DC
prediction, restart-marker handling (DRI/RSTn: byte-align, reset DC
predictors, E.2.4), dequantization, 2-D IDCT, level shift, chroma
upsampling for subsampled scans (4:2:0, 4:2:2 — any integer-ratio
sampling factors), YCbCr→RGB, and PROGRESSIVE (SOF2) frames — full
spectral selection + successive approximation per T.81 G.2 (DC/AC
first and refinement scans, EOB runs, correction bits, restarts),
accumulated in per-component coefficient grids and reconstructed at
EOI. Out-of-subset files (arithmetic-coded, hierarchical, 12-bit,
16-bit quant tables, truncated) return None and fall back to
`parse_image_header` metadata.

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

def _planes_to_image(planes, comps, hmax, vmax, h, w) -> np.ndarray:
    """Upsample subsampled component planes to full resolution (sample
    replication; T.81 leaves the filter to the decoder), crop, and
    convert YCbCr→RGB for 3-component frames."""
    full = []
    for p, (_cid, hi, vi, _tq) in zip(planes, comps):
        if hi != hmax or vi != vmax:
            p = np.repeat(
                np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1
            )
        full.append(p)
    out = [
        np.clip(np.round(p[:h, :w]), 0, 255).astype(np.uint8) for p in full
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


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Decode a baseline JPEG within the declared subset to (H, W, C)
    uint8 (C = 1 or 3); None for anything else (arithmetic-coded,
    hierarchical, 12-bit, 16-bit quant tables, sequential
    non-interleaved multi-component scans, truncated)."""
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
    progressive = False
    coefs = None
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
        if marker == 0xD9:  # EOI
            if progressive and coefs is not None and frame is not None:
                return _reconstruct_progressive(frame, coefs, qtables)
            return None  # EOI before SOS on the sequential path
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
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
            if progressive:
                # coefficient accumulators (zigzag order) for the whole
                # frame; scans fill them in spectral/approximation order
                fhmax = max(c[1] for c in comps)
                fvmax = max(c[2] for c in comps)
                if any(fhmax % c[1] or fvmax % c[2] for c in comps):
                    return None
                pmcuy = -(-h // (8 * fvmax))
                pmcux = -(-w // (8 * fhmax))
                coefs = [
                    np.zeros((pmcuy * vi, pmcux * hi, 64), dtype=np.int32)
                    for (_cid, hi, vi, _tq) in comps
                ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline/non-progressive frame types
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
            if progressive:
                ss, se, ahl = body[1 + 2 * ns : 4 + 2 * ns]
                pos = _decode_progressive_scan(
                    payload, pos + 2 + seg_len, frame, coefs, sel,
                    ss, se, ahl >> 4, ahl & 0x0F,
                    dc_tabs, ac_tabs, restart_interval,
                )
                continue
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
            return _planes_to_image(planes, comps, hmax, vmax, h, w)
        pos += 2 + seg_len
        # skip APPn/COM and any other tables transparently
    return None


# ---------------------------------------------- progressive (SOF2) decode

def _decode_progressive_scan(
    payload: bytes,
    start: int,
    frame,
    coefs,
    sel,
    ss: int,
    se: int,
    ah: int,
    al: int,
    dc_tabs,
    ac_tabs,
    restart_interval: int,
) -> int:
    """Decode ONE progressive scan's entropy segment into the frame's
    coefficient accumulators (T.81 G.2): DC first/refine scans
    (interleaved MCU order, or raster for single-component scans), AC
    first/refine scans (always single-component, raster over the
    component's own block grid) with EOB runs, successive-approximation
    bit semantics mirroring the G.1.2 decoders (and libjpeg's reference
    structure for the refinement correction-bit ordering). Returns the
    payload offset of the first marker after the scan."""
    h, w, comps = frame
    # G.1.1.1 scan-header constraints: DC scans are Ss=Se=0, AC bands
    # sit in [1, 63], refinements step one bit at a time
    if (ss == 0) != (se == 0) or se > 63 or ss > se:
        raise ValueError("invalid progressive spectral band")
    if ah and ah != al + 1:
        raise ValueError("successive approximation must step by one bit")
    if al > 13 or ah > 13:
        raise ValueError("invalid successive-approximation bit position")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    cid_to_ix = {cid: ix for ix, (cid, _hi, _vi, _tq) in enumerate(comps)}
    scan_ixs = []
    dcs = {}
    acs = {}
    for (cs, td, ta) in sel:
        if cs not in cid_to_ix:
            raise ValueError("scan references unknown component")
        ix = cid_to_ix[cs]
        scan_ixs.append(ix)
        if ss == 0 and ah == 0:
            if td not in dc_tabs:
                raise ValueError("missing DC table")
            dcs[ix] = dc_tabs[td]
        if ss > 0:
            if ta not in ac_tabs:
                raise ValueError("missing AC table")
            acs[ix] = ac_tabs[ta]
    rd = _BitReader(payload, start)
    eobrun = 0
    preds = {ix: 0 for ix in scan_ixs}
    p1, m1 = 1 << al, -1 << al

    def correct(blk, k) -> None:
        # refinement correction bit for an already-nonzero coefficient
        if rd.bits(1) and (int(blk[k]) & p1) == 0:
            blk[k] += p1 if blk[k] >= 0 else m1

    def dc_block(ix, by, bx) -> None:
        blk = coefs[ix][by, bx]
        if ah == 0:
            size = rd.huffman(dcs[ix])
            if size > 11:
                raise ValueError("DC magnitude category > 11")
            preds[ix] += _extend(rd.bits(size), size)
            blk[0] = preds[ix] << al
        elif rd.bits(1):
            blk[0] |= p1

    def ac_first(blk) -> None:
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = rd.huffman(acs[scan_ixs[0]])
            r, sz = rs >> 4, rs & 0x0F
            if sz == 0:
                if r < 15:  # EOBn: run of 2^r + bits(r) blocks incl. this
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += rd.bits(r)
                    return
                k += 16  # ZRL
                continue
            if sz > 10:
                raise ValueError("AC magnitude category > 10")
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(rd.bits(sz), sz) << al
            k += 1

    def ac_refine(blk) -> None:
        # T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine structure
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = rd.huffman(acs[scan_ixs[0]])
                r, sz = rs >> 4, rs & 0x0F
                if sz == 0:
                    if r < 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += rd.bits(r)
                        break
                    newval = 0  # ZRL: 16 zero-history positions
                else:
                    if sz != 1:
                        raise ValueError("refinement magnitude != 1")
                    newval = p1 if rd.bits(1) else m1
                while k <= se:
                    if blk[k] != 0:
                        correct(blk, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    correct(blk, k)
                k += 1
            eobrun -= 1

    def maybe_restart(unit: int) -> None:
        nonlocal eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            rd.restart()
            eobrun = 0
            for ix in preds:
                preds[ix] = 0

    if ss == 0:
        if len(sel) > 1:
            # interleaved DC scan: MCU order with sampling factors
            mcuy = -(-h // (8 * vmax))
            mcux = -(-w // (8 * hmax))
            mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart(mcu)
                    for ix in scan_ixs:
                        _cid, hi, vi, _tq = comps[ix]
                        for byi in range(vi):
                            for bxi in range(hi):
                                dc_block(ix, my * vi + byi, mx * hi + bxi)
                    mcu += 1
        else:
            ix = scan_ixs[0]
            _cid, hi, vi, _tq = comps[ix]
            comp_h = -(-h * vi // vmax)
            comp_w = -(-w * hi // hmax)
            bh, bw = -(-comp_h // 8), -(-comp_w // 8)
            for b, (by, bx) in enumerate(
                (by, bx) for by in range(bh) for bx in range(bw)
            ):
                maybe_restart(b)
                dc_block(ix, by, bx)
    else:
        if len(sel) != 1:
            raise ValueError("progressive AC scans are single-component")
        ix = scan_ixs[0]
        _cid, hi, vi, _tq = comps[ix]
        comp_h = -(-h * vi // vmax)
        comp_w = -(-w * hi // hmax)
        bh, bw = -(-comp_h // 8), -(-comp_w // 8)
        fn = ac_first if ah == 0 else ac_refine
        for b, (by, bx) in enumerate(
            (by, bx) for by in range(bh) for bx in range(bw)
        ):
            maybe_restart(b)
            fn(coefs[ix][by, bx])
    # drain padding: rd.pos now sits at the next marker
    return rd.pos


def _reconstruct_progressive(frame, coefs, qtables) -> np.ndarray | None:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for ci, (_cid, hi, vi, tq) in enumerate(comps):
        if tq not in qtables:
            return None
        q = qtables[tq].astype(np.int64)
        grid = coefs[ci]
        by_n, bx_n = grid.shape[0], grid.shape[1]
        plane = np.zeros((by_n * 8, bx_n * 8))
        for by in range(by_n):
            for bx in range(bx_n):
                zz = grid[by, bx].astype(np.int64)
                coef = np.zeros(64)
                coef[ZIGZAG] = zz * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct(coef.reshape(8, 8)) + 128.0
                )
        planes.append(plane)
    return _planes_to_image(planes, comps, hmax, vmax, h, w)


# ---------------------------------------------- progressive (SOF2) encode

# progressive AC table: baseline's 162 (run,size) symbols plus the EOBn
# symbols 0x10..0xE0 (run-of-EOB lengths 2^1..2^14) — 176 symbols, all
# 8-bit canonical codes (176 < 256 slots, all-ones unused per spec)
PROG_AC_VALS = AC_VALS + [r << 4 for r in range(1, 15)]
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
_PROG_AC_ENC = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)

# default scans script: spectral selection + 2-level successive
# approximation on the AC band, 1-level on DC — the libjpeg-style shape
# that exercises every progressive code path (DC first/refine, AC
# first with EOB runs, AC refine with correction bits)


def synth_jpeg_progressive(
    lum: np.ndarray,
    color: bool = False,
    restart_interval: int = 0,
    chroma: tuple[int, int] = (128, 128),
) -> bytes:
    """Spec-conformant PROGRESSIVE JPEG (SOF2) for a (h, w) luma grid:
    DC-first (Al=1) → per-component AC spectral bands (Al=2) →
    AC refinements (Ah=2→1, then 1→0) → DC refinement — with EOB runs,
    refinement correction bits (the jcphuff emission order), and
    optional restart intervals. Because progressive vs sequential
    differ ONLY in entropy-coding order, decode(synth_jpeg_progressive
    (x)) must equal decode(synth_jpeg(x)) exactly — the pytest pins
    that structural equality on random images."""
    h, w = lum.shape
    if h % 8 or w % 8:
        raise ValueError("synth_jpeg_progressive needs multiple-of-8 dims")
    ncomp = 3 if color else 1
    planes = [lum]
    if color:
        planes += [
            np.full_like(lum, chroma[0]),
            np.full_like(lum, chroma[1]),
        ]
    bh, bw = h // 8, w // 8
    # quantized zigzag coefficient grids, one per component (4:4:4)
    q = [np.zeros((bh, bw, 64), dtype=np.int64) for _ in range(ncomp)]
    for ci, plane in enumerate(planes):
        for by in range(bh):
            for bx in range(bw):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _fdct(block.astype(np.float64) - 128.0)
                q[ci][by, bx] = np.round(
                    coef.reshape(-1)[ZIGZAG] / QTABLE
                ).astype(np.int64)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, bytes([0]) + bytes(int(QTABLE[i]) for i in range(64)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])
    out += seg(0xFFC2, sof)  # SOF2
    dht = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    dht += bytes([0x10]) + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALS)
    out += seg(0xFFC4, dht)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))

    def sos_header(comp_ids, ss_, se_, ah_, al_) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss_, se_, (ah_ << 4) | al_])
        return seg(0xFFDA, body)

    def emit_dc_scan(al_, refine: bool) -> bytes:
        wr = _BitWriter()
        preds = [0] * ncomp
        rst = 0
        for b, (by, bx) in enumerate(
            (by, bx) for by in range(bh) for bx in range(bw)
        ):
            if restart_interval and b and b % restart_interval == 0:
                wr.align()
                wr.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * ncomp
            for ci in range(ncomp):
                v = int(q[ci][by, bx, 0])
                if refine:
                    wr.put((v >> al_) & 1, 1)
                else:
                    t = v >> al_
                    diff = t - preds[ci]
                    preds[ci] = t
                    size, bits = _magnitude(diff)
                    code, ln = _DC_ENC[size]
                    wr.put(code, ln)
                    if size:
                        wr.put(bits, size)
        return wr.flush()

    def emit_ac_first(ci, ss_, se_, al_) -> bytes:
        wr = _BitWriter()
        eobrun = 0
        rst = 0

        def flush_eob() -> None:
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                code, ln = _PROG_AC_ENC[nb << 4]
                wr.put(code, ln)
                if nb:
                    wr.put(eobrun - (1 << nb), nb)
                eobrun = 0

        for b, (by, bx) in enumerate(
            (by, bx) for by in range(bh) for bx in range(bw)
        ):
            if restart_interval and b and b % restart_interval == 0:
                flush_eob()
                wr.align()
                wr.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
            blk = q[ci][by, bx]
            t = [
                (abs(int(v)) >> al_) * (1 if v > 0 else -1)
                for v in blk[ss_ : se_ + 1]
            ]
            nz = [i for i, v in enumerate(t) if v != 0]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            r = 0
            for i in range(nz[-1] + 1):
                if t[i] == 0:
                    r += 1
                    continue
                while r > 15:
                    code, ln = _PROG_AC_ENC[0xF0]
                    wr.put(code, ln)
                    r -= 16
                size, bits = _magnitude(t[i])
                code, ln = _PROG_AC_ENC[(r << 4) | size]
                wr.put(code, ln)
                wr.put(bits, size)
                r = 0
            if nz[-1] < se_ - ss_:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return wr.flush()

    def emit_ac_refine(ci, ss_, se_, ah_, al_) -> bytes:
        # jcphuff encode_mcu_AC_refine emission order
        wr = _BitWriter()
        eobrun = 0
        be: list[int] = []  # correction bits buffered behind an EOB run
        rst = 0

        def flush_eob() -> None:
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                code, ln = _PROG_AC_ENC[nb << 4]
                wr.put(code, ln)
                if nb:
                    wr.put(eobrun - (1 << nb), nb)
                eobrun = 0
            for bit in be:
                wr.put(bit, 1)
            be.clear()

        for b, (by, bx) in enumerate(
            (by, bx) for by in range(bh) for bx in range(bw)
        ):
            if restart_interval and b and b % restart_interval == 0:
                flush_eob()
                wr.align()
                wr.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
            blk = q[ci][by, bx]
            absv = [abs(int(v)) >> al_ for v in blk[ss_ : se_ + 1]]
            eob = -1
            for i, a in enumerate(absv):
                if a == 1:
                    eob = i
            r = 0
            br: list[int] = []
            for i, a in enumerate(absv):
                if a == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    flush_eob()
                    code, ln = _PROG_AC_ENC[0xF0]
                    wr.put(code, ln)
                    r -= 16
                    for bit in br:
                        wr.put(bit, 1)
                    br.clear()
                if a > 1:
                    br.append(a & 1)
                    continue
                flush_eob()
                code, ln = _PROG_AC_ENC[(r << 4) | 1]
                wr.put(code, ln)
                wr.put(1 if blk[ss_ + i] > 0 else 0, 1)
                for bit in br:
                    wr.put(bit, 1)
                br.clear()
                r = 0
            if r > 0 or br:
                eobrun += 1
                be.extend(br)
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return wr.flush()

    all_ids = list(range(1, ncomp + 1))
    # DC first (Al=1), interleaved over all components
    out += sos_header(all_ids, 0, 0, 0, 1) + emit_dc_scan(1, refine=False)
    # AC first scans at Al=2: split the luma spectrum, whole band for chroma
    out += sos_header([1], 1, 5, 0, 2) + emit_ac_first(0, 1, 5, 2)
    out += sos_header([1], 6, 63, 0, 2) + emit_ac_first(0, 6, 63, 2)
    for ci in range(1, ncomp):
        out += sos_header([ci + 1], 1, 63, 0, 2) + emit_ac_first(ci, 1, 63, 2)
    # AC refinements Ah=2→Al=1, then Ah=1→Al=0
    for ah_, al_ in ((2, 1), (1, 0)):
        for ci in range(ncomp):
            out += sos_header([ci + 1], 1, 63, ah_, al_) + emit_ac_refine(
                ci, 1, 63, ah_, al_
            )
    # DC refinement Ah=1→Al=0
    out += sos_header(all_ids, 0, 0, 1, 0) + emit_dc_scan(0, refine=True)
    out += b"\xff\xd9"
    return bytes(out)
