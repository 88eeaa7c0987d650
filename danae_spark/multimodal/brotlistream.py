"""RFC 7932 (brotli) stream-framing codec — the stored-mode subset.

Common Crawl responses increasingly ship `Content-Encoding: br`; until
r14 the WARC decoder rejected them wholesale (correct, but lossy and —
worse — invisible). This module implements the brotli STREAM LAYER
from the RFC: the WBITS window header (§9.1's variable-length code,
all 15 legal values), the meta-block ladder (ISLAST / ISLASTEMPTY /
MNIBBLES / MLEN), metadata meta-blocks (reserved-bit check, MSKIPBYTES
framing, byte-aligned skip with zero-padding enforcement), and
UNCOMPRESSED meta-blocks (byte-aligned verbatim copy). Compressed
meta-blocks return None HERE; since r15 the FULL decoder lives in
multimodal/brotlicodec.py (prefix codes, context modeling, static
dictionary + transforms) and is what the crawl surface wires in —
this module remains the minimal framing layer and the stored-mode
ENCODER used by the synth rotation.

That subset is not a toy: stored-mode streams are what servers emit
for already-compressed payloads (images inside HTML pipelines,
pre-gzipped bundles) and what `brotli -q 0`-class encoders produce for
incompressible data, and the framing layer is where truncation and
corruption are detected. The paired encoder (`brotli_store`) emits
spec-valid stored-mode streams for the synth rotation, so the decode
path runs on every oracle sweep.

Bit order: brotli reads bits LSB-first within each byte (RFC 7932 §2).
"""

from __future__ import annotations


class _BitReader:
    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int | None:
        """n bits LSB-first; None past end-of-stream."""
        if self.bitpos + n > len(self.data) * 8:
            return None
        v = 0
        for i in range(n):
            p = self.bitpos + i
            v |= ((self.data[p >> 3] >> (p & 7)) & 1) << i
        self.bitpos += n
        return v

    def align(self) -> bool:
        """Skip to the next byte boundary; padding bits must be ZERO
        (RFC 7932: 'skip any bits up to the next byte boundary' — the
        spec requires encoders to emit zeros and conformant decoders
        may reject garbage; we do, it catches bit-level corruption)."""
        pad = -self.bitpos % 8
        if pad:
            v = self.read(pad)
            if v is None or v != 0:
                return False
        return True

    def take_bytes(self, n: int) -> bytes | None:
        assert self.bitpos % 8 == 0
        start = self.bitpos >> 3
        if start + n > len(self.data):
            return None
        self.bitpos += n * 8
        return self.data[start : start + n]

    def at_end(self) -> bool:
        return self.bitpos == len(self.data) * 8


def _read_wbits(r: _BitReader) -> int | None:
    """§9.1 window-size code: 1, 4, or 7 bits -> WBITS in 10..24."""
    b = r.read(1)
    if b is None:
        return None
    if b == 0:
        return 16
    n = r.read(3)
    if n is None:
        return None
    if n != 0:
        return 17 + n  # 18..24
    m = r.read(3)
    if m is None:
        return None
    if m == 0:
        return 17
    if m == 1:
        return None  # reserved: invalid stream
    return 8 + m  # 10..15


def brotli_stored_decode(payload: bytes) -> bytes | None:
    """Decode a brotli stream whose data meta-blocks are all
    UNCOMPRESSED (stored). Returns None on: truncation, reserved /
    invalid framing, nonzero byte-alignment padding, a compressed
    meta-block (unsupported — reject-whole), trailing garbage after
    the last block."""
    r = _BitReader(payload)
    if _read_wbits(r) is None:
        return None
    out = bytearray()
    while True:
        islast = r.read(1)
        if islast is None:
            return None
        if islast:
            isempty = r.read(1)
            if isempty is None:
                return None
            if isempty:
                # stream ends: remaining bits of the final byte must be
                # zero padding, and nothing may follow
                if not r.align() or not r.at_end():
                    return None
                return bytes(out)
            # a non-empty LAST meta-block cannot be uncompressed (the
            # ISUNCOMPRESSED bit exists only when ISLAST=0): it is
            # necessarily compressed -> unsupported
            return None
        mnibbles_code = r.read(2)
        if mnibbles_code is None:
            return None
        if mnibbles_code == 3:
            # metadata meta-block: 1 reserved bit (must be 0),
            # MSKIPBYTES (2 bits), MSKIPLEN, byte-align, skip
            reserved = r.read(1)
            if reserved is None or reserved != 0:
                return None
            mskipbytes = r.read(2)
            if mskipbytes is None:
                return None
            mskiplen = 0
            if mskipbytes:
                v = r.read(8 * mskipbytes)
                if v is None:
                    return None
                # the most significant byte must be nonzero (no
                # over-long encodings)
                if mskipbytes > 1 and (v >> (8 * (mskipbytes - 1))) == 0:
                    return None
                if v == 0:
                    return None
                mskiplen = v + 1
            if not r.align():
                return None
            if r.take_bytes(mskiplen) is None:
                return None
            continue
        nnib = 4 + mnibbles_code  # 4, 5, or 6 nibbles
        v = r.read(4 * nnib)
        if v is None:
            return None
        if nnib > 4 and (v >> (4 * (nnib - 1))) == 0:
            return None  # over-long MLEN encoding
        mlen = v + 1
        isuncompressed = r.read(1)
        if isuncompressed is None:
            return None
        if not isuncompressed:
            return None  # compressed meta-block: unsupported, reject-whole
        if not r.align():
            return None
        chunk = r.take_bytes(mlen)
        if chunk is None:
            return None
        out += chunk


class _BitWriter:
    __slots__ = ("buf", "cur", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.cur |= ((value >> i) & 1) << self.nbits
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def align(self) -> None:
        if self.nbits:
            self.buf.append(self.cur)
            self.cur = 0
            self.nbits = 0

    def raw(self, data: bytes) -> None:
        assert self.nbits == 0
        self.buf += data


def brotli_store(data: bytes, chunk: int = 65536) -> bytes:
    """Encode `data` as a spec-valid brotli stream of UNCOMPRESSED
    meta-blocks (<=64 KiB each fits the 4-nibble MLEN) followed by the
    empty LAST block — decodable by any conformant brotli decoder,
    and by brotli_stored_decode above."""
    w = _BitWriter()
    w.write(0, 1)  # WBITS = 16
    for i in range(0, len(data), chunk):
        piece = data[i : i + chunk]
        w.write(0, 1)  # ISLAST = 0
        w.write(0, 2)  # MNIBBLES code 0 -> 4 nibbles
        w.write(len(piece) - 1, 16)  # MLEN - 1
        w.write(1, 1)  # ISUNCOMPRESSED
        w.align()
        w.raw(bytes(piece))
    w.write(1, 1)  # ISLAST
    w.write(1, 1)  # ISLASTEMPTY
    w.align()
    return bytes(w.buf)
