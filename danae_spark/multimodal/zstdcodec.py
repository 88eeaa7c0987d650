"""RFC 8878 (zstandard) decoder — full compressed-block support.

Extends the r14 frame-layer subset (multimodal/zstdstream.py, which
decoded Raw/RLE blocks only) to the complete format: FSE table
descriptions and decoding tables (§4.1), Huffman-coded literals with
FSE-compressed or direct weights, in one or four streams (§4.2.1),
the three sequence symbol codes with predefined / RLE / FSE-compressed
/ repeat table modes (§4.2.2), backward bitstreams with sentinel bits,
the repeat-offset history with the literals-length-zero twist, and
sequence execution against the in-frame window. Frame layer semantics
(magic, descriptors, skippable frames, XXH64 content checksum,
trailing-garbage reject) are shared with zstdstream.py, which remains
the stored-mode encoder for the synth rotation.

Contract: `zstd_decode(payload)` returns decoded bytes or None —
reject-whole on any malformation (truncation, bad FSE/Huffman tables,
bitstream over/under-consumption, offsets beyond the frame window,
checksum mismatch, trailing garbage). Output is budget-capped
(`max_out`) as a decompression-bomb guard.

Reference parity: tests/test_zstd_codec.py verifies byte-exact
round-trips against the reference encoder (pyarrow's bundled zstd)
across compression levels and data shapes, plus truncation / bit-flip
/ garbage fuzz and a bit-flip differential against the reference
decoder.

Scale shape: pure per-record CPU, run inside the same Arrow
mapInPandas batches as the other wire decoders (warc._content_decode).
"""

from __future__ import annotations

from danae_spark.multimodal.zstdstream import xxh64

__all__ = ["zstd_decode"]

_MAGIC = 0xFD2FB528
_SKIP_LO = 0x184D2A50
_SKIP_HI = 0x184D2A5F


class _Bad(Exception):
    pass


# --------------------------------------------------------- bit readers


class _Fwd:
    """Forward LSB-first bit reader (FSE table descriptions, §4.1.1)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        pos = self.pos
        if pos + n > len(self.data) * 8:
            raise _Bad
        v = 0
        for i in range(n):
            v |= ((self.data[pos >> 3] >> (pos & 7)) & 1) << i
            pos += 1
        self.pos = pos
        return v

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3


class _Back:
    """Backward bitstream (§3.1.1.3.2): written forward, read from the
    last byte's sentinel bit downward."""

    __slots__ = ("val", "bits")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise _Bad  # missing sentinel
        self.val = int.from_bytes(data, "little")
        self.bits = (len(data) - 1) * 8 + data[-1].bit_length() - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if n > self.bits:
            raise _Bad
        self.bits -= n
        return (self.val >> self.bits) & ((1 << n) - 1)

    def peek_pad(self, n: int) -> int:
        """Peek n bits, zero-padding past the start (Huffman tail)."""
        if self.bits >= n:
            return (self.val >> (self.bits - n)) & ((1 << n) - 1)
        return (self.val << (n - self.bits)) & ((1 << n) - 1)

    def consume(self, n: int) -> None:
        self.bits -= n
        if self.bits < 0:
            raise _Bad


# ------------------------------------------------------------ FSE core


def _fse_read_distribution(data: bytes) -> tuple[int, list[int], int]:
    """§4.1.1 FSE table description: returns (accuracy_log, counts,
    bytes consumed). counts[i] is the normalized probability of symbol
    i (-1 for 'less than 1')."""
    r = _Fwd(data)
    acc = r.read(4) + 5
    if acc > 9:
        raise _Bad
    remaining = (1 << acc) + 1
    threshold = 1 << acc
    nbits = acc + 1
    counts: list[int] = []
    while remaining > 1:
        if len(counts) > 255:
            raise _Bad
        maxv = (2 * threshold - 1) - remaining
        low = r.read(nbits - 1)
        if low < maxv:
            count = low  # small value: nbits-1 bits suffice
        else:
            extra = r.read(1)
            full = low | (extra << (nbits - 1))
            count = full if full < threshold else full - maxv
        proba = count - 1
        remaining -= proba if proba > 0 else 1 if proba < 0 else 0
        counts.append(proba)
        if proba == 0:
            while True:
                rep = r.read(2)
                counts.extend([0] * rep)
                if len(counts) > 256:
                    raise _Bad
                if rep != 3:
                    break
        while remaining > 1 and remaining < threshold:
            threshold >>= 1
            nbits -= 1
    if remaining != 1:
        raise _Bad
    return acc, counts, r.bytes_consumed()


class _FseTable:
    """FSE decoding table: per-state (symbol, num_bits, baseline)."""

    __slots__ = ("acc", "symbol", "nbits", "baseline")

    def __init__(self, acc: int, counts: list[int]):
        size = 1 << acc
        self.acc = acc
        symbol = [0] * size
        high = size - 1
        # -1 probabilities take single cells from the top
        for s, p in enumerate(counts):
            if p == -1:
                symbol[high] = s
                high -= 1
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        pos = 0
        for s, p in enumerate(counts):
            if p <= 0:
                continue
            for _ in range(p):
                symbol[pos] = s
                pos = (pos + step) & mask
                while pos > high:
                    pos = (pos + step) & mask
        if pos != 0:
            raise _Bad
        nxt = [max(p, 0) for p in counts]
        nbits = [0] * size
        baseline = [0] * size
        for i in range(size):
            s = symbol[i]
            if i > high:
                # -1 cell: full reset
                nbits[i] = acc
                baseline[i] = 0
                continue
            x = nxt[s]
            nxt[s] += 1
            nb = acc - (x.bit_length() - 1)
            nbits[i] = nb
            baseline[i] = (x << nb) - size
        self.symbol = symbol
        self.nbits = nbits
        self.baseline = baseline

    @classmethod
    def rle(cls, sym: int) -> "_FseTable":
        t = object.__new__(cls)
        t.acc = 0
        t.symbol = [sym]
        t.nbits = [0]
        t.baseline = [0]
        return t


def _fse_init_state(t: _FseTable, b: _Back) -> int:
    return b.read(t.acc)


def _fse_update(t: _FseTable, state: int, b: _Back) -> int:
    return t.baseline[state] + b.read(t.nbits[state])


# ----------------------------------------------------------- Huffman


class _Huf:
    __slots__ = ("log", "table")

    def __init__(self, weights: list[int]):
        total = sum((1 << (w - 1)) for w in weights if w)
        if total == 0:
            raise _Bad
        log = (total - 1).bit_length()
        rest = (1 << log) - total
        if rest == 0:
            # already a power of two means the implied last weight would
            # be zero — invalid per §4.2.1.2
            raise _Bad
        if rest & (rest - 1):
            raise _Bad  # last weight must complete to a power of two
        last_w = rest.bit_length()
        weights = weights + [last_w]
        log = max(log, last_w)  # total now 1 << log
        total += rest
        log = (total).bit_length() - 1
        if log > 11:
            raise _Bad
        table: list[tuple[int, int]] = [(0, 0)] * (1 << log)
        # fill by ascending weight; within a weight, ascending symbol
        rank_start = [0] * (log + 2)
        counts = [0] * (log + 2)
        for w in weights:
            if w:
                counts[w] += 1
        pos = 0
        for w in range(1, log + 2):
            rank_start[w] = pos
            pos += counts[w] * (1 << (w - 1))
        if pos != (1 << log):
            raise _Bad
        for sym, w in enumerate(weights):
            if not w:
                continue
            ln = 1 << (w - 1)
            start = rank_start[w]
            nb = log + 1 - w
            for i in range(start, start + ln):
                table[i] = (sym, nb)
            rank_start[w] += ln
        self.log = log
        self.table = table

    def decode_stream(self, data: bytes, out_len: int) -> bytes:
        b = _Back(data)
        out = bytearray()
        log = self.log
        table = self.table
        for _ in range(out_len):
            sym, nb = table[b.peek_pad(log)]
            b.consume(nb)
            out.append(sym)
        if b.bits != 0:
            raise _Bad
        return bytes(out)


def _read_huffman(data: bytes) -> tuple[_Huf, int]:
    """Huffman tree description (§4.2.1.2): (table, bytes consumed)."""
    if not data:
        raise _Bad
    hb = data[0]
    if hb >= 128:
        nsym = hb - 127
        nbytes = (nsym + 1) >> 1
        if 1 + nbytes > len(data):
            raise _Bad
        weights = []
        for i in range(nsym):
            byte = data[1 + (i >> 1)]
            weights.append((byte >> 4) if i % 2 == 0 else (byte & 0xF))
        return _Huf(weights), 1 + nbytes
    # FSE-compressed weights
    if 1 + hb > len(data):
        raise _Bad
    blob = data[1 : 1 + hb]
    acc, counts, used = _fse_read_distribution(blob)
    if acc > 6:
        raise _Bad
    table = _FseTable(acc, counts)
    stream = blob[used:]
    b = _Back(stream)
    s1 = _fse_init_state(table, b)
    s2 = _fse_init_state(table, b)
    weights: list[int] = []
    while True:
        if len(weights) > 254:
            raise _Bad
        weights.append(table.symbol[s1])
        if table.nbits[s1] > b.bits:
            weights.append(table.symbol[s2])
            break
        s1 = _fse_update(table, s1, b)
        weights.append(table.symbol[s2])
        if len(weights) > 255:
            raise _Bad
        if table.nbits[s2] > b.bits:
            weights.append(table.symbol[s1])
            break
        s2 = _fse_update(table, s2, b)
    return _Huf(weights), 1 + hb


# --------------------------------------------------- sequence tables

# predefined distributions (§4.2.2.3, verified against the reference
# decoder by the differential tests)
_LL_DEF = (
    6,
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
)
_ML_DEF = (
    6,
    [1, 4, 3, 2, 2, 2, 2, 2, 2] + [1] * 37 + [-1] * 7,
)
_OF_DEF = (
    5,
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
)

# literals-length code -> (baseline, extra bits)
_LL_BASE: list[tuple[int, int]] = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10),
    (2048, 11), (4096, 12), (8192, 13), (16384, 14), (32768, 15),
    (65536, 16),
]
# match-length code -> (baseline, extra bits)
_ML_BASE: list[tuple[int, int]] = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16),
]

_MAX_ACC = {"ll": 9, "of": 8, "ml": 9}


def _read_seq_table(
    mode: int,
    data: bytes,
    pos: int,
    kind: str,
    default: tuple[int, list[int]],
    prev: _FseTable | None,
    max_sym: int,
) -> tuple[_FseTable, int]:
    if mode == 0:
        return _FseTable(*default), pos
    if mode == 1:
        if pos >= len(data):
            raise _Bad
        sym = data[pos]
        if sym > max_sym:
            raise _Bad
        return _FseTable.rle(sym), pos + 1
    if mode == 2:
        acc, counts, used = _fse_read_distribution(data[pos:])
        if acc > _MAX_ACC[kind] or len(counts) > max_sym + 1:
            raise _Bad
        return _FseTable(acc, counts), pos + used
    if prev is None:
        raise _Bad  # repeat mode without a previous table
    return prev, pos


class _FrameState:
    __slots__ = ("huf", "ll", "of", "ml", "rep")

    def __init__(self) -> None:
        self.huf: _Huf | None = None
        self.ll: _FseTable | None = None
        self.of: _FseTable | None = None
        self.ml: _FseTable | None = None
        self.rep = [1, 4, 8]


# ------------------------------------------------------ block decode


def _decode_literals(
    block: bytes, st: _FrameState
) -> tuple[bytes, int]:
    """§4.2.1: returns (literals, bytes consumed from block)."""
    if not block:
        raise _Bad
    b0 = block[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if sf in (0, 2):
            size = b0 >> 3
            hlen = 1
        elif sf == 1:
            if len(block) < 2:
                raise _Bad
            size = (b0 >> 4) | (block[1] << 4)
            hlen = 2
        else:
            if len(block) < 3:
                raise _Bad
            size = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hlen = 3
        if ltype == 0:
            if hlen + size > len(block):
                raise _Bad
            return block[hlen : hlen + size], hlen + size
        if hlen >= len(block):
            raise _Bad
        return bytes([block[hlen]]) * size, hlen + 1
    # Compressed / Treeless
    if sf == 0:
        nstreams, hlen = 1, 3
        if len(block) < 3:
            raise _Bad
        hdr = int.from_bytes(block[:3], "little")
        reg = (hdr >> 4) & 0x3FF
        comp = (hdr >> 14) & 0x3FF
    elif sf == 1:
        nstreams, hlen = 4, 3
        if len(block) < 3:
            raise _Bad
        hdr = int.from_bytes(block[:3], "little")
        reg = (hdr >> 4) & 0x3FF
        comp = (hdr >> 14) & 0x3FF
    elif sf == 2:
        nstreams, hlen = 4, 4
        if len(block) < 4:
            raise _Bad
        hdr = int.from_bytes(block[:4], "little")
        reg = (hdr >> 4) & 0x3FFF
        comp = (hdr >> 18) & 0x3FFF
    else:
        nstreams, hlen = 4, 5
        if len(block) < 5:
            raise _Bad
        hdr = int.from_bytes(block[:5], "little")
        reg = (hdr >> 4) & 0x3FFFF
        comp = (hdr >> 22) & 0x3FFFF
    if hlen + comp > len(block):
        raise _Bad
    body = block[hlen : hlen + comp]
    if ltype == 2:
        huf, used = _read_huffman(body)
        st.huf = huf
        body = body[used:]
    else:
        huf = st.huf
        if huf is None:
            raise _Bad  # treeless with no previous table
    if nstreams == 1:
        lits = huf.decode_stream(body, reg)
    else:
        if len(body) < 6:
            raise _Bad
        s1 = int.from_bytes(body[0:2], "little")
        s2 = int.from_bytes(body[2:4], "little")
        s3 = int.from_bytes(body[4:6], "little")
        rest = body[6:]
        if s1 + s2 + s3 > len(rest):
            raise _Bad
        per = (reg + 3) >> 2
        last = reg - 3 * per
        if last < 0:
            raise _Bad
        parts = [
            rest[:s1],
            rest[s1 : s1 + s2],
            rest[s1 + s2 : s1 + s2 + s3],
            rest[s1 + s2 + s3 :],
        ]
        lits = b"".join(
            huf.decode_stream(p, n)
            for p, n in zip(parts, (per, per, per, last))
        )
    if len(lits) != reg:
        raise _Bad
    return lits, hlen + comp


def _decode_block(block: bytes, st: _FrameState, out: bytearray) -> None:
    """§4.2: decode one compressed block, appending to the frame
    output `out` (matches may reference earlier frame bytes)."""
    lits, used = _decode_literals(block, st)
    seqpart = block[used:]
    if not seqpart:
        raise _Bad
    b0 = seqpart[0]
    if b0 < 128:
        nseq = b0
        pos = 1
    elif b0 < 255:
        if len(seqpart) < 2:
            raise _Bad
        nseq = ((b0 - 128) << 8) + seqpart[1]
        pos = 2
    else:
        if len(seqpart) < 3:
            raise _Bad
        nseq = seqpart[1] + (seqpart[2] << 8) + 0x7F00
        pos = 3
    if nseq == 0:
        if seqpart[pos:]:
            raise _Bad  # no sequences: nothing may follow
        out += lits
        return
    if pos >= len(seqpart):
        raise _Bad
    modes = seqpart[pos]
    pos += 1
    if modes & 3:
        raise _Bad  # reserved bits
    ll_mode = (modes >> 6) & 3
    of_mode = (modes >> 4) & 3
    ml_mode = (modes >> 2) & 3
    ll_t, pos = _read_seq_table(ll_mode, seqpart, pos, "ll", _LL_DEF, st.ll, 35)
    of_t, pos = _read_seq_table(of_mode, seqpart, pos, "of", _OF_DEF, st.of, 31)
    ml_t, pos = _read_seq_table(ml_mode, seqpart, pos, "ml", _ML_DEF, st.ml, 52)
    st.ll, st.of, st.ml = ll_t, of_t, ml_t

    b = _Back(seqpart[pos:])
    ll_s = _fse_init_state(ll_t, b)
    of_s = _fse_init_state(of_t, b)
    ml_s = _fse_init_state(ml_t, b)
    lit_pos = 0
    rep = st.rep
    for i in range(nseq):
        of_code = of_t.symbol[of_s]
        if of_code > 31:
            raise _Bad
        offset_val = (1 << of_code) + b.read(of_code)
        ml_code = ml_t.symbol[ml_s]
        ml_base, ml_bits = _ML_BASE[ml_code]
        match_len = ml_base + b.read(ml_bits)
        ll_code = ll_t.symbol[ll_s]
        ll_base, ll_bits = _LL_BASE[ll_code]
        lit_len = ll_base + b.read(ll_bits)
        # repeat-offset resolution (§4.2.2.4)
        if offset_val > 3:
            offset = offset_val - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = offset_val - 1
            if lit_len == 0:
                idx += 1
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:
                offset = rep[0] - 1
                if offset == 0:
                    raise _Bad
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        if lit_pos + lit_len > len(lits):
            raise _Bad
        out += lits[lit_pos : lit_pos + lit_len]
        lit_pos += lit_len
        if offset > len(out):
            raise _Bad  # beyond frame window (no dictionary support)
        src = len(out) - offset
        if offset >= match_len:
            out += out[src : src + match_len]
        else:
            for _ in range(match_len):
                out.append(out[src])
                src += 1
        if i + 1 < nseq:
            ll_s = _fse_update(ll_t, ll_s, b)
            ml_s = _fse_update(ml_t, ml_s, b)
            of_s = _fse_update(of_t, of_s, b)
    if b.bits != 0:
        raise _Bad  # sequence bitstream not exactly consumed
    out += lits[lit_pos:]


# ------------------------------------------------------- frame walk


def _decode_frame(data: bytes, pos: int, max_out: int) -> tuple[bytes, int]:
    if pos + 4 > len(data):
        raise _Bad
    magic = int.from_bytes(data[pos : pos + 4], "little")
    pos += 4
    if _SKIP_LO <= magic <= _SKIP_HI:
        if pos + 4 > len(data):
            raise _Bad
        skip = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if pos + skip > len(data):
            raise _Bad
        return b"", pos + skip
    if magic != _MAGIC:
        raise _Bad
    if pos >= len(data):
        raise _Bad
    desc = data[pos]
    pos += 1
    fcs_flag = desc >> 6
    single_segment = (desc >> 5) & 1
    if (desc >> 3) & 1:
        raise _Bad  # reserved descriptor bit
    has_checksum = (desc >> 2) & 1
    did_flag = desc & 3
    if not single_segment:
        if pos >= len(data):
            raise _Bad
        wd = data[pos]
        pos += 1
        if wd >> 3 > 31:
            raise _Bad
    did_size = (0, 1, 2, 4)[did_flag]
    if did_size:
        if pos + did_size > len(data):
            raise _Bad
        if int.from_bytes(data[pos : pos + did_size], "little"):
            raise _Bad  # external dictionaries unsupported: reject-whole
        pos += did_size
    fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    fcs = None
    if fcs_size:
        if pos + fcs_size > len(data):
            raise _Bad
        fcs = int.from_bytes(data[pos : pos + fcs_size], "little")
        if fcs_size == 2:
            fcs += 256
        pos += fcs_size
    out = bytearray()
    st = _FrameState()
    while True:
        if pos + 3 > len(data):
            raise _Bad
        hdr = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last = hdr & 1
        btype = (hdr >> 1) & 3
        bsize = hdr >> 3
        if bsize > 128 * 1024:
            raise _Bad
        if len(out) + max(bsize, 1) * 8 > max_out and len(out) + bsize > max_out:
            raise _Bad
        if btype == 0:
            if pos + bsize > len(data):
                raise _Bad
            out += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:
            if pos >= len(data) or len(out) + bsize > max_out:
                raise _Bad
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:
            if pos + bsize > len(data) or bsize == 0:
                raise _Bad
            before = len(out)
            _decode_block(data[pos : pos + bsize], st, out)
            if len(out) - before > 128 * 1024 or len(out) > max_out:
                raise _Bad  # a block regenerates at most 128 KiB
            pos += bsize
        else:
            raise _Bad
        if last:
            break
    if fcs is not None and fcs != len(out):
        raise _Bad
    if has_checksum:
        if pos + 4 > len(data):
            raise _Bad
        want = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if want != (xxh64(bytes(out)) & 0xFFFFFFFF):
            raise _Bad
    return bytes(out), pos


def zstd_decode(payload: bytes, max_out: int = 256 * 1024 * 1024) -> bytes | None:
    """Decode a complete zstd payload (all frame and block types);
    None on any malformation or trailing garbage."""
    if not payload:
        return None
    out = bytearray()
    pos = 0
    got = False
    try:
        while pos < len(payload):
            chunk, pos = _decode_frame(payload, pos, max_out - len(out))
            out += chunk
            got = True
    except _Bad:
        return None
    except (IndexError, OverflowError, ValueError):
        return None
    return bytes(out) if got else None
