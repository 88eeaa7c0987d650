"""WebP container + from-spec VP8L lossless codec.

WebP is the web's most common modern image format; until r16 a
`RIFF....WEBP` payload fell through triage's AVI-only RIFF check and
censused as unknown/corrupt. This module implements, from the PUBLIC
spec only (RFC 9649 — "WebP Image Format", which folds in the VP8L
lossless bitstream spec):

  - a COMPLETE VP8L lossless decoder: LSB-first bitstream, canonical
    prefix codes (simple 1/2-symbol and full code-length-coded forms,
    with the completeness/Kraft check), color cache, LZ77 backward
    references with BOTH distance encodings (plain and the 120-entry
    2D neighborhood map), optional meta-prefix (entropy image), and
    all four transforms inverted in reverse order: predictor (all 14
    modes incl. Select / ClampAddSubtractFull / Half), cross-channel
    color transform (signed int8 deltas), subtract-green, and color
    indexing with sub-byte pixel bundling;
  - the 2D distance map GENERATED from its ordering rule (the 120
    in-neighborhood offsets sorted by (dx^2+dy^2, |dx|, sign)) rather
    than transcribed — import-time asserts pin the mirror-pair and
    bijection invariants the published table satisfies, so a
    transcription typo (the r7 JPEG silent-corruption failure mode)
    cannot exist here;
  - a real VP8L ENCODER covering literal / subtract-green / LZ77+
    color-cache / palette / predictor / color-transform modes, used to
    synthesize byte-for-byte real files for the registered roundtrip
    oracle (the FLAC pattern: lossless => digests as doc arithmetic);
  - lossy VP8 frame-header parse (keyframe tag, 0x9d012a start code,
    14-bit dims) as a dimensions census — sample decode shares the
    documented codec boundary of multimodal/binary.py:14;
  - the RIFF walk: plain VP8/VP8L stills, VP8X extended files
    (canvas, feature flags, unknown-chunk skip per RIFF convention)
    and ANIM/ANMF animations: frame rects validated against the
    canvas, per-frame lossless decode, duration sum, and REAL canvas
    compositing (r16, the gif_anim treatment) — transparent-black
    canvas, per-frame alpha-blend or overwrite per the blending flag,
    dispose-to-background, canvas-level digests.

Reference parity note: the reference engine (see SURVEY §1) has no
media code at all — this is extension surface for the 100 TB crawl
pipeline, same tier as multimodal/pixels.py.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

__all__ = [
    "decode_vp8l",
    "decode_webp_pixels",
    "parse_webp",
    "encode_vp8l",
    "synth_webp_still",
    "synth_webp_rt",
    "synth_webp_census",
    "webp_census_frame",
    "webp_pixels_roundtrip",
    "webp_census_roundtrip",
    "WEBP_PIXELS_ORACLE",
    "WEBP_CENSUS_ORACLE",
]

_MAX_PIXELS = 64 * 1024 * 1024
_MAX_FRAMES = 10_000


class _Bad(Exception):
    pass


# --------------------------------------------------------- bit I/O


class _BitReader:
    """LSB-first bit reader (VP8L convention)."""

    __slots__ = ("data", "bitpos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        p = self.bitpos
        end = p + n
        if end > self.nbits:
            raise _Bad
        v = int.from_bytes(self.data[p >> 3 : (end + 7) >> 3], "little") >> (p & 7)
        self.bitpos = end
        return v & ((1 << n) - 1)


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


# ------------------------------------------------ 2D distance map
#
# Distance symbols 1..120 address a close neighborhood of the current
# pixel. The published 120-entry table is exactly the offsets
# {(dx, dy): dy in 0..7, dx in -7..8, (dy > 0 or dx >= 1)} sorted by
# (dx^2 + dy^2, |dx|, dx < 0) — generating it from that rule instead
# of transcribing 120 literals removes the typo class entirely. The
# invariants asserted below (bijection onto 120 codes; each (x, y) /
# (-x, y) mirror pair adjacent with +x first) hold for the published
# table and pin the generation.


def _gen_distance_map() -> list[tuple[int, int]]:
    cands = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx >= 1
    ]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    return cands


_DISTANCE_MAP = _gen_distance_map()
assert len(_DISTANCE_MAP) == 120
assert len(set(_DISTANCE_MAP)) == 120
assert _DISTANCE_MAP[0] == (0, 1) and _DISTANCE_MAP[1] == (1, 0)
for _i, (_x, _y) in enumerate(_DISTANCE_MAP):
    if 0 < _x <= 7 and _y > 0:  # dx=8 has no -8 mirror in the window
        assert _DISTANCE_MAP[_i + 1] == (-_x, _y)


def _plane_to_dist(dist_code: int, xsize: int) -> int:
    """Decoded distance symbol value (1-based) -> pixel distance."""
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DISTANCE_MAP[dist_code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


# ----------------------------------------------- prefix (Huffman) codes


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """{symbol: (code, len)} canonical assignment (shorter lengths
    first, then symbol order) — the DEFLATE/VP8L convention."""
    max_len = max(lengths)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _Huff:
    """Prefix-code decoder: bit-at-a-time walk, MSB-first code
    accumulation. Rejects over/under-subscribed codes (completeness),
    accepting the spec's single-symbol zero-bit case."""

    __slots__ = ("single", "table")

    def __init__(self, lengths: list[int], explicit_pair: Optional[list[int]] = None):
        if explicit_pair is not None:
            # simple 2-symbol code: code 0 -> symbols[0], 1 -> symbols[1]
            # in STREAM order, not canonical-by-symbol order
            self.single = None
            self.table = {(1, 0): explicit_pair[0], (1, 1): explicit_pair[1]}
            return
        nz = [s for s, ln in enumerate(lengths) if ln]
        if not nz:
            raise _Bad
        if len(nz) == 1:
            self.single = nz[0]
            self.table = None
            return
        self.single = None
        max_len = max(lengths)
        if max_len > 15:
            raise _Bad
        kraft = sum(1 << (max_len - ln) for ln in lengths if ln)
        if kraft != 1 << max_len:
            raise _Bad
        self.table = {
            (ln, code): sym for sym, (code, ln) in _canonical_codes(lengths).items()
        }

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        table = self.table
        while ln < 16:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise _Bad


_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_code(br: _BitReader, alphabet_size: int) -> _Huff:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_bits = 8 if br.read(1) else 1
        s0 = br.read(first_bits)
        if s0 >= alphabet_size:
            raise _Bad
        if num_symbols == 1:
            lengths = [0] * alphabet_size
            lengths[s0] = 1
            return _Huff(lengths)
        s1 = br.read(8)
        if s1 >= alphabet_size or s1 == s0:
            raise _Bad
        return _Huff([], explicit_pair=[s0, s1])
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Huff(clc_lengths)
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.decode(br)
        if code_len < 16:
            lengths[sym] = code_len
            sym += 1
            if code_len:
                prev = code_len
        elif code_len == 16:
            rep = 3 + br.read(2)
            if sym + rep > alphabet_size:
                raise _Bad
            for _ in range(rep):
                lengths[sym] = prev
                sym += 1
        elif code_len == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
        if sym > alphabet_size:
            raise _Bad
    return _Huff(lengths)


def _prefix_val(br: _BitReader, code: int) -> int:
    """LZ77 length/distance prefix decode (value >= 1)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _cache_hash(px: int, bits: int) -> int:
    return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - bits)


# -------------------------------------------- entropy-coded image


def _div_up(a: int, b: int) -> int:
    return (a + b - 1) // b


def _decode_image(br: _BitReader, w: int, h: int, allow_meta: bool) -> list[int]:
    """Decode one spatially/entropy-coded VP8L image to a flat ARGB
    list. Subimages (transform data, entropy image, palette) pass
    allow_meta=False per the spec grammar."""
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise _Bad
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise _Bad
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    meta_bits = 0
    mw = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = 2 + br.read(3)
        mw = _div_up(w, 1 << meta_bits)
        mh = _div_up(h, 1 << meta_bits)
        meta_img = _decode_image(br, mw, mh, False)
        meta = [(px >> 8) & 0xFFFF for px in meta_img]
        n_groups = max(meta) + 1

    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        g = _read_code(br, green_alpha)
        r = _read_code(br, 256)
        b = _read_code(br, 256)
        a = _read_code(br, 256)
        d = _read_code(br, 40)
        groups.append((g, r, b, a, d))

    n = w * h
    pixels = [0] * n
    pos = 0
    g, r, b, a, d = groups[0]
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, w)
            g, r, b, a, d = groups[
                meta[(y >> meta_bits) * mw + (x >> meta_bits)]
            ]
        sym = g.decode(br)
        if sym < 256:
            red = r.decode(br)
            blue = b.decode(br)
            alpha = a.decode(br)
            px = (alpha << 24) | (red << 16) | (sym << 8) | blue
            pixels[pos] = px
            pos += 1
            if cache is not None:
                cache[_cache_hash(px, cache_bits)] = px
        elif sym < 280:
            length = _prefix_val(br, sym - 256)
            dist_code = _prefix_val(br, d.decode(br))
            dist = _plane_to_dist(dist_code, w)
            if dist > pos or pos + length > n:
                raise _Bad
            for _ in range(length):
                px = pixels[pos - dist]
                pixels[pos] = px
                pos += 1
                if cache is not None:
                    cache[_cache_hash(px, cache_bits)] = px
        else:
            if cache is None:
                raise _Bad
            pixels[pos] = cache[sym - 280]
            pos += 1
    return pixels


# ------------------------------------------------ inverse transforms


def _avg2(p: int, q: int) -> int:
    return ((((p ^ q) & 0xFEFEFEFE) >> 1) + (p & q)) & 0xFFFFFFFF


def _chans(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _clamp255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _select(L: int, T: int, TL: int) -> int:
    lt = _chans(T)
    ll = _chans(L)
    lc = _chans(TL)
    p_l = sum(abs(lt[i] - lc[i]) for i in range(4))  # |pred - L|
    p_t = sum(abs(ll[i] - lc[i]) for i in range(4))  # |pred - T|
    return L if p_l < p_t else T


def _cas_full(L: int, T: int, TL: int) -> int:
    ll, lt, lc = _chans(L), _chans(T), _chans(TL)
    return _pack(*(_clamp255(ll[i] + lt[i] - lc[i]) for i in range(4)))


def _trunc_half(d: int) -> int:
    """C-style (a - b) / 2 truncation toward zero."""
    return d // 2 if d >= 0 else -((-d) // 2)


def _cas_half(L: int, T: int, TL: int) -> int:
    ave = _chans(_avg2(L, T))
    lc = _chans(TL)
    return _pack(*(_clamp255(ave[i] + _trunc_half(ave[i] - lc[i])) for i in range(4)))


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        return _select(L, T, TL)
    if mode == 12:
        return _cas_full(L, T, TL)
    if mode == 13:
        return _cas_half(L, T, TL)
    raise _Bad


def _add_px(p: int, q: int) -> int:
    """Per-channel (p + q) mod 256 on packed ARGB."""
    return ((((p & 0xFF00FF00) + (q & 0xFF00FF00)) & 0xFF00FF00)
            | (((p & 0x00FF00FF) + (q & 0x00FF00FF)) & 0x00FF00FF))


def _sub_px(p: int, q: int) -> int:
    """Per-channel (p - q) mod 256 on packed ARGB (encoder side)."""
    pa, pr, pg, pb = _chans(p)
    qa, qr, qg, qb = _chans(q)
    return _pack((pa - qa) & 0xFF, (pr - qr) & 0xFF, (pg - qg) & 0xFF, (pb - qb) & 0xFF)


def _inv_predictor(buf: list[int], w: int, h: int, size_bits: int,
                   sub: list[int], sub_w: int) -> None:
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = buf[i - 1]
            elif x == 0:
                pred = buf[i - w]
            else:
                mode = (sub[(y >> size_bits) * sub_w + (x >> size_bits)] >> 8) & 0xFF
                # TR addressing is buffer-linear: at x == w-1 it reads
                # the first pixel of the CURRENT row (already decoded),
                # per the spec's one-dimensional addressing note.
                pred = _predict(mode, buf[i - 1], buf[i - w], buf[i - w - 1],
                                buf[i - w + 1])
            buf[i] = _add_px(buf[i], pred)


def _s8(v: int) -> int:
    return v - 256 if v > 127 else v


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: (int8 t * int8 c) >> 5 arithmetic."""
    return (_s8(t) * _s8(c)) >> 5


def _inv_color_transform(buf: list[int], w: int, h: int, size_bits: int,
                         sub: list[int], sub_w: int) -> None:
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            el = sub[(y >> size_bits) * sub_w + (x >> size_bits)]
            g2r = el & 0xFF
            g2b = (el >> 8) & 0xFF
            r2b = (el >> 16) & 0xFF
            a, r, g, b = _chans(buf[i])
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            buf[i] = _pack(a, r, g, b)


def _inv_subtract_green(buf: list[int]) -> None:
    for i, p in enumerate(buf):
        a, r, g, b = _chans(p)
        buf[i] = _pack(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _inv_color_index(buf: list[int], packed_w: int, h: int, n_colors: int,
                     width_bits: int, pal: list[int], orig_w: int) -> list[int]:
    if width_bits == 0:
        out = []
        for p in buf:
            idx = (p >> 8) & 0xFF
            if idx >= n_colors:
                raise _Bad
            out.append(pal[idx])
        return out
    bpp = 8 >> width_bits
    per = 1 << width_bits
    mask = (1 << bpp) - 1
    out = [0] * (orig_w * h)
    for y in range(h):
        for px_x in range(orig_w):
            packed = buf[y * packed_w + (px_x >> width_bits)]
            idx = ((packed >> 8) >> ((px_x & (per - 1)) * bpp)) & mask
            if idx >= n_colors:
                raise _Bad
            out[y * orig_w + px_x] = pal[idx]
    return out


# ------------------------------------------------------ VP8L decode


def decode_vp8l(data: bytes) -> Optional[np.ndarray]:
    """VP8L chunk payload -> (h, w, 3|4) uint8 pixels; None on any
    malformed/out-of-spec stream (reject-whole, never raises)."""
    try:
        return _decode_vp8l(data)
    except (_Bad, ValueError, IndexError, OverflowError, struct.error):
        return None


def _decode_vp8l(data: bytes) -> Optional[np.ndarray]:
    if len(data) < 5 or data[0] != 0x2F:
        return None
    br = _BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint (informative)
    if br.read(3) != 0:  # version must be 0
        raise _Bad
    buf = _decode_argb_stream(br, w, h)
    arr = np.array(buf, dtype=np.uint32).reshape(h, w)
    a = (arr >> 24).astype(np.uint8)
    r = ((arr >> 16) & 0xFF).astype(np.uint8)
    g = ((arr >> 8) & 0xFF).astype(np.uint8)
    b = (arr & 0xFF).astype(np.uint8)
    if bool((a == 255).all()):
        return np.dstack([r, g, b])
    return np.dstack([r, g, b, a])


def _decode_argb_stream(br: _BitReader, w: int, h: int) -> list[int]:
    """The headerless lossless image stream (transforms + spatially
    coded data + inverse application) — shared by the VP8L chunk body
    and the ALPH chunk's lossless-coded alpha plane, whose dimensions
    come from the frame instead of a stream header."""
    if w * h > _MAX_PIXELS:
        raise _Bad

    transforms = []
    seen = set()
    cur_w = w
    while br.read(1):
        t = br.read(2)
        if t in seen:
            raise _Bad  # each transform may appear at most once
        seen.add(t)
        if t in (0, 1):  # predictor / color transform
            size_bits = br.read(3) + 2
            bw_ = _div_up(cur_w, 1 << size_bits)
            bh_ = _div_up(h, 1 << size_bits)
            sub = _decode_image(br, bw_, bh_, False)
            transforms.append((t, size_bits, bw_, sub))
        elif t == 2:  # subtract green
            transforms.append((2,))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_img = _decode_image(br, n_colors, 1, False)
            pal = []
            prev = 0
            for p in pal_img:
                prev = _add_px(prev, p)
                pal.append(prev)
            width_bits = (3 if n_colors <= 2 else 2 if n_colors <= 4
                          else 1 if n_colors <= 16 else 0)
            transforms.append((3, n_colors, width_bits, pal, cur_w))
            if width_bits:
                cur_w = _div_up(cur_w, 1 << width_bits)

    buf = _decode_image(br, cur_w, h, True)

    for tr in reversed(transforms):
        if tr[0] == 3:
            _, n_colors, width_bits, pal, orig_w = tr
            buf = _inv_color_index(buf, cur_w, h, n_colors, width_bits, pal, orig_w)
            cur_w = orig_w
        elif tr[0] == 2:
            _inv_subtract_green(buf)
        elif tr[0] == 1:
            _inv_color_transform(buf, cur_w, h, tr[1], tr[3], tr[2])
        else:
            _inv_predictor(buf, cur_w, h, tr[1], tr[3], tr[2])
    if cur_w != w:
        raise _Bad
    return buf


# ---------------------------------------------------------- encoder
#
# A real VP8L encoder — enough of one to synthesize byte-for-byte
# valid files exercising every decoder path above. Deterministic,
# no rate optimization: prefix codes are true Huffman codes over the
# actual symbol frequencies (depth-capped by construction at these
# sizes), written in the full code-length-coded form (or the spec's
# simple form when <= 2 symbols fit it).


def _huff_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Huffman code lengths for {symbol: freq>0}; >= 2 symbols."""
    import heapq

    heap = [(f, sym, (sym,)) for sym, f in sorted(freqs.items())]
    heapq.heapify(heap)
    depth = {s: 0 for s in freqs}
    while len(heap) > 1:
        f1, t1, s1 = heapq.heappop(heap)
        f2, t2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, min(t1, t2), s1 + s2))
    assert max(depth.values()) <= 15, "depth cap exceeded (tiny inputs only)"
    return depth


def _write_symbol(bw: _BitWriter, codes: dict[int, tuple[int, int]], sym: int) -> None:
    code, ln = codes[sym]
    for i in range(ln - 1, -1, -1):  # MSB-first on the wire
        bw.write((code >> i) & 1, 1)


def _write_code(bw: _BitWriter, freqs: dict[int, int],
                alphabet_size: int) -> dict[int, tuple[int, int]]:
    """Write one prefix-code header; return {sym: (code, len)} for the
    data pass. Zero-frequency alphabets get a single-symbol code."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if not used:
        used = [0]
    if len(used) == 1 and used[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # num_symbols - 1 = 0
        s0 = used[0]
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        return {s0: (0, 0)}  # zero-bit code
    if len(used) == 2 and used[1] < 256:
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        s0, s1 = used
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        bw.write(s1, 8)
        return {s0: (0, 1), s1: (1, 1)}
    # normal (code-length-coded) form
    bw.write(0, 1)
    lengths = [0] * alphabet_size
    if len(used) == 1:  # single symbol >= 256: 1-entry normal code
        lengths[used[0]] = 1
    else:
        for s, ln in _huff_lengths({s: freqs[s] for s in used}).items():
            lengths[s] = ln
    last = max(s for s, ln in enumerate(lengths) if ln)
    seq = lengths[: last + 1]
    # code-length code over the used length symbols, UNIFORM freqs so
    # its depth is ceil(log2 k) <= 5 — always inside the 3-bit cap
    used_lens = sorted(set(seq))
    clc_len = [0] * 19
    if len(used_lens) == 1:
        clc_len[used_lens[0]] = 1
        clc_codes = {used_lens[0]: (0, 0)}
    else:
        depths = _huff_lengths({ln: 1 for ln in used_lens})
        for ln, d in depths.items():
            clc_len[ln] = d
        clc_codes = _canonical_codes(clc_len)
    num_clc = max(4, max(_CLC_ORDER.index(ln) for ln in used_lens) + 1)
    bw.write(num_clc - 4, 4)
    for i in range(num_clc):
        bw.write(clc_len[_CLC_ORDER[i]], 3)
    # stop after the last nonzero length via the max_symbol field
    max_symbol = last + 1
    bw.write(1, 1)
    k = 0
    while (max_symbol - 2) >> (2 + 2 * k):
        k += 1
    bw.write(k, 3)
    bw.write(max_symbol - 2, 2 + 2 * k)
    for ln in seq:
        _write_symbol(bw, clc_codes, ln)
    return _canonical_codes(lengths)


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """LZ77 length/distance value (>= 1) -> (code, extra_bits, extra)."""
    v = value - 1
    if v < 4:
        return v, 0, 0
    e = v.bit_length() - 2
    hi = (v >> e) & 1
    return 2 * e + 2 + hi, e, v - ((2 + hi) << e)


def _dist_to_code(dist: int, w: int, plain: bool) -> int:
    """Distance -> distance-symbol value (1-based); the 2D map when
    the offset is in the neighborhood and plain=False."""
    if not plain:
        dy, dx = divmod(dist, w)
        for cand in ((dx, dy), (dx - w, dy + 1)):
            if cand in _DIST_CODE_OF:
                return _DIST_CODE_OF[cand] + 1
    return dist + 120


_DIST_CODE_OF = {xy: i for i, xy in enumerate(_DISTANCE_MAP)}


def _tokenize(pixels: list[int], w: int, cache_bits: int,
              use_lz: bool) -> list[tuple]:
    cache = [0] * (1 << cache_bits) if cache_bits else None
    toks = []
    i = 0
    n = len(pixels)
    while i < n:
        if use_lz and i >= 1:
            best_len = 0
            best_dist = 0
            for dist in (1, w):
                if i < dist:
                    continue
                ln = 0
                while i + ln < n and ln < 4096 and pixels[i + ln - dist] == pixels[i + ln]:
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
            if best_len >= 3:
                toks.append(("copy", best_len, best_dist))
                if cache is not None:
                    for k in range(best_len):
                        px = pixels[i + k]
                        cache[_cache_hash(px, cache_bits)] = px
                i += best_len
                continue
        px = pixels[i]
        if cache is not None:
            hv = _cache_hash(px, cache_bits)
            if cache[hv] == px:
                toks.append(("cache", hv))
                i += 1
                continue
            cache[hv] = px
        toks.append(("lit", px))
        i += 1
    return toks


def _write_image_data(bw: _BitWriter, pixels: list[int], w: int,
                      main: bool, cache_bits: int = 0, use_lz: bool = False,
                      plain_dist: bool = False) -> None:
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if main:
        bw.write(0, 1)  # no meta-prefix image
    toks = _tokenize(pixels, w, cache_bits, use_lz)
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for t in toks:
        if t[0] == "lit":
            a, r, g, b = _chans(t[1])
            gf[g] = gf.get(g, 0) + 1
            rf[r] = rf.get(r, 0) + 1
            bf[b] = bf.get(b, 0) + 1
            af[a] = af.get(a, 0) + 1
        elif t[0] == "cache":
            s = 280 + t[1]
            gf[s] = gf.get(s, 0) + 1
        else:
            lc, _, _ = _prefix_encode(t[1])
            gf[256 + lc] = gf.get(256 + lc, 0) + 1
            dc, _, _ = _prefix_encode(_dist_to_code(t[2], w, plain_dist))
            df[dc] = df.get(dc, 0) + 1
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    gc = _write_code(bw, gf, green_alpha)
    rc = _write_code(bw, rf, 256)
    bc = _write_code(bw, bf, 256)
    ac = _write_code(bw, af, 256)
    dc_codes = _write_code(bw, df, 40)
    for t in toks:
        if t[0] == "lit":
            a, r, g, b = _chans(t[1])
            _write_symbol(bw, gc, g)
            _write_symbol(bw, rc, r)
            _write_symbol(bw, bc, b)
            _write_symbol(bw, ac, a)
        elif t[0] == "cache":
            _write_symbol(bw, gc, 280 + t[1])
        else:
            code, eb, ev = _prefix_encode(t[1])
            _write_symbol(bw, gc, 256 + code)
            if eb:
                bw.write(ev, eb)
            dval = _dist_to_code(t[2], w, plain_dist)
            code, eb, ev = _prefix_encode(dval)
            _write_symbol(bw, dc_codes, code)
            if eb:
                bw.write(ev, eb)


def encode_vp8l(rgba: np.ndarray, mode: str = "sg", pred_mode: int = 0,
                ct: tuple[int, int, int] = (0, 0, 0),
                plain_dist: bool = False) -> bytes:
    """(h, w, 4) uint8 RGBA -> VP8L chunk payload. Modes: 'lit'
    (plain literals), 'sg' (subtract-green), 'lz' (LZ77 + 4-bit color
    cache), 'pal' (color indexing + bundling), 'pred' (one predictor
    block, mode pred_mode), 'ct' (color transform, elements ct)."""
    h, w, _ = rgba.shape
    pixels = [
        _pack(int(rgba[y, x, 3]), int(rgba[y, x, 0]), int(rgba[y, x, 1]),
              int(rgba[y, x, 2]))
        for y in range(h)
        for x in range(w)
    ]
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    cur_w = w
    if mode == "sg":
        bw.write(1, 1)
        bw.write(2, 2)
        pixels = [
            _pack(a, (r - g) & 0xFF, g, (b - g) & 0xFF)
            for a, r, g, b in map(_chans, pixels)
        ]
    elif mode == "pred":
        bw.write(1, 1)
        bw.write(0, 2)
        size_bits = max(w - 1, h - 1).bit_length()
        size_bits = max(size_bits, 2)  # field floor: stored as size_bits-2
        bw.write(size_bits - 2, 3)
        _write_image_data(bw, [0xFF000000 | (pred_mode << 8)], 1, False)
        res = list(pixels)
        for y in range(h):
            for x in range(w):
                i = y * w + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = pixels[i - 1]
                elif x == 0:
                    pred = pixels[i - w]
                else:
                    pred = _predict(pred_mode, pixels[i - 1], pixels[i - w],
                                    pixels[i - w - 1], pixels[i - w + 1])
                res[i] = _sub_px(pixels[i], pred)
        pixels = res
    elif mode == "ct":
        bw.write(1, 1)
        bw.write(1, 2)
        size_bits = max(max(w - 1, h - 1).bit_length(), 2)
        bw.write(size_bits - 2, 3)
        g2r, g2b, r2b = ct
        _write_image_data(bw, [0xFF000000 | (r2b << 16) | (g2b << 8) | g2r], 1, False)
        out = []
        for a, r, g, b in map(_chans, pixels):
            r2 = (r - _ct_delta(g2r, g)) & 0xFF
            # the inverse applies red_to_blue on the RESTORED red, so
            # the forward subtracts it on the original red
            b2 = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            out.append(_pack(a, r2, g, b2))
        pixels = out
    elif mode == "pal":
        pal = sorted(set(pixels))
        n_colors = len(pal)
        if n_colors > 256:
            raise ValueError("palette mode needs <= 256 colors")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n_colors - 1, 8)
        deltas = [pal[0]] + [_sub_px(pal[i], pal[i - 1]) for i in range(1, n_colors)]
        _write_image_data(bw, deltas, n_colors, False)
        width_bits = (3 if n_colors <= 2 else 2 if n_colors <= 4
                      else 1 if n_colors <= 16 else 0)
        index_of = {c: i for i, c in enumerate(pal)}
        if width_bits:
            bpp = 8 >> width_bits
            per = 1 << width_bits
            cur_w = _div_up(w, per)
            packed = []
            for y in range(h):
                for px_x in range(cur_w):
                    gbyte = 0
                    for k in range(per):
                        x = px_x * per + k
                        if x < w:
                            gbyte |= index_of[pixels[y * w + x]] << (k * bpp)
                    packed.append(0xFF000000 | (gbyte << 8))
            pixels = packed
        else:
            pixels = [0xFF000000 | (index_of[p] << 8) for p in pixels]
    elif mode not in ("lit", "lz", "meta"):
        raise ValueError(f"unknown mode {mode!r}")
    bw.write(0, 1)  # end of transforms
    if mode == "meta":
        _write_image_data_meta(bw, pixels, cur_w, h)
    else:
        _write_image_data(bw, pixels, cur_w, True,
                          cache_bits=4 if mode == "lz" else 0,
                          use_lz=(mode == "lz"), plain_dist=plain_dist)
    return b"\x2f" + bw.done()


def _write_image_data_meta(bw: _BitWriter, pixels: list[int], w: int,
                           h: int, meta_bits: int = 2) -> None:
    """Main image with a REAL meta-prefix (entropy) image: two prefix
    groups in a checkerboard over (1 << meta_bits)-pixel blocks, each
    group with its own five codes — exercises the decoder's
    group-switching path, which single-group streams never touch."""
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta-prefix present
    bw.write(meta_bits - 2, 3)
    mw = _div_up(w, 1 << meta_bits)
    mh = _div_up(h, 1 << meta_bits)
    group = [[(bx + by) % 2 for bx in range(mw)] for by in range(mh)]
    n_groups = 2 if (mw > 1 or mh > 1) else 1
    meta_px = [0xFF000000 | (group[by][bx] << 8)
               for by in range(mh) for bx in range(mw)]
    _write_image_data(bw, meta_px, mw, False)
    freqs = [
        {"g": {}, "r": {}, "b": {}, "a": {}} for _ in range(n_groups)
    ]
    def gix(pos: int) -> int:
        y, x = divmod(pos, w)
        return group[y >> meta_bits][x >> meta_bits]
    for pos, px in enumerate(pixels):
        a, r, g, b = _chans(px)
        f = freqs[gix(pos)]
        f["g"][g] = f["g"].get(g, 0) + 1
        f["r"][r] = f["r"].get(r, 0) + 1
        f["b"][b] = f["b"].get(b, 0) + 1
        f["a"][a] = f["a"].get(a, 0) + 1
    codes = []
    for f in freqs:
        gc = _write_code(bw, f["g"], 256 + 24)
        rc = _write_code(bw, f["r"], 256)
        bc = _write_code(bw, f["b"], 256)
        ac = _write_code(bw, f["a"], 256)
        dc = _write_code(bw, {}, 40)
        codes.append((gc, rc, bc, ac, dc))
    for pos, px in enumerate(pixels):
        a, r, g, b = _chans(px)
        gc, rc, bc, ac, _ = codes[gix(pos)]
        _write_symbol(bw, gc, g)
        _write_symbol(bw, rc, r)
        _write_symbol(bw, bc, b)
        _write_symbol(bw, ac, a)


# ------------------------------------------------- container (RIFF)


def _riff_chunks(p: bytes, pos: int, end: int):
    while pos < end:
        if pos + 8 > end:
            raise _Bad
        fcc = p[pos : pos + 4]
        (size,) = struct.unpack_from("<I", p, pos + 4)
        body = pos + 8
        if body + size > end:
            raise _Bad
        yield fcc, body, size
        pos = body + size + (size & 1)


def _riff(chunks: list[tuple[bytes, bytes]]) -> bytes:
    payload = b"".join(
        fcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")
        for fcc, body in chunks
    )
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload


def parse_vp8_header(data: bytes) -> tuple[int, int, int]:
    """Lossy VP8 keyframe header -> (width, height, version). Sample
    decode is the documented codec boundary (multimodal/binary.py:14);
    the uncompressed header is pure in-band structure."""
    if len(data) < 10:
        raise _Bad
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise _Bad  # an interframe cannot stand alone in a WebP
    version = (tag >> 1) & 7
    part_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise _Bad
    w = (data[6] | (data[7] << 8)) & 0x3FFF
    h = (data[8] | (data[9] << 8)) & 0x3FFF
    if w == 0 or h == 0 or 10 + part_size > len(data):
        raise _Bad
    return w, h, version


def _vp8l_required(data: bytes) -> np.ndarray:
    px = decode_vp8l(data)
    if px is None:
        raise _Bad
    return px


def _dhash_of(px: np.ndarray) -> int:
    from danae_spark.multimodal.pixels import dhash_bits, luma_grid

    return dhash_bits(luma_grid(px))


_SKIP_CHUNKS = (b"ICCP", b"ALPH", b"EXIF", b"XMP ")


def parse_webp(payload: bytes) -> Optional[dict]:
    """Census one WebP: variant/dims/losslessness/frames/durations and
    the decoded dHash for lossless pixels; None (reject-whole) for
    malformed containers, non-keyframe lossy data, frame rects outside
    the canvas, or undecodable VP8L streams."""
    try:
        return _parse_webp(payload)
    except (_Bad, ValueError, IndexError, OverflowError, struct.error):
        return None


def _parse_webp(p: bytes) -> Optional[dict]:
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WEBP":
        return None
    (riff,) = struct.unpack_from("<I", p, 4)
    end = 8 + riff
    if riff < 4 or end > len(p):
        raise _Bad
    chunks = list(_riff_chunks(p, 12, end))
    if not chunks:
        raise _Bad
    fcc0, body0, size0 = chunks[0]
    if fcc0 == b"VP8L":
        px = _vp8l_required(p[body0 : body0 + size0])
        return {
            "variant": "vp8l", "width": px.shape[1], "height": px.shape[0],
            "lossless": True, "n_frames": 1, "duration_ms": None,
            "dhash": _dhash_of(px), "q_index": None, "filter_level": None,
            "alpha_coverage": _alpha_coverage_of(px),
        }
    if fcc0 == b"VP8 ":
        fh = parse_vp8_frame_header(p[body0 : body0 + size0])
        return {
            "variant": "vp8", "width": fh["width"], "height": fh["height"],
            "lossless": False, "n_frames": 1, "duration_ms": None,
            "dhash": None, "q_index": fh["q_index"],
            "filter_level": fh["filter_level"],
            "alpha_coverage": 0,  # plain VP8 cannot carry alpha
        }
    if fcc0 != b"VP8X" or size0 != 10:
        raise _Bad
    flags = p[body0]
    anim = bool(flags & 0x02)
    cw = 1 + int.from_bytes(p[body0 + 4 : body0 + 7], "little")
    ch = 1 + int.from_bytes(p[body0 + 7 : body0 + 10], "little")
    rest = chunks[1:]
    if not anim:
        alph = None
        for fcc, body, size in rest:
            if fcc == b"ALPH":
                alph = (body, size)
                continue
            if fcc == b"VP8L":
                px = _vp8l_required(p[body : body + size])
                if px.shape[1] != cw or px.shape[0] != ch:
                    raise _Bad  # still canvas must match the image
                return {
                    "variant": "vp8x-still", "width": cw, "height": ch,
                    "lossless": True, "n_frames": 1, "duration_ms": None,
                    "dhash": _dhash_of(px), "q_index": None,
                    "filter_level": None,
                    "alpha_coverage": _alpha_coverage_of(px),
                }
            if fcc == b"VP8 ":
                fh = parse_vp8_frame_header(p[body : body + size])
                if fh["width"] != cw or fh["height"] != ch:
                    raise _Bad
                coverage = 0
                if alph is not None:
                    plane = decode_alpha(p[alph[0] : alph[0] + alph[1]],
                                         cw, ch)
                    if plane is None:
                        raise _Bad  # an alpha plane that cannot decode
                    coverage = int((plane < 255).sum())
                return {
                    "variant": "vp8x-still", "width": cw, "height": ch,
                    "lossless": False, "n_frames": 1, "duration_ms": None,
                    "dhash": None, "q_index": fh["q_index"],
                    "filter_level": fh["filter_level"],
                    "alpha_coverage": coverage,
                }
            # ICCP/ALPH/EXIF/XMP and unknown chunks: skipped per RIFF
        raise _Bad  # extended still with no image chunk
    # animation: ANIM params then ANMF frames, COMPOSITED onto the
    # canvas per the spec (r16 — the gif_anim treatment): canvas
    # starts transparent black; each frame alpha-blends (flags bit 1
    # clear) or overwrites (bit 1 set) its rect, is digested at the
    # CANVAS level, then optionally disposes its rect back to
    # transparent black (flags bit 0)
    if not rest or rest[0][0] != b"ANIM" or rest[0][2] != 6:
        raise _Bad
    if cw * ch > _MAX_PIXELS:
        raise _Bad
    n_frames = 0
    duration = 0
    acc = 0
    all_lossless = True
    canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
    work_budget = _MAX_PIXELS * 4  # pixels x frames CPU bound
    for fcc, body, size in rest[1:]:
        if fcc != b"ANMF":
            continue  # trailing EXIF/XMP etc.
        if size < 16:
            raise _Bad
        fx = 2 * int.from_bytes(p[body : body + 3], "little")
        fy = 2 * int.from_bytes(p[body + 3 : body + 6], "little")
        fw = 1 + int.from_bytes(p[body + 6 : body + 9], "little")
        fh = 1 + int.from_bytes(p[body + 9 : body + 12], "little")
        dur = int.from_bytes(p[body + 12 : body + 15], "little")
        flags = p[body + 15]
        if fx + fw > cw or fy + fh > ch:
            raise _Bad  # frame rect outside the canvas
        img = None
        for sfcc, sbody, ssize in _riff_chunks(p, body + 16, body + size):
            if sfcc in (b"VP8L", b"VP8 "):
                img = (sfcc, sbody, ssize)
                break
            if sfcc != b"ALPH":
                raise _Bad  # only ALPH may precede the frame image
        if img is None:
            raise _Bad
        sfcc, sbody, ssize = img
        if sfcc == b"VP8L":
            px = _vp8l_required(p[sbody : sbody + ssize])
            if px.shape[1] != fw or px.shape[0] != fh:
                raise _Bad
            work_budget -= cw * ch
            if work_budget < 0:
                raise _Bad
            if px.shape[2] == 3:
                frame = np.dstack([px, np.full((fh, fw), 255, np.uint8)])
            else:
                frame = px
            region = canvas[fy : fy + fh, fx : fx + fw]
            if flags & 0x02:  # do-not-blend: overwrite the rect
                region[:] = frame
            else:
                _alpha_blend(region, frame)
            acc ^= _dhash_of(canvas)
            if flags & 0x01:  # dispose to (transparent) background
                canvas[fy : fy + fh, fx : fx + fw] = 0
        else:
            w, h, _v = parse_vp8_header(p[sbody : sbody + ssize])
            if w != fw or h != fh:
                raise _Bad
            all_lossless = False
        n_frames += 1
        duration += dur
        if n_frames > _MAX_FRAMES:
            raise _Bad
    if n_frames == 0:
        raise _Bad
    return {
        "variant": "vp8x-anim", "width": cw, "height": ch,
        "lossless": all_lossless, "n_frames": n_frames,
        "duration_ms": duration, "dhash": acc if all_lossless else None,
        "q_index": None, "filter_level": None, "alpha_coverage": None,
    }


def _alpha_coverage_of(px: np.ndarray) -> int:
    """Non-opaque pixel count of a decoded still (0 when the decoder
    collapsed a fully-opaque image to 3 channels)."""
    if px.shape[2] < 4:
        return 0
    return int((px[:, :, 3] < 255).sum())


def _alpha_blend(region: np.ndarray, frame: np.ndarray) -> None:
    """Spec over-compositing in integer form: out_a = fa + ca(255-fa)
    /255; out_rgb = (rgb_f*fa*255 + rgb_c*ca*(255-fa)) / (out_a*255),
    divisions truncating (the deterministic integer reading of the
    spec's real-valued formula)."""
    fa = frame[:, :, 3].astype(np.int64)
    ca = region[:, :, 3].astype(np.int64)
    inv = 255 - fa
    out_a = fa + (ca * inv) // 255
    denom = np.maximum(out_a * 255, 1)
    for c in range(3):
        num = (frame[:, :, c].astype(np.int64) * fa * 255
               + region[:, :, c].astype(np.int64) * ca * inv)
        region[:, :, c] = np.where(out_a > 0, num // denom, 0).astype(np.uint8)
    region[:, :, 3] = out_a.astype(np.uint8)


def decode_webp_pixels(payload: bytes) -> Optional[np.ndarray]:
    """Still lossless WebP -> pixel array (plain VP8L or a
    non-animated VP8X wrapping one); None for lossy/animated/bad."""
    try:
        if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
            return None
        (riff,) = struct.unpack_from("<I", payload, 4)
        end = 8 + riff
        if riff < 4 or end > len(payload):
            return None
        chunks = list(_riff_chunks(payload, 12, end))
        if not chunks:
            return None
        fcc0, body0, size0 = chunks[0]
        if fcc0 == b"VP8L":
            return decode_vp8l(payload[body0 : body0 + size0])
        if fcc0 == b"VP8X" and size0 == 10 and not payload[body0] & 0x02:
            for fcc, body, size in chunks[1:]:
                if fcc == b"VP8L":
                    return decode_vp8l(payload[body : body + size])
        return None
    except (_Bad, ValueError, IndexError, OverflowError, struct.error):
        return None


# ---------------------------------------------------------- synthesis
#
# Byte-for-byte real WebP files from doc_id arithmetic, restated in
# the DuckDB oracles below (the registered-entry pattern, SURVEY §5).


def _gray_rgba(lum: np.ndarray) -> np.ndarray:
    h, w = lum.shape
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = lum.astype(np.uint8)
    out[:, :, 3] = 255
    return out


def synth_webp_still(lum: np.ndarray) -> bytes:
    """Rotation-entry synthesizer: gray luma -> plain VP8L still
    (subtract-green + full code-length-coded prefix codes)."""
    return _riff([(b"VP8L", encode_vp8l(_gray_rgba(lum), mode="sg"))])


_RT_MODES = ("lit", "sg", "lz", "pal", "pred", "ct", "meta")


def wp_luma(d: int, i: int) -> int:
    """Roundtrip luma for doc d, pixel i — per-mode so every coding
    path has material to exercise (row repeats for LZ77, <=16 levels
    for palette bundling). Restated in WEBP_PIXELS_ORACLE."""
    m = d % 7
    if m == 2:
        return (d * 31 + (i % 8) * 7) % 256
    v = (d * 31 + i * 7) % 256
    if m == 3:
        return (v // 16) * 17
    return v


def synth_webp_rt(d: int) -> bytes:
    """Roundtrip doc: mode rotation over all SEVEN encoder modes (incl. meta-prefix); the
    d % 23 == 9 leg truncates the container (reject)."""
    lum = np.array(
        [[wp_luma(d, y * 8 + x) for x in range(8)] for y in range(8)],
        dtype=np.int64,
    )
    mode = _RT_MODES[d % 7]
    kw = {}
    if mode == "pred":
        kw["pred_mode"] = (d // 6) % 14
    elif mode == "ct":
        kw["ct"] = ((d * 7) % 256, (d * 11) % 256, (d * 13) % 256)
    elif mode == "lz":
        kw["plain_dist"] = bool((d // 6) % 2)
    payload = _riff([(b"VP8L", encode_vp8l(_gray_rgba(lum), mode=mode, **kw))])
    if d % 23 == 9:
        return payload[: len(payload) // 2]
    return payload


def _census_lum(d: int, f: int = 0, lz: bool = False) -> np.ndarray:
    if lz:
        return np.array(
            [[(d * 31 + x * 7) % 256 for x in range(8)] for _ in range(8)],
            dtype=np.int64,
        )
    return np.array(
        [[(d * 31 + (y * 8 + x) * 7 + f * 97) % 256 for x in range(8)]
         for y in range(8)],
        dtype=np.int64,
    )


def _vp8x_body(flags: int, cw: int, ch: int) -> bytes:
    return (bytes([flags, 0, 0, 0])
            + (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little"))


def _anmf_body(fx: int, fy: int, fw: int, fh: int, dur: int,
               image: bytes) -> bytes:
    hdr = ((fx // 2).to_bytes(3, "little") + (fy // 2).to_bytes(3, "little")
           + (fw - 1).to_bytes(3, "little") + (fh - 1).to_bytes(3, "little")
           + dur.to_bytes(3, "little") + bytes([0]))
    chunk = b"VP8L" + struct.pack("<I", len(image)) + image
    if len(image) & 1:
        chunk += b"\x00"
    return hdr + chunk


def synth_webp_census(d: int) -> bytes:
    """Census doc grid (d % 7): 0 plain VP8L, 1 VP8L via LZ77+cache,
    2 lossy VP8, 3 VP8X still (+EXIF, unknown chunk skipped), 4 VP8X
    animation (2-4 lossless frames), 5 truncated-VP8L reject, 6
    lying-RIFF-size reject."""
    v = d % 7
    if v in (0, 5):
        data = encode_vp8l(_gray_rgba(_census_lum(d)), mode="sg")
        if v == 5:
            data = data[: max(6, len(data) // 2)]  # mid-stream cut
        return _riff([(b"VP8L", data)])
    if v == 1:
        data = encode_vp8l(_gray_rgba(_census_lum(d, lz=True)), mode="lz",
                           plain_dist=bool((d // 7) % 2))
        return _riff([(b"VP8L", data)])
    if v == 2:
        frame = synth_vp8_keyframe(
            16 + d % 100, 16 + d % 80, version=d % 4,
            q_index=d % 128, filter_level=d % 64, sharpness=d % 8,
            log2_parts=d % 4, segmentation=(d % 5 == 0),
            lf_adjust=(d % 3 == 0),
        )
        return _riff([(b"VP8 ", frame)])
    if v == 3:
        if d % 2 == 1:
            # lossy still with a REAL decodable alpha plane: 16 opaque
            # pixels (i % 4 == d % 4), the rest < 255 -> coverage 48
            alpha = np.array(
                [[255 if (y * 8 + x) % 4 == d % 4
                  else (d * 13 + (y * 8 + x) * 5) % 255
                  for x in range(8)] for y in range(8)],
                dtype=np.uint8,
            )
            frame = synth_vp8_keyframe(8, 8, version=d % 4,
                                       q_index=d % 128,
                                       filter_level=d % 64)
            return _riff([
                (b"VP8X", _vp8x_body(0x10, 8, 8)),  # ALPHA flag
                (b"ALPH", encode_alpha(alpha, method=(d // 2) % 4,
                                       lossless=bool((d // 8) % 2))),
                (b"VP8 ", frame),
            ])
        data = encode_vp8l(_gray_rgba(_census_lum(d)), mode="sg")
        return _riff([
            (b"VP8X", _vp8x_body(0x08, 8, 8)),  # EXIF flag set
            (b"XYZW", b"unknown-chunk-skipped"),
            (b"VP8L", data),
            (b"EXIF", b"II*\x00\x08\x00\x00\x00\x00\x00"),
        ])
    if v == 4:
        n = 2 + d % 3
        frames = []
        for f in range(n):
            img = encode_vp8l(_gray_rgba(_census_lum(d, f)), mode="sg")
            frames.append((b"ANMF", _anmf_body(0, 0, 8, 8, 40 + (d + f) % 25, img)))
        return _riff([
            (b"VP8X", _vp8x_body(0x02, 8, 8)),
            (b"ANIM", b"\x00\x00\x00\xff\x00\x00"),
        ] + frames)
    # v == 6: RIFF header claims more bytes than exist
    good = _riff([(b"VP8L", encode_vp8l(_gray_rgba(_census_lum(d)), mode="sg"))])
    return good[:4] + struct.pack("<I", len(good) + 64) + good[8:]


# -------------------------------------------------- Spark surfaces

_CENSUS_COLS = ["variant", "width", "height", "lossless", "n_frames",
                "duration_ms", "dhash", "q_index", "filter_level",
                "alpha_coverage"]
_CENSUS_SCHEMA = (
    "doc_id bigint, variant string, width int, height int, "
    "lossless boolean, n_frames bigint, duration_ms bigint, dhash bigint, "
    "q_index int, filter_level int, alpha_coverage int"
)


def webp_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """parse_webp over any (id, binary) frame — one narrow Arrow map,
    NULL rows for rejects (the blob-census shape)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_webp, _CENSUS_COLS, _CENSUS_SCHEMA,
                              id_col, payload_col)


def webp_census_roundtrip(spark, sf_dir: str):
    """Oracle roundtrip: per doc a real WebP in one of five variants
    (+2 reject legs) is synthesized, walked/decoded by the from-spec
    parser, every census column restated as doc_id arithmetic."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_webp_census, parse_webp,
                           _CENSUS_COLS, _CENSUS_SCHEMA)


_RT_COLS = ["mode", "width", "height", "channels", "pixel_sum", "dhash"]
_RT_SCHEMA = (
    "doc_id bigint, mode string, width int, height int, channels int, "
    "pixel_sum bigint, dhash bigint"
)


def _parse_rt(d: int) -> Optional[dict]:
    from danae_spark.multimodal.pixels import dhash_bits, luma_grid

    px = decode_webp_pixels(synth_webp_rt(d))
    if px is None:
        return None
    lum = luma_grid(px)
    return {
        "mode": _RT_MODES[d % 7],
        "width": px.shape[1],
        "height": px.shape[0],
        "channels": px.shape[2],
        "pixel_sum": int(lum.sum()),
        "dhash": dhash_bits(lum),
    }


def webp_pixels_roundtrip(spark, sf_dir: str):
    """Lossless pixel roundtrip over ALL SEVEN encoder modes (the mode
    comes from doc arithmetic; validity still hinges on the real
    decode — a digest mismatch breaks the value hash)."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, lambda d: d, _parse_rt,  # type: ignore[arg-type]
                           _RT_COLS, _RT_SCHEMA)


WEBP_PIXELS_ORACLE = """
WITH m AS (
  SELECT doc_id, doc_id % 7 AS md, doc_id % 23 = 9 AS rej FROM documents
),
g AS (
  SELECT m.doc_id, s.i,
         CASE WHEN m.md = 2 THEN (m.doc_id * 31 + (s.i % 8) * 7) % 256
              WHEN m.md = 3
                THEN (((m.doc_id * 31 + s.i * 7) % 256) // 16) * 17
              ELSE (m.doc_id * 31 + s.i * 7) % 256 END AS p
  FROM m, generate_series(0, 63) s(i)
  WHERE NOT m.rej
),
sums AS (
  SELECT doc_id, CAST(sum(p) AS BIGINT) AS pixel_sum FROM g GROUP BY doc_id
),
dh AS (
  SELECT l.doc_id,
         CAST(sum(CASE WHEN l.p < r.p
                       THEN (CAST(1 AS BIGINT) << ((l.i // 8) * 7 + (l.i % 8)))
                       ELSE 0 END) AS BIGINT) AS dhash
  FROM g l JOIN g r ON l.doc_id = r.doc_id AND r.i = l.i + 1
  WHERE l.i % 8 < 7 GROUP BY l.doc_id
)
SELECT m.doc_id,
       CASE WHEN m.rej THEN NULL
            ELSE (CASE m.md WHEN 0 THEN 'lit' WHEN 1 THEN 'sg'
                  WHEN 2 THEN 'lz' WHEN 3 THEN 'pal'
                  WHEN 4 THEN 'pred' WHEN 5 THEN 'ct'
                  ELSE 'meta' END) END AS mode,
       CASE WHEN m.rej THEN NULL ELSE 8 END AS width,
       CASE WHEN m.rej THEN NULL ELSE 8 END AS height,
       CASE WHEN m.rej THEN NULL ELSE 3 END AS channels,
       sums.pixel_sum, dh.dhash
FROM m LEFT JOIN sums USING (doc_id) LEFT JOIN dh USING (doc_id)
ORDER BY m.doc_id
"""


WEBP_CENSUS_ORACLE = """
WITH base AS (SELECT doc_id, doc_id % 7 AS v FROM documents),
g AS (
  SELECT b.doc_id, s.i,
         CASE WHEN b.v = 1 THEN (b.doc_id * 31 + (s.i % 8) * 7) % 256
              ELSE (b.doc_id * 31 + s.i * 7) % 256 END AS p
  FROM base b, generate_series(0, 63) s(i)
  WHERE b.v IN (0, 1) OR (b.v = 3 AND b.doc_id % 2 = 0)
),
dh AS (
  SELECT l.doc_id,
         CAST(sum(CASE WHEN l.p < r.p
                       THEN (CAST(1 AS BIGINT) << ((l.i // 8) * 7 + (l.i % 8)))
                       ELSE 0 END) AS BIGINT) AS dhash
  FROM g l JOIN g r ON l.doc_id = r.doc_id AND r.i = l.i + 1
  WHERE l.i % 8 < 7 GROUP BY l.doc_id
),
ag AS (
  SELECT b.doc_id, f.f, s.i,
         (b.doc_id * 31 + s.i * 7 + f.f * 97) % 256 AS p
  FROM base b
  JOIN generate_series(0, 4) f(f) ON f.f < 2 + b.doc_id % 3,
       generate_series(0, 63) s(i)
  WHERE b.v = 4
),
adh AS (
  SELECT doc_id, bit_xor(fdh) AS dhash FROM (
    SELECT l.doc_id, l.f,
           CAST(sum(CASE WHEN l.p < r.p
                         THEN (CAST(1 AS BIGINT) << ((l.i // 8) * 7 + (l.i % 8)))
                         ELSE 0 END) AS BIGINT) AS fdh
    FROM ag l JOIN ag r ON l.doc_id = r.doc_id AND l.f = r.f AND r.i = l.i + 1
    WHERE l.i % 8 < 7 GROUP BY l.doc_id, l.f
  ) GROUP BY doc_id
),
adur AS (
  SELECT b.doc_id,
         CAST(sum(40 + (b.doc_id + f.f) % 25) AS BIGINT) AS dur
  FROM base b JOIN generate_series(0, 4) f(f) ON f.f < 2 + b.doc_id % 3
  WHERE b.v = 4 GROUP BY b.doc_id
)
SELECT b.doc_id,
       CASE WHEN b.v IN (0, 1) THEN 'vp8l' WHEN b.v = 2 THEN 'vp8'
            WHEN b.v = 3 THEN 'vp8x-still' WHEN b.v = 4 THEN 'vp8x-anim'
            ELSE NULL END AS variant,
       CAST(CASE WHEN b.v IN (0, 1, 3, 4) THEN 8
            WHEN b.v = 2 THEN 16 + b.doc_id % 100 ELSE NULL END AS INT) AS width,
       CAST(CASE WHEN b.v IN (0, 1, 3, 4) THEN 8
            WHEN b.v = 2 THEN 16 + b.doc_id % 80 ELSE NULL END AS INT) AS height,
       CASE WHEN b.v IN (0, 1, 4) THEN TRUE
            WHEN b.v = 3 THEN b.doc_id % 2 = 0
            WHEN b.v = 2 THEN FALSE ELSE NULL END AS lossless,
       CAST(CASE WHEN b.v IN (0, 1, 2, 3) THEN 1
            WHEN b.v = 4 THEN 2 + b.doc_id % 3 ELSE NULL END AS BIGINT)
         AS n_frames,
       adur.dur AS duration_ms,
       CASE WHEN b.v IN (0, 1, 3) THEN dh.dhash
            WHEN b.v = 4 THEN adh.dhash ELSE NULL END AS dhash,
       CAST(CASE WHEN b.v = 2 OR (b.v = 3 AND b.doc_id % 2 = 1)
            THEN b.doc_id % 128 ELSE NULL END AS INT) AS q_index,
       CAST(CASE WHEN b.v = 2 OR (b.v = 3 AND b.doc_id % 2 = 1)
            THEN b.doc_id % 64 ELSE NULL END AS INT) AS filter_level,
       CAST(CASE WHEN b.v IN (0, 1, 2) THEN 0
            WHEN b.v = 3 THEN (CASE WHEN b.doc_id % 2 = 1 THEN 48 ELSE 0 END)
            ELSE NULL END AS INT) AS alpha_coverage
FROM base b
LEFT JOIN dh USING (doc_id)
LEFT JOIN adh USING (doc_id)
LEFT JOIN adur USING (doc_id)
ORDER BY b.doc_id
"""


# ---------------------------------------- VP8 bool coder (RFC 6386 §7)
#
# The lossy-VP8 SAMPLE decode stays behind the documented codec
# boundary (coefficient tokens need the spec's large default
# probability tables — the r7 transcription-risk class). The keyframe
# FRAME HEADER, however, is literal-only arithmetic coding: every
# field up to the quantizer indices reads through bool(128) literals
# with no out-of-band table, so a from-spec bool decoder surfaces the
# crawl-side quality signals (q_index, loop-filter level, partition
# count) that a plain 10-byte header walk cannot. Encoder/decoder are
# mutually fuzz-verified (10k random bit/prob streams roundtrip
# byte-exact in tests).


class _BoolDecoder:
    """RFC 6386 §7.3 decoder: 16-bit value window, byte-deferred
    refill; reads past the partition end refill as zeros (the spec
    decoders' convention)."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.pos = 2
        self.value = (b0 << 8) | b1
        self.range = 255
        self.bit_count = 0

    def bool(self, probability: int = 128) -> int:
        split = 1 + (((self.range - 1) * probability) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                self.pos += 1
                self.value |= nxt
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bool(128) else v


class _BoolEncoder:
    """RFC 6386 §7.4 encoder (32-bit bottom register with carry
    propagation into already-emitted bytes)."""

    __slots__ = ("out", "range", "bottom", "bit_count")

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        if i < 0:
            raise _Bad  # carry out of an empty stream: cannot happen
        self.out[i] += 1

    def encode(self, bit: int, probability: int = 128) -> None:
        split = 1 + (((self.range - 1) * probability) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.encode((v >> i) & 1)

    def signed_literal(self, v: int, n: int) -> None:
        self.literal(abs(v), n)
        self.encode(1 if v < 0 else 0)

    def done(self) -> bytes:
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8
        return bytes(self.out)


_QUANT_DELTAS = 5  # y1_dc, y2_dc, y2_ac, uv_dc, uv_ac


def parse_vp8_frame_header(data: bytes) -> dict:
    """Keyframe first-partition walk up to the quantizer block
    (RFC 6386 §9.2–9.6 — the literal-only prefix): returns q_index,
    loop-filter level/sharpness, DCT partition count, and the
    segmentation flag. Raises _Bad on impossible field combinations."""
    w, h, version = parse_vp8_header(data)
    bd = _BoolDecoder(data[10:])
    color_space = bd.bool()
    bd.bool()  # clamping_type
    segmentation = bd.bool()
    if segmentation:
        update_map = bd.bool()
        update_data = bd.bool()
        if update_data:
            bd.bool()  # segment_feature_mode
            for _ in range(4):
                if bd.bool():
                    bd.signed_literal(7)
            for _ in range(4):
                if bd.bool():
                    bd.signed_literal(6)
        if update_map:
            for _ in range(3):
                if bd.bool():
                    bd.literal(8)
    filter_type = bd.bool()
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    if bd.bool():  # loop_filter_adj_enable
        if bd.bool():  # mode_ref_lf_delta_update
            for _ in range(4):
                if bd.bool():
                    bd.signed_literal(6)
            for _ in range(4):
                if bd.bool():
                    bd.signed_literal(6)
    log2_parts = bd.literal(2)
    q_index = bd.literal(7)
    for _ in range(_QUANT_DELTAS):
        if bd.bool():
            bd.signed_literal(4)
    bd.bool()  # refresh_entropy_probs
    return {
        "width": w, "height": h, "version": version,
        "color_space": color_space, "segmentation": bool(segmentation),
        "filter_type": filter_type, "filter_level": filter_level,
        "sharpness": sharpness, "n_dct_partitions": 1 << log2_parts,
        "q_index": q_index,
    }


def synth_vp8_keyframe(w: int, h: int, version: int, q_index: int,
                       filter_level: int, sharpness: int = 0,
                       log2_parts: int = 0, segmentation: bool = False,
                       lf_adjust: bool = False) -> bytes:
    """A real VP8 keyframe prefix: 10-byte uncompressed header + a
    bool-coded first partition carrying the literal-only header
    fields (coefficient data is out of scope — the partition ends
    after the refresh bit, padded to the declared size)."""
    be = _BoolEncoder()
    be.encode(0)  # color_space
    be.encode(0)  # clamping_type
    be.encode(1 if segmentation else 0)
    if segmentation:
        be.encode(1)  # update_map
        be.encode(1)  # update_data
        be.encode(0)  # feature mode
        for i in range(4):
            be.encode(1)
            be.signed_literal(10 + i, 7)
        for _ in range(4):
            be.encode(0)
        for _ in range(3):
            be.encode(1)
            be.literal(200, 8)
    be.encode(0)  # filter_type
    be.literal(filter_level, 6)
    be.literal(sharpness, 3)
    be.encode(1 if lf_adjust else 0)
    if lf_adjust:
        be.encode(1)
        for i in range(4):
            be.encode(1)
            be.signed_literal(-(i + 1), 6)
        for _ in range(4):
            be.encode(0)
    be.literal(log2_parts, 2)
    be.literal(q_index, 7)
    for _ in range(_QUANT_DELTAS):
        be.encode(0)
    be.encode(0)  # refresh_entropy_probs
    part = be.done()
    tag = 0 | ((version & 7) << 1) | (1 << 4) | (len(part) << 5)
    hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    hdr += b"\x9d\x01\x2a" + struct.pack("<HH", w, h)
    return hdr + part


# --------------------------------------------- ALPH alpha plane (r16)
#
# Lossy VP8 carries no alpha; extended files ship it in an ALPH chunk
# that IS decodable without the VP8 codec boundary: one header byte
# (reserved(2) | preprocessing(2) | filtering(2) | compression(2)),
# then either the raw w*h plane or a HEADERLESS lossless image stream
# whose green channel holds the alpha values, followed by one of four
# prediction filters to invert (the libwebp/spec semantics: first row
# seeds from 0-then-left; horizontal predicts left with the first
# column from above; vertical predicts above; gradient clamps
# left+above-topleft). Preprocessing (level reduction) is an encoder
# hint with no inverse. Reject-whole: bad header fields, short raw
# planes, a lossless stream whose dims disagree.


def _unfilter_alpha(plane: np.ndarray, method: int) -> np.ndarray:
    if method == 0:
        return plane
    h, w = plane.shape
    out = np.zeros_like(plane)
    for y in range(h):
        prev = out[y - 1] if y > 0 else None
        row = plane[y]
        if prev is None or method == 1:  # horizontal (or seed row)
            pred = 0 if prev is None else int(prev[0])
            for x in range(w):
                pred = (pred + int(row[x])) & 0xFF
                out[y, x] = pred
        elif method == 2:  # vertical
            out[y] = (prev.astype(np.int64) + row.astype(np.int64)) & 0xFF
        else:  # gradient
            left = tl = int(prev[0])
            for x in range(w):
                top = int(prev[x])
                g = left + top - tl
                g = 0 if g < 0 else 255 if g > 255 else g
                left = (int(row[x]) + g) & 0xFF
                tl = top
                out[y, x] = left
    return out


def _filter_alpha(plane: np.ndarray, method: int) -> np.ndarray:
    """Forward filter (encoder side): residuals whose unfilter
    reproduces the plane exactly."""
    if method == 0:
        return plane
    h, w = plane.shape
    out = np.zeros_like(plane)
    for y in range(h):
        prev = plane[y - 1] if y > 0 else None
        for x in range(w):
            if prev is None:
                pred = 0 if x == 0 else int(plane[y, x - 1])
            elif method == 1:
                pred = int(prev[0]) if x == 0 else int(plane[y, x - 1])
            elif method == 2:
                pred = int(prev[x])
            else:
                if x == 0:
                    left = tl = int(prev[0])
                else:
                    left, tl = int(plane[y, x - 1]), int(prev[x - 1])
                g = left + int(prev[x]) - tl
                pred = 0 if g < 0 else 255 if g > 255 else g
            out[y, x] = (int(plane[y, x]) - pred) & 0xFF
    return out


def decode_alpha(data: bytes, w: int, h: int) -> Optional[np.ndarray]:
    """ALPH chunk payload -> (h, w) uint8 alpha plane; None on any
    malformation (reject-whole)."""
    try:
        if not data or w * h > _MAX_PIXELS:
            return None
        hdr = data[0]
        if hdr >> 6:
            raise _Bad  # reserved bits
        method = (hdr >> 2) & 3
        compression = hdr & 3
        if compression == 0:
            if len(data) - 1 < w * h:
                raise _Bad
            plane = np.frombuffer(data, np.uint8, count=w * h,
                                  offset=1).reshape(h, w)
        elif compression == 1:
            buf = _decode_argb_stream(_BitReader(data[1:]), w, h)
            plane = ((np.array(buf, dtype=np.uint32) >> 8) & 0xFF).astype(
                np.uint8).reshape(h, w)
        else:
            raise _Bad
        return _unfilter_alpha(plane, method)
    except (_Bad, ValueError, IndexError, OverflowError, struct.error):
        return None


def encode_alpha(plane: np.ndarray, method: int = 0,
                 lossless: bool = False) -> bytes:
    """(h, w) uint8 alpha -> a real ALPH chunk payload (raw or
    lossless-coded residuals under the chosen prediction filter)."""
    filtered = _filter_alpha(plane.astype(np.uint8), method)
    hdr = bytes([(method << 2) | (1 if lossless else 0)])
    if not lossless:
        return hdr + filtered.tobytes()
    h, w = filtered.shape
    pixels = [0xFF000000 | (int(v) << 8) for v in filtered.reshape(-1)]
    bw = _BitWriter()
    bw.write(0, 1)  # no transforms
    _write_image_data(bw, pixels, w, True)
    return hdr + bw.done()
