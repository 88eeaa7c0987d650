"""TIFF 6.0 baseline pixel decode — uncompressed / PackBits / LZW strips.

Closes the last common still-image family the pixel surface lacked
(multimodal/pixels.py decodes PNG/BMP/PPM/PGM/GIF/baseline-JPEG):
`decode_tiff` walks the IFD (the same structure exif.py's metadata
walker reads — this one returns multi-value SHORT/LONG arrays because
StripOffsets/StripByteCounts/BitsPerSample need them), assembles the
strip layout, and decodes the three baseline compressions from the
spec: 1 (none), 32773 (PackBits run-length), 5 (LZW — the TIFF
flavor: MSB-first code packing, 9..12-bit widths with the EarlyChange
one-code-early width bump, CLEAR/EOI codes) plus the horizontal-
differencing predictor (tag 317 = 2).

Supported subset (reject-whole outside it, like every decoder in this
surface): 8-bit samples, chunky planar config, gray (photometric 0
inverted / 1), RGB (2), and palette (3, 16-bit ColorMap scaled to
8-bit); strips only (tiled TIFFs reject), both byte orders. The
paired `synth_tiff` emits spec-valid files in three variants (gray
uncompressed little-endian multi-strip, RGB PackBits big-endian,
RGB LZW+predictor single-strip) for the synth rotation, so every
decode path runs on every oracle sweep via image_pixels_roundtrip.

Scale shape: pure per-record CPU inside the same Arrow mapInPandas
batches as the other image decoders; no Spark surface of its own.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_tiff", "synth_tiff"]

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

_MAX_ENTRIES = 512
_MAX_PIXELS = 64 * 1024 * 1024  # bomb guard: 64 MP is plenty for a census


def _read_ifd_multi(data: bytes, off: int, end: str) -> dict[int, object]:
    """IFD -> {tag: value or list}; like exif._read_ifd but multi-value
    SHORT/LONG/BYTE arrays come back as lists (strip tables need them)."""
    if off + 2 > len(data):
        raise ValueError("IFD count past buffer")
    (n,) = struct.unpack_from(end + "H", data, off)
    if n > _MAX_ENTRIES or off + 2 + 12 * n + 4 > len(data):
        raise ValueError("IFD entries past buffer")
    out: dict[int, object] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(end + "HHL", data, base)
        size = _TYPE_SIZE.get(typ)
        if size is None or count > len(data):
            raise ValueError(f"bad IFD entry type {typ}")
        nbytes = size * count
        voff = base + 8
        if nbytes > 4:
            (voff,) = struct.unpack_from(end + "L", data, base + 8)
        if voff + nbytes > len(data):
            raise ValueError("IFD value past buffer")
        if typ == 3:
            vals = list(struct.unpack_from(end + f"{count}H", data, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(end + f"{count}L", data, voff))
        elif typ in (1, 6, 7):
            vals = list(data[voff : voff + count])
        else:
            continue  # rationals/ASCII carry no pixel-layout info here
        out[tag] = vals if count != 1 else vals[0]
    return out


def _as_list(v) -> list:
    return v if isinstance(v, list) else [v]


# ------------------------------------------------------ strip codecs


def _packbits_decode(data: bytes, max_bytes: int) -> bytearray | None:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            if i + c + 1 > n:
                return None
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            if i >= n:
                return None
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
        if len(out) > max_bytes:
            return None
    return out


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += 1
        while (
            i < n
            and i - lit_start < 128
            and not (i + 1 < n and data[i + 1] == data[i])
        ):
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def _tiff_lzw_decode(data: bytes, max_bytes: int) -> bytearray | None:
    """TIFF-flavor LZW: MSB-first packing, 9-bit start, EarlyChange
    width bump (one code early), CLEAR=256 / EOI=257; EOI required."""
    CLEAR, EOI = 256, 257

    def fresh() -> list[bytes]:
        return [bytes((i,)) for i in range(256)] + [b"", b""]

    table = fresh()
    width = 9
    out = bytearray()
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= width:
            code = (acc >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == CLEAR:
                table = fresh()
                width = 9
                prev = None
                continue
            if code == EOI:
                return out
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                if len(table) < 4096:
                    table.append(entry)
            else:
                return None
            out += entry
            prev = entry
            # EarlyChange + the decoder's one-entry lag behind the
            # encoder's table: the encoder emits 10-bit codes once it
            # has ADDED code 510, which the decoder (whose append runs
            # one code behind) reaches at table length 2^width - 2
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
            if len(out) > max_bytes:
                return None
    return None  # strips must end with EOI


def _tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = bits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, bits
        acc = (acc << width) | code
        bits += width
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes((i,)): i for i in range(256)}

    table = fresh()
    nxt = 258
    width = 9
    put(CLEAR, width)
    cur = b""
    for b in bytes(data):
        cand = cur + bytes((b,))
        if cand in table:
            cur = cand
            continue
        put(table[cur], width)
        table[cand] = nxt
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        if nxt >= 4094:
            put(CLEAR, width)
            table = fresh()
            nxt = 258
            width = 9
        cur = bytes((b,))
    if cur:
        put(table[cur], width)
    put(EOI, width)
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


# ----------------------------------------------------------- decoder


def decode_tiff(payload: bytes) -> np.ndarray | None:
    """(H, W, C) uint8 array, or None for malformed / out-of-subset."""
    try:
        return _decode(payload)
    except (ValueError, struct.error, IndexError, OverflowError):
        return None


def _decode(payload: bytes) -> np.ndarray | None:
    if len(payload) < 8:
        return None
    if payload[:4] == b"II*\x00":
        end = "<"
    elif payload[:4] == b"MM\x00*":
        end = ">"
    else:
        return None
    (ifd_off,) = struct.unpack_from(end + "L", payload, 4)
    tags = _read_ifd_multi(payload, ifd_off, end)
    if 322 in tags or 323 in tags or 324 in tags or 325 in tags:
        return None  # tiled layout: out of subset
    width = tags.get(256)
    height = tags.get(257)
    if not isinstance(width, int) or not isinstance(height, int):
        return None
    if width <= 0 or height <= 0 or width * height > _MAX_PIXELS:
        return None
    spp = tags.get(277, 1)
    if not isinstance(spp, int) or spp not in (1, 3):
        return None
    bits = _as_list(tags.get(258, 1))
    if len(bits) != spp or any(b != 8 for b in bits):
        return None
    if tags.get(284, 1) != 1:
        return None  # planar config 2: out of subset
    comp = tags.get(259, 1)
    photometric = tags.get(262)
    if photometric not in (0, 1, 2, 3):
        return None
    if photometric == 3 and (spp != 1 or 320 not in tags):
        return None
    offsets = _as_list(tags.get(273))
    counts = _as_list(tags.get(279))
    if tags.get(273) is None or tags.get(279) is None:
        return None
    if len(offsets) != len(counts) or not offsets:
        return None
    rows_per_strip = tags.get(278, height)
    if not isinstance(rows_per_strip, int) or rows_per_strip <= 0:
        return None
    if len(offsets) != (height + rows_per_strip - 1) // rows_per_strip:
        return None
    predictor = tags.get(317, 1)
    if predictor not in (1, 2):
        return None
    row_bytes = width * spp
    raw = bytearray()
    remaining_rows = height
    for off, cnt in zip(offsets, counts):
        if not isinstance(off, int) or not isinstance(cnt, int):
            return None
        if off + cnt > len(payload):
            return None
        blob = payload[off : off + cnt]
        strip_rows = min(rows_per_strip, remaining_rows)
        want = strip_rows * row_bytes
        if comp == 1:
            if len(blob) < want:
                return None
            strip = bytearray(blob[:want])
        elif comp == 32773:
            strip = _packbits_decode(blob, want)
        elif comp == 5:
            strip = _tiff_lzw_decode(blob, want)
        else:
            return None  # CCITT/JPEG-in-TIFF/deflate: out of subset
        if strip is None or len(strip) != want:
            return None
        raw += strip
        remaining_rows -= strip_rows
    if remaining_rows != 0:
        return None
    px = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(height, width, spp)
    if predictor == 2:
        px = np.cumsum(px.astype(np.int64), axis=1).astype(np.uint8)
    if photometric == 0:
        px = (255 - px.astype(np.int64)).astype(np.uint8)
    elif photometric == 3:
        cmap = _as_list(tags[320])
        if len(cmap) != 3 * 256:
            return None
        lut = (np.asarray(cmap, dtype=np.int64).reshape(3, 256) >> 8).astype(
            np.uint8
        )
        idx = px[:, :, 0]
        px = np.stack([lut[0][idx], lut[1][idx], lut[2][idx]], axis=2)
    return px


# ----------------------------------------------------------- encoder


def synth_tiff(lum: np.ndarray, variant: str = "tiff_gray") -> bytes:
    """Spec-valid TIFF for an (N, N) int luma grid. Variants:
    tiff_gray — 8-bit gray, uncompressed, little-endian, TWO strips;
    tiff_pack — RGB (r=g=b=luma), PackBits, BIG-endian, two strips;
    tiff_lzw  — RGB, LZW with horizontal predictor 2, one strip."""
    h, w = lum.shape
    gray = lum.astype(np.uint8)
    if variant == "tiff_gray":
        end, spp, comp, predictor = "<", 1, 1, 1
        px = gray.reshape(h, w, 1)
    elif variant == "tiff_pack":
        end, spp, comp, predictor = ">", 3, 32773, 1
        px = np.repeat(gray.reshape(h, w, 1), 3, axis=2)
    elif variant == "tiff_lzw":
        end, spp, comp, predictor = "<", 3, 5, 2
        px = np.repeat(gray.reshape(h, w, 1), 3, axis=2)
    else:
        raise ValueError(variant)
    if predictor == 2:
        body = np.diff(
            px.astype(np.int64), axis=1, prepend=np.zeros((h, 1, spp), np.int64)
        )
        body = (body % 256).astype(np.uint8)
    else:
        body = px
    nstrips = 1 if variant == "tiff_lzw" else 2
    rows_per_strip = h if nstrips == 1 else (h + 1) // 2
    strips: list[bytes] = []
    r = 0
    while r < h:
        chunk = body[r : r + rows_per_strip].tobytes()
        if comp == 32773:
            strips.append(_packbits_encode(chunk))
        elif comp == 5:
            strips.append(_tiff_lzw_encode(chunk))
        else:
            strips.append(chunk)
        r += rows_per_strip

    # layout: header | strip data (even-aligned) | IFD | oversize values
    out = bytearray()
    out += (b"II*\x00" if end == "<" else b"MM\x00*")
    out += b"\x00\x00\x00\x00"  # IFD offset patched below
    offsets, counts = [], []
    for s in strips:
        if len(out) % 2:
            out += b"\x00"
        offsets.append(len(out))
        counts.append(len(s))
        out += s
    if len(out) % 2:
        out += b"\x00"
    ifd_off = len(out)
    struct.pack_into(end + "L", out, 4, ifd_off)

    entries: list[tuple[int, int, int, bytes]] = []  # tag, typ, count, raw

    def short(tag: int, vals) -> None:
        vals = vals if isinstance(vals, list) else [vals]
        entries.append(
            (tag, 3, len(vals), struct.pack(end + f"{len(vals)}H", *vals))
        )

    def long(tag: int, vals) -> None:
        vals = vals if isinstance(vals, list) else [vals]
        entries.append(
            (tag, 4, len(vals), struct.pack(end + f"{len(vals)}L", *vals))
        )

    short(256, w)
    short(257, h)
    short(258, [8] * spp)
    short(259, comp)
    short(262, 1 if spp == 1 else 2)
    long(273, offsets)
    short(277, spp)
    short(278, rows_per_strip)
    long(279, counts)
    if predictor == 2:
        short(317, predictor)
    entries.sort()
    n = len(entries)
    ifd = bytearray(struct.pack(end + "H", n))
    extra = bytearray()
    extra_base = ifd_off + 2 + 12 * n + 4
    for tag, typ, count, raw in entries:
        ifd += struct.pack(end + "HHL", tag, typ, count)
        if len(raw) <= 4:
            ifd += raw.ljust(4, b"\x00")
        else:
            if (extra_base + len(extra)) % 2:
                extra += b"\x00"
            ifd += struct.pack(end + "L", extra_base + len(extra))
            extra += raw
    ifd += struct.pack(end + "L", 0)  # no next IFD
    return bytes(out + ifd + extra)
