"""Real PIXEL decode for stdlib-decodable image formats.

The container has no codec libraries, but every major image family
decodes without one: PNG is zlib inflate + the five spec unfilter
types (RFC 2083 §6; all depths 1/2/4/8/16, Adam7 interlace, palette), BMP (BITMAPINFOHEADER; 24-bit raw and
8-bit palettized incl. BI_RLE8) is bottom-up/top-down rows, PPM/PGM (P6/P5 binary) are raw bytes after an
ASCII header, GIF is a pure-Python LZW decode (variable-width
LSB-first codes, table resets, interlace passes) through the palette,
and baseline JPEG decodes through the numpy codec in jpegcodec.py
(Huffman entropy decode, differential DC, IDCT, YCbCr→RGB — declared
subset: 8-bit sequential AND progressive, incl. 4:2:0/4:2:2 + restarts).
`parse_image_header` (binary.py) stays the metadata path for
out-of-subset variants, and the declared fake-encoder path remains
their fallback in media_near_dup.

Everything is pure bytes→numpy so it runs inside Arrow mapInPandas
batches, the same plumbing pattern as the header parsers. On top of
the decoder sit the classic perceptual hashes — average hash and
dHash (block-mean resize to an 8×8 grid, integer luma) — giving the
multimodal near-dup pipeline REAL pixel evidence for these formats.

Reference parity note: the reference engine (smartdatalake/danae) has
no media pipeline at all; this implements the prompt-mandated
multimodal decode/feature surface with the decode step real where
stdlib allows and declared-stubbed where it does not.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from danae_spark.session import stage_parallelism

# ------------------------------------------------------------------ decode

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (palette handled via PLTE expansion)
_PNG_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_unfilter(raw: bytes, stride: int, height: int, bpp: int) -> np.ndarray:
    """Invert the per-row PNG filters. Returns (height, stride) uint8;
    stride is the scanline byte length (width·bpp for ≥8-bit depths,
    ceil(width·depth/8) for sub-byte), bpp the filter offset (≥1 byte).

    Sub/Average/Paeth carry an in-row prefix dependency, so rows decode
    with a per-byte loop; Up/None are whole-row vector ops. Images here
    are thumbnails/synthesized payloads — correctness over throughput."""
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            row += prev
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (int(row[x]) + int(row[x - bpp])) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = row
        prev = out[y]
    return out


# Adam7 interlace passes: (x_start, x_step, y_start, y_step)
_ADAM7 = [
    (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
    (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
]


def _decode_png(payload: bytes) -> np.ndarray | None:
    if payload[:8] != _PNG_MAGIC or payload[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", payload[16:24])
    bit_depth, color_type, _comp, _filt, interlace = payload[24:29]
    if (
        bit_depth not in (1, 2, 4, 8, 16)
        or interlace not in (0, 1)
        or color_type not in _PNG_SAMPLES
        or (bit_depth == 16 and color_type == 3)  # no 16-bit palettes
        or (bit_depth < 8 and color_type not in (0, 3))  # sub-byte: gray/palette only
    ):
        return None  # invalid header combinations
    plte = None
    idat = b""
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (clen,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        if ctype == b"IDAT":
            idat += body
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + body + crc
    if not idat:
        return None
    samples = _PNG_SAMPLES[color_type]
    # filter offset: the byte distance of "the pixel to the left",
    # floored at one byte for sub-byte depths (PNG spec 9.2)
    fbpp = max(1, samples * bit_depth // 8)

    def unpack_rows(rows: np.ndarray, wp: int) -> np.ndarray:
        """(hp, stride) filtered-out bytes → (hp, wp, samples) raw
        sample values (high byte for 16-bit; bit-unpacked for sub-byte)."""
        hp = rows.shape[0]
        if bit_depth == 8:
            return rows.reshape(hp, wp, samples)
        if bit_depth == 16:
            return rows.reshape(hp, wp, samples, 2)[..., 0]
        bits = np.unpackbits(rows, axis=1)[:, : wp * bit_depth]
        weights = 1 << np.arange(bit_depth - 1, -1, -1)
        return (
            bits.reshape(hp, wp, bit_depth).dot(weights).astype(np.uint8)
        )[..., None]

    def decode_pass(raw_part: bytes, wp: int, hp: int) -> np.ndarray:
        stride = (wp * samples * bit_depth + 7) // 8
        return unpack_rows(_png_unfilter(raw_part, stride, hp, fbpp), wp)

    raw = zlib.decompress(idat)
    if interlace == 0:
        stride = (w * samples * bit_depth + 7) // 8
        if len(raw) != h * (1 + stride):
            return None
        px = decode_pass(raw, w, h)
    else:
        # Adam7: seven independently-filtered sub-images, scattered
        # back onto the full grid (PNG spec §8.2)
        px = np.zeros((h, w, samples), dtype=np.uint8)
        pos = 0
        for (x0, dx, y0, dy) in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            stride = (wp * samples * bit_depth + 7) // 8
            need = hp * (1 + stride)
            if pos + need > len(raw):
                return None
            px[y0::dy, x0::dx] = decode_pass(raw[pos : pos + need], wp, hp)
            pos += need
    if color_type == 3:
        if plte is None:
            return None
        return plte[px[:, :, 0]]  # palette → RGB
    if bit_depth < 8:
        # scale sub-byte gray to full range (255 / (2^d - 1))
        px = (px.astype(np.int64) * 255 // ((1 << bit_depth) - 1)).astype(
            np.uint8
        )
    return px.copy()


def _decode_bmp(payload: bytes) -> np.ndarray | None:
    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        return None
    w, h = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    (clr_used,) = struct.unpack("<I", payload[46:50])
    if w <= 0 or h == 0:
        return None
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    if bpp == 24 and compression == 0:
        stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
        if len(payload) < data_off + stride * h:
            return None
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if flip:
            rows = rows[::-1]
        return rows[:, :, ::-1].copy()  # BGR → RGB
    if bpp == 8 and compression in (0, 1):  # palettized, raw or RLE8
        n_colors = clr_used or 256
        pal_off = 14 + hdr_size
        if len(payload) < pal_off + 4 * n_colors:
            return None
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=4 * n_colors, offset=pal_off
        ).reshape(n_colors, 4)[:, 2::-1]  # BGRA → RGB
        if compression == 0:
            stride = (w + 3) & ~3
            if len(payload) < data_off + stride * h:
                return None
            idx = np.frombuffer(
                payload, dtype=np.uint8, count=stride * h, offset=data_off
            ).reshape(h, stride)[:, :w]
        else:
            idx = _bmp_rle8(payload[data_off:], w, h)
            if idx is None:
                return None
        if (idx >= n_colors).any():
            return None
        if flip:
            idx = idx[::-1]
        return pal[idx].copy()
    if bpp == 32 and compression == 0:  # r15: BGRA, no padding needed
        stride = w * 4
        if len(payload) < data_off + stride * h:
            return None
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, w, 4)
        if flip:
            rows = rows[::-1]
        # BGRA -> RGBA (luma_grid treats 4-channel as RGB-of-RGBA)
        return rows[:, :, [2, 1, 0, 3]].copy()
    if bpp == 16 and compression in (0, 3):  # r15: 555 / BITFIELDS 565
        masks = (0x7C00, 0x03E0, 0x001F)  # X1R5G5B5 default
        if compression == 3:
            # BITFIELDS masks sit right after the 40-byte info header
            # (same offset inside BITMAPV4/V5 headers)
            if len(payload) < 66:
                return None
            masks = struct.unpack("<III", payload[54:66])
            if masks not in ((0xF800, 0x07E0, 0x001F), (0x7C00, 0x03E0, 0x001F)):
                return None  # nonstandard masks: out of subset
        stride = (w * 2 + 3) & ~3
        if len(payload) < data_off + stride * h:
            return None
        raw = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)[:, : w * 2]
        v = raw[:, 0::2].astype(np.uint16) | (raw[:, 1::2].astype(np.uint16) << 8)
        out = np.empty((h, w, 3), dtype=np.uint8)
        for c, mask in enumerate(masks):
            shift = (mask & -mask).bit_length() - 1
            width = bin(mask >> shift).count("1")
            chan = (v & mask) >> shift
            # expand 5/6-bit to 8-bit by bit replication
            out[:, :, c] = ((chan << (8 - width)) | (chan >> (2 * width - 8))).astype(
                np.uint8
            )
        if flip:
            out = out[::-1]
        return out
    return None


def _bmp_rle8(data: bytes, w: int, h: int) -> np.ndarray | None:
    """BI_RLE8 (BMP spec): (count, value) runs, 0x00-escapes for end of
    line (0), end of bitmap (1), delta (2), and absolute runs (n ≥ 3,
    word-aligned). Returns the (h, w) index grid in stored (bottom-up
    unless top-down) row order; the caller flips."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 1 < n and y < h:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            end = min(x + cnt, w)
            out[y, x:end] = val
            x = end
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return out
        elif val == 2:  # delta jump
            if i + 1 >= n:
                return None
            x = min(x + data[i], w)
            y += data[i + 1]
            i += 2
        else:  # absolute mode: val literal bytes, padded to a word
            if i + val > n:
                return None
            end = min(x + val, w)
            out[y, x:end] = np.frombuffer(
                data, dtype=np.uint8, count=end - x, offset=i
            )
            x = end
            i += val + (val & 1)
    return out


def _decode_pnm(payload: bytes) -> np.ndarray | None:
    if payload[:2] not in (b"P2", b"P3", b"P5", b"P6"):
        return None
    channels = 1 if payload[:2] in (b"P2", b"P5") else 3
    ascii_mode = payload[:2] in (b"P2", b"P3")  # r15: plain PNM
    # header: magic, width, height, maxval as whitespace-separated ASCII
    # tokens ('#' comments allowed), then a single whitespace byte
    tokens: list[int] = []
    i = 2
    n = len(payload)
    while len(tokens) < 3 and i < n:
        c = payload[i : i + 1]
        if c == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
    if len(tokens) < 3 or tokens[2] != 255:
        return None
    w, h = tokens[0], tokens[1]
    need = w * h * channels
    if ascii_mode:
        # plain PNM: whitespace-separated ASCII samples ('#' comments
        # legal between tokens); exactly `need` values, each 0..255
        try:
            text = payload[i:].decode("ascii")
        except UnicodeDecodeError:
            return None
        vals: list[int] = []
        for line in text.split("\n"):
            hash_at = line.find("#")
            if hash_at != -1:
                line = line[:hash_at]
            vals.extend(line.split())
        if len(vals) != need:
            return None
        try:
            arr = np.array([int(v) for v in vals], dtype=np.int64)
        except ValueError:
            return None
        if (arr < 0).any() or (arr > 255).any():
            return None
        return arr.astype(np.uint8).reshape(h, w, channels)
    i += 1  # the single whitespace after maxval
    if n - i < need:
        return None
    arr = np.frombuffer(payload, dtype=np.uint8, count=need, offset=i)
    return arr.reshape(h, w, channels)


def _lzw_decode(data: bytes, min_code: int, max_pixels: int) -> bytearray | None:
    """GIF-flavored LZW (GIF89a spec, appendix F): variable-width codes
    packed LSB-first, CLEAR resets the table, width grows when the
    table reaches 2^width (capped at 12 bits)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes((i,)) for i in range(clear)] + [b"", b""]
    width = min_code + 1
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = [bytes((i,)) for i in range(clear)] + [b"", b""]
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
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
            if len(table) >= (1 << width) and width < 12:
                width += 1
            if len(out) >= max_pixels:
                return out
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif(payload: bytes) -> np.ndarray | None:
    """First frame of a GIF87a/89a: logical screen + global/local color
    table + LZW-decompressed indexed pixels (interlace supported),
    expanded through the palette to RGB."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        return None
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    n_total = len(payload)
    while pos < n_total:
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < n_total and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > n_total:
                return None
            w, h = struct.unpack("<HH", payload[pos + 5 : pos + 9])
            ipacked = payload[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
                pos += n * 3
            if ct is None or pos >= n_total:
                return None
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while pos < n_total and payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(bytes(data), min_code, w * h)
            if idx is None or len(idx) < w * h:
                return None
            grid = np.frombuffer(bytes(idx[: w * h]), np.uint8).reshape(h, w)
            if ipacked & 0x40:  # interlaced: rows arrive in four passes
                rows = np.empty_like(grid)
                src = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    for y in range(start, h, step):
                        rows[y] = grid[src]
                        src += 1
                grid = rows
            safe = np.minimum(grid, len(ct) - 1)
            return ct[safe]
        elif block == 0x3B:
            return None
        else:
            return None
    return None


def decode_pixels(payload: bytes) -> np.ndarray | None:
    """Decode a PNG / 24-bit BMP / binary PPM/PGM / GIF payload to an
    (H, W, C) uint8 array; None for anything outside the
    stdlib-decodable subset (JPEG, interlaced/16-bit PNG, ...) AND for
    malformed/truncated payloads — a crawl feeds this arbitrary bytes,
    so decoder-internal errors (truncated deflate stream, bad reshape)
    degrade to the caller's declared fallback, never a task failure."""
    if len(payload) < 12:
        return None
    try:
        if payload[:8] == _PNG_MAGIC:
            return _decode_png(payload)
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
        if payload[:2] in (b"P2", b"P3", b"P5", b"P6"):
            return _decode_pnm(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return _decode_gif(payload)
        if payload[:3] == b"\xff\xd8\xff":
            from danae_spark.multimodal.jpegcodec import decode_jpeg

            return decode_jpeg(payload)  # None for out-of-subset variants
        if payload[:4] in (b"II*\x00", b"MM\x00*"):
            from danae_spark.multimodal.tiff import decode_tiff

            return decode_tiff(payload)  # baseline strips (r15)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            from danae_spark.multimodal.webp import decode_webp_pixels

            return decode_webp_pixels(payload)  # VP8L lossless (r16)
    except (zlib.error, ValueError, struct.error, IndexError):
        return None
    return None


# ------------------------------------------------------- perceptual hashes


def luma_grid(px: np.ndarray, grid: int = 8) -> np.ndarray:
    """Integer luma ((r+g+b)//3 for RGB-like, channel 0 for gray/GA,
    RGB of RGBA) block-mean-resized to (grid, grid) int64. When the
    image is already grid×grid the pixels pass through untouched — the
    property the round-trip oracle leans on."""
    h, w, c = px.shape
    if c >= 3:
        lum = (
            px[:, :, 0].astype(np.int64)
            + px[:, :, 1].astype(np.int64)
            + px[:, :, 2].astype(np.int64)
        ) // 3
    else:
        lum = px[:, :, 0].astype(np.int64)
    if (h, w) == (grid, grid):
        return lum
    # block mean over an even partition of rows/cols (floor boundaries)
    ys = [h * i // grid for i in range(grid + 1)]
    xs = [w * i // grid for i in range(grid + 1)]
    out = np.zeros((grid, grid), dtype=np.int64)
    for gy in range(grid):
        for gx in range(grid):
            blk = lum[ys[gy] : ys[gy + 1], xs[gx] : xs[gx + 1]]
            out[gy, gx] = int(blk.mean()) if blk.size else 0
    return out


def avg_hash_bits(lum: np.ndarray) -> int:
    """64-bit average hash: bit (y*8+x) set iff pixel > mean (integer
    mean, matching the SQL oracle's floor division)."""
    mean = int(lum.sum()) // lum.size
    bits = 0
    flat = lum.reshape(-1)
    for i in range(flat.size):
        if flat[i] > mean:
            bits |= 1 << i
    return bits


def dhash_bits(lum: np.ndarray) -> int:
    """56-bit row-gradient dHash on an 8×8 grid: bit (y*7+x) set iff
    p[y,x] < p[y,x+1]. 56 bits keeps the value inside a signed BIGINT
    for the SQL oracle."""
    bits = 0
    g = lum.shape[0]
    for y in range(g):
        for x in range(g - 1):
            if lum[y, x] < lum[y, x + 1]:
                bits |= 1 << (y * (g - 1) + x)
    return bits


# ------------------------------------------------- synthesized payloads

# r8 widened the rotation with the newly-real container variants —
# 16-bit and Adam7-interlaced PNG, palettized raw/RLE8 BMP, and
# progressive JPEG is exercised by its own registered entry. The
# oracle states luma as pure doc_id arithmetic, so container choice
# only changes WHICH decoder must reproduce it.
_RT_FORMATS = (
    "png_gray", "png_rgb", "bmp", "ppm", "pgm", "gif",
    "png16", "png_adam7", "bmp8", "bmp8_rle",
    "tiff_gray", "tiff_pack", "tiff_lzw",
    "webp",
)
# gray-payload rotation slots (decode to 1 channel); everything else
# decodes to 3 — the oracle CASEs below are GENERATED from these so
# widening the rotation cannot drift the SQL (r16)
_RT_GRAY = ("png_gray", "pgm", "png16", "tiff_gray")


def _rt_luma(doc_id: int, i: int) -> int:
    return (doc_id * 31 + i * 7) % 256


def _png_filter_rows(px_bytes: np.ndarray, bpp: int, filter_of_row) -> bytearray:
    """Apply per-row PNG filters to a (h, stride) byte matrix (stride =
    width·bpp); filter_of_row(y) → 0..4, default cycles so every
    unfilter branch is exercised."""
    h, stride = px_bytes.shape
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row = px_bytes[y].astype(np.int64)
        f = filter_of_row(y) if filter_of_row else y % 5
        raw.append(f)
        for x in range(stride):
            left = int(row[x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            ul = int(prev[x - bpp]) if x >= bpp else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = row[x] - left
            elif f == 2:
                v = row[x] - up
            elif f == 3:
                v = row[x] - ((left + up) >> 1)
            else:
                v = row[x] - _paeth(left, up, ul)
            raw.append(int(v) & 0xFF)
        prev = row
    return raw


def synth_png(
    lum: np.ndarray,
    rgb: bool = False,
    filter_of_row=None,
    interlace: bool = False,
    bit_depth: int = 8,
) -> bytes:
    """Real PNG encoder for a (h, w) luma grid: zlib-deflated IDAT with
    per-row filters APPLIED, CRC32-correct chunks. interlace=True
    writes Adam7 (seven independently-filtered sub-images); bit_depth=16
    writes big-endian 16-bit samples v·257 (so the high byte — what the
    decoder keeps — round-trips the 8-bit value exactly)."""
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError("bit_depth must be one of 1/2/4/8/16")
    if bit_depth < 8 and rgb:
        raise ValueError("sub-byte depths are grayscale-only")
    h, w = lum.shape
    samples = 3 if rgb else 1
    px = (
        np.repeat(lum.astype(np.uint16)[:, :, None], 3, axis=2)
        if rgb
        else lum.astype(np.uint16)[:, :, None]
    )
    bpp = max(1, samples * bit_depth // 8)

    def pack(sub_px: np.ndarray) -> np.ndarray:
        """(hp, wp, samples) sample values → (hp, stride) scanline bytes."""
        hp, wp = sub_px.shape[0], sub_px.shape[1]
        if bit_depth == 8:
            return sub_px.astype(np.uint8).reshape(hp, wp * samples)
        if bit_depth == 16:
            # v*257 = (v<<8)|v: full-scale 8→16 expansion, big-endian
            wide = sub_px.astype(np.uint16) * 257
            return (
                np.stack([(wide >> 8) & 0xFF, wide & 0xFF], axis=-1)
                .astype(np.uint8)
                .reshape(hp, wp * samples * 2)
            )
        if (sub_px >= (1 << bit_depth)).any():
            raise ValueError(f"values exceed {bit_depth}-bit range")
        # expand each value into its bit_depth MSB-first bits
        bits = (
            (sub_px[:, :, 0, None] >> np.arange(bit_depth - 1, -1, -1)) & 1
        ).astype(np.uint8).reshape(hp, wp * bit_depth)
        return np.packbits(bits, axis=1)

    if not interlace:
        raw = _png_filter_rows(pack(px), bpp, filter_of_row)
    else:
        raw = bytearray()
        for (x0, dx, y0, dy) in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            raw += _png_filter_rows(pack(px[y0::dy, x0::dx]), bpp, filter_of_row)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(
        ">IIBBBBB", w, h, bit_depth, 2 if rgb else 0, 0, 0, 1 if interlace else 0
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def synth_bmp8(
    lum: np.ndarray, rle: bool = False, top_down: bool = False
) -> bytes:
    """8-bit palettized BMP (grayscale identity palette), raw or
    BI_RLE8-compressed — fixtures for the palette/RLE decode paths. The
    RLE emitter mixes encoded runs, absolute runs (for short literal
    stretches), end-of-line and end-of-bitmap escapes."""
    h, w = lum.shape
    pal = b"".join(bytes((v, v, v, 0)) for v in range(256))
    if not rle:
        stride = (w + 3) & ~3
        body = bytearray()
        rows = lum if top_down else lum[::-1]
        for y in range(h):
            body += bytes(int(v) for v in rows[y]) + b"\x00" * (stride - w)
        compression = 0
    else:
        body = bytearray()
        rows = lum if top_down else lum[::-1]
        for y in range(h):
            x = 0
            while x < w:
                run = 1
                while x + run < w and run < 255 and int(rows[y, x + run]) == int(rows[y, x]):
                    run += 1
                if run >= 3 or x + run >= w:
                    body += bytes((run, int(rows[y, x])))
                    x += run
                else:
                    # absolute run of up to 255 literals (until a 3-run)
                    j = x
                    while (
                        j < w
                        and j - x < 255
                        and not (
                            j + 2 < w
                            and int(rows[y, j]) == int(rows[y, j + 1]) == int(rows[y, j + 2])
                        )
                    ):
                        j += 1
                    lit = j - x
                    if lit >= 3:
                        body += bytes((0, lit)) + bytes(
                            int(v) for v in rows[y, x:j]
                        )
                        if lit & 1:
                            body += b"\x00"
                        x = j
                    else:
                        body += bytes((1, int(rows[y, x])))
                        x += 1
            body += b"\x00\x00"  # end of line
        body += b"\x00\x01"  # end of bitmap
        compression = 1
    data_off = 14 + 40 + len(pal)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 8, compression,
        len(body), 2835, 2835, 256, 0,
    )
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    return hdr + info + pal + bytes(body)


def synth_bmp(lum: np.ndarray) -> bytes:
    """24-bit bottom-up BI_RGB BMP with r=g=b=luma and padded rows."""
    h, w = lum.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            v = int(lum[y, x])
            row += bytes((v, v, v))  # BGR (equal channels)
        row += b"\x00" * (stride - len(row))
        body += row
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + info + bytes(body)


class _BitPacker:
    """LSB-first variable-width code packer (the GIF LZW bit order)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.bits
        self.bits += width
        while self.bits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.bits -= 8

    def flush(self) -> bytes:
        if self.bits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indexes: bytes, min_code: int) -> bytes:
    """Real GIF LZW compression (dictionary-building, not the
    literal-only 'uncompressed GIF' trick) — width grows exactly when
    the table reaches 2^width, mirroring the decoder, reset at 4096."""
    clear = 1 << min_code
    eoi = clear + 1
    pk = _BitPacker()

    def fresh():
        return {bytes((i,)): i for i in range(clear)}, clear + 2, min_code + 1

    table, next_code, width = fresh()
    pk.put(clear, width)
    w = b""
    for b in indexes:
        wk = w + bytes((b,))
        if wk in table:
            w = wk
            continue
        pk.put(table[w], width)
        table[wk] = next_code
        next_code += 1
        # the encoder's table is ONE entry ahead of the decoder's at
        # transmission time (the decoder appends on RECEIVING the next
        # code), so decoder-len >= 2^width ⇔ next_code > 2^width
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            pk.put(clear, width)
            table, next_code, width = fresh()
        w = bytes((b,))
    if w:
        pk.put(table[w], width)
    pk.put(eoi, width)
    return pk.flush()


def synth_gif(lum: np.ndarray) -> bytes:
    """Real GIF89a encoder for a (h, w) luma grid: 256-entry grayscale
    global color table, REAL LZW-compressed indexed pixels in ≤255-byte
    sub-blocks — the synthesis half of the GIF decode round-trip."""
    h, w = lum.shape
    hdr = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
    gct = bytes(v for i in range(256) for v in (i, i, i))
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = 8
    data = _lzw_encode(
        bytes(int(lum[y, x]) for y in range(h) for x in range(w)), min_code
    )
    blocks = bytearray([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return hdr + gct + img + bytes(blocks) + b"\x3b"


def synth_pnm(lum: np.ndarray, rgb: bool = False) -> bytes:
    h, w = lum.shape
    magic = b"P6" if rgb else b"P5"
    hdr = magic + f"\n{w} {h}\n255\n".encode()
    if rgb:
        return hdr + bytes(
            b for y in range(h) for x in range(w) for b in [int(lum[y, x])] * 3
        )
    return hdr + bytes(int(lum[y, x]) for y in range(h) for x in range(w))


def synth_image(doc_id: int, grid: int = 8) -> bytes:
    """Deterministic 8×8 image for doc_id: luma from _rt_luma, container
    format cycling through the full rotation so every decoder runs."""
    lum = np.array(
        [[_rt_luma(doc_id, y * grid + x) for x in range(grid)] for y in range(grid)],
        dtype=np.int64,
    )
    return _synth_in_format(lum, _RT_FORMATS[doc_id % len(_RT_FORMATS)])


def _synth_in_format(lum: np.ndarray, fmt: str) -> bytes:
    if fmt == "png_gray":
        return synth_png(lum, rgb=False)
    if fmt == "png_rgb":
        return synth_png(lum, rgb=True)
    if fmt == "bmp":
        return synth_bmp(lum)
    if fmt == "ppm":
        return synth_pnm(lum, rgb=True)
    if fmt == "gif":
        return synth_gif(lum)
    if fmt == "png16":
        return synth_png(lum, bit_depth=16)
    if fmt == "png_adam7":
        return synth_png(lum, rgb=True, interlace=True)
    if fmt == "bmp8":
        return synth_bmp8(lum)
    if fmt == "bmp8_rle":
        return synth_bmp8(lum, rle=True, top_down=True)
    if fmt.startswith("tiff_"):
        from danae_spark.multimodal.tiff import synth_tiff

        return synth_tiff(lum, fmt)
    if fmt == "webp":
        from danae_spark.multimodal.webp import synth_webp_still

        return synth_webp_still(lum)
    return synth_pnm(lum, rgb=False)


# --------------------------------------------------- oracle round-trip

PIXELS_SCHEMA = (
    "doc_id bigint, format string, width int, height int, channels int, "
    "pixel_sum bigint, ahash_lo bigint, ahash_hi bigint, dhash bigint"
)


def image_pixels_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable PIXEL round-trip: per document an 8×8 image with
    doc_id-derived luma is SYNTHESIZED byte-for-byte in one of five
    container formats (PNG gray/RGB with all five row filters applied,
    BMP 24-bit bottom-up, PPM, PGM), then DECODED back by the real
    stdlib decoders and perceptually hashed. The DuckDB oracle states
    luma, average-hash bits and dHash bits as pure doc_id arithmetic —
    any regression in encoder byte layout, inflate/unfilter logic, BMP
    row order, or hash definitions breaks the value hash."""
    from danae_spark.catalog import load_table
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payload = synth_image(d)
                px = decode_pixels(payload)
                if px is None:
                    rows.append(
                        {"doc_id": d, "format": None, "width": None,
                         "height": None, "channels": None, "pixel_sum": None,
                         "ahash_lo": None, "ahash_hi": None, "dhash": None}
                    )
                    continue
                lum = luma_grid(px)
                a = avg_hash_bits(lum)
                rows.append(
                    {
                        "doc_id": d,
                        "format": _RT_FORMATS[d % len(_RT_FORMATS)],
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "channels": px.shape[2],
                        "pixel_sum": int(lum.sum()),
                        "ahash_lo": a & 0xFFFFFFFF,
                        "ahash_hi": a >> 32,
                        "dhash": dhash_bits(lum),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "format", "width", "height", "channels",
                    "pixel_sum", "ahash_lo", "ahash_hi", "dhash",
                ],
            )
            rows = []

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=PIXELS_SCHEMA)
        .orderBy("doc_id")
    )


IMAGE_PIXELS_ORACLE = """
WITH g AS (
  SELECT d.doc_id, s.i, (d.doc_id * 31 + s.i * 7) % 256 AS p
  FROM documents d, generate_series(0, 63) s(i)
),
m AS (
  SELECT doc_id, CAST(sum(p) AS BIGINT) AS pixel_sum,
         CAST(sum(p) AS BIGINT) // 64 AS mean_p
  FROM g GROUP BY doc_id
),
a AS (
  SELECT g.doc_id,
         CAST(sum(CASE WHEN g.p > m.mean_p AND g.i < 32
                       THEN (CAST(1 AS BIGINT) << g.i) ELSE 0 END) AS BIGINT)
           AS ahash_lo,
         CAST(sum(CASE WHEN g.p > m.mean_p AND g.i >= 32
                       THEN (CAST(1 AS BIGINT) << (g.i - 32)) ELSE 0 END) AS BIGINT)
           AS ahash_hi
  FROM g JOIN m USING (doc_id) GROUP BY g.doc_id
),
d AS (
  SELECT l.doc_id,
         CAST(sum(CASE WHEN l.p < r.p
                       THEN (CAST(1 AS BIGINT) << ((l.i // 8) * 7 + (l.i % 8)))
                       ELSE 0 END) AS BIGINT) AS dhash
  FROM g l JOIN g r ON l.doc_id = r.doc_id AND r.i = l.i + 1
  WHERE l.i % 8 < 7
  GROUP BY l.doc_id
)
SELECT m.doc_id,
       __RT_FORMAT_CASE__ AS format,
       8 AS width, 8 AS height,
       __RT_CHANNELS_CASE__ AS channels,
       m.pixel_sum, a.ahash_lo, a.ahash_hi, d.dhash
FROM m JOIN a USING (doc_id) JOIN d USING (doc_id)
ORDER BY doc_id
"""


def _rt_format_cases_sql() -> tuple[str, str]:
    """Generate the format and channels CASEs from _RT_FORMATS /
    _RT_GRAY so the oracle's modulus, names and channel split can
    never drift from the Python rotation (the triage-oracle fix, r16,
    applied to the pixel roundtrip too)."""
    n = len(_RT_FORMATS)
    whens = " ".join(f"WHEN {i} THEN '{f}'" for i, f in enumerate(_RT_FORMATS))
    gray = ", ".join(str(i) for i, f in enumerate(_RT_FORMATS) if f in _RT_GRAY)
    return (
        f"CASE m.doc_id % {n} {whens} END",
        f"CASE WHEN m.doc_id % {n} IN ({gray}) THEN 1 ELSE 3 END",
    )


_fmt_case, _ch_case = _rt_format_cases_sql()
IMAGE_PIXELS_ORACLE = IMAGE_PIXELS_ORACLE.replace(
    "__RT_FORMAT_CASE__", _fmt_case
).replace("__RT_CHANNELS_CASE__", _ch_case)
assert "__RT_" not in IMAGE_PIXELS_ORACLE


# ------------------------------------------------- real-pixel near-dup

NEAR_DUP_VARIANTS = 4


def _cluster_luma(doc_id: int, i: int) -> int:
    """Cluster-structured luma: 4 consecutive doc_ids share a base image
    and differ by a single +1 pixel perturbation at a variant-specific
    position — so intra-cluster dHashes sit within a couple of bits and
    cross-cluster ones are far. QUADRATIC in the pixel index: a linear
    formula gives constant successive differences, which collapses
    nearly every base to the same gradient pattern (measured 112k
    degenerate pairs at 500 docs); the quadratic yields exactly the
    125×C(4,2)=750 intra-cluster pairs and nothing else. Mirrored
    verbatim in the SQL oracle."""
    base = doc_id // NEAR_DUP_VARIANTS
    bump = 1 if i == (doc_id % NEAR_DUP_VARIANTS) * 9 else 0
    return ((base + 1) * (i * i * 13 + i * 7) + base * base * 11 + bump) % 256


def synth_cluster_image(doc_id: int, grid: int = 8) -> bytes:
    lum = np.array(
        [[_cluster_luma(doc_id, y * grid + x) for x in range(grid)] for y in range(grid)],
        dtype=np.int64,
    )
    return _synth_in_format(lum, _RT_FORMATS[doc_id % len(_RT_FORMATS)])


NEAR_DUP_SCHEMA = "doc_id bigint, dhash bigint, decoded boolean"


def dhash_frame(payloads: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """payload → (doc_id, 56-bit dHash, decoded?) via the real decoders;
    undecodable payloads flag decoded=false with a byte-histogram
    fallback hash (the declared fake-encoder path) so the pipeline
    still covers every row."""
    sel = payloads.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None:
                    rows.append((int(doc_id), None, False))
                    continue
                px = decode_pixels(bytes(p))
                if px is not None:
                    rows.append((int(doc_id), dhash_bits(luma_grid(px)), True))
                else:
                    arr = np.frombuffer(bytes(p), dtype=np.uint8)
                    hist, _ = np.histogram(arr, bins=57, range=(0, 256))
                    med = float(np.median(hist))
                    bits = 0
                    for i in range(56):
                        if hist[i] > med:
                            bits |= 1 << i
                    rows.append((int(doc_id), bits, False))
            yield pd.DataFrame(rows, columns=["doc_id", "dhash", "decoded"])

    return sel.mapInPandas(run, schema=NEAR_DUP_SCHEMA)


# band_k auto-select crossover (docs): measured on diverse 56-bit hash
# corpora (uniform + planted twins) — N=200k k=1 wins 6.0 vs 7.5 s,
# N=500k k=2 wins 20.5 vs 47.4 s; the quadratic k=1 Σ bucket² regime
# takes over between those, so the switch point sits mid-interval.
BAND_K_AUTO_CROSSOVER = 300_000


def auto_band_k(n_docs: int) -> int:
    """The measured k=1 vs k=2 decision for a corpus of n_docs hashes."""
    return 2 if n_docs >= BAND_K_AUTO_CROSSOVER else 1


def image_near_dup(
    hashes: DataFrame,
    max_hamming: int = 6,
    n_bands: int | None = None,
    band_k: int | None = None,
    n_docs: int | None = None,
    n_bits: int = 56,
) -> DataFrame:
    """Near-dup pairs among dHashes with hamming ≤ max_hamming, via
    banded LSH for hamming space: split the 56 bits into `n_bands`
    bands — a pair with ≤ h differing bits touches at most h bands, so
    with n_bands ≥ h + band_k at least `band_k` bands match EXACTLY and
    some band_k-subset keys the pair into a common bucket (pigeonhole).
    Candidates come from C(n_bands, band_k) equi-joins (shuffle on the
    composite band value, no cross join) and the exact hamming check
    runs only inside buckets. n_bands defaults to max_hamming + band_k
    so the guarantee COVERS the requested radius (r7 advisor finding: a
    fixed 4 bands silently under-reported distance 4-6 pairs); an
    under-banded call is rejected rather than silently lossy.

    band_k is the SCALE knob (r8 census): with k=1 the key space is
    only n_bands·2^width (1,792 buckets at the default), so Σ bucket²
    — the verify-join cost — grows quadratically once the corpus
    dwarfs it. k=2 keys on PAIRS of bands (28 composite ~14-bit keys
    at h=6): identical output (completeness holds for n_bands ≥ h + k,
    verify filter unchanged) with a ~256× larger key space. Measured
    on a diverse-hash corpus (uniform 56-bit hashes + planted 2-bit
    twins — the realistic photo-corpus regime): N=200k k=1 6.0 s vs
    k=2 7.5 s (explode volume still dominates), N=500k k=1 47.4 s vs
    k=2 20.5 s — the quadratic k=1 term takes over between 2e5 and
    5e5 docs, so big corpora should pass band_k=2 (or shard first).

    r9: band_k=None (the default) AUTO-SELECTS at that measured
    crossover (BAND_K_AUTO_CROSSOVER docs) — a user no longer has to
    know the kwarg to stay off the quadratic regime. The corpus size
    comes from the `n_docs` caller hint when given, else one
    `hashes.count()` (NOTE: the count executes the upstream plan once —
    pass n_docs when hashes is an expensive unmaterialized decode
    pipeline, or an explicit band_k to skip sizing entirely). Output is
    k-invariant by construction (completeness holds for every k with
    n_bands ≥ h + k; the exact verify filter is unchanged) —
    pytest-pinned at both regimes. The registered oracle entry pins
    band_k=1 (its banding mirror), so registered plans and cost are
    unaffected."""
    if band_k is None:
        if n_docs is None:
            n_docs = hashes.count()
        band_k = auto_band_k(n_docs)
    if n_bands is None:
        n_bands = max_hamming + band_k
    if band_k < 1 or band_k > n_bands:
        raise ValueError(f"band_k must be in [1, n_bands], got {band_k}")
    if max_hamming > n_bands - band_k:
        raise ValueError(
            "banded hamming LSH is complete only for max_hamming <= "
            f"n_bands - band_k (got max_hamming={max_hamming}, "
            f"n_bands={n_bands}, band_k={band_k})"
        )
    # n_bits parameterizes the hash width (56 for image dHash, 63 for
    # the audio energy-gradient hash) — the pigeonhole guarantee and
    # the banding math are width-agnostic
    base, extra = divmod(n_bits, n_bands)
    widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]

    def band_val(b):
        return F.shiftright("dhash", offsets[b]).bitwiseAND(
            F.lit((1 << widths[b]) - 1)
        )

    from itertools import combinations

    combos = list(combinations(range(n_bands), band_k))
    keys = []
    for ci, combo in enumerate(combos):
        # composite value: concatenate the member bands' bits
        val = F.lit(0).cast("long")
        for b in combo:
            val = F.shiftleft(val, widths[b]).bitwiseOR(band_val(b))
        keys.append(F.struct(F.lit(ci).alias("band"), val.alias("val")))
    bands = hashes.select(
        "doc_id",
        "dhash",
        F.explode(F.array(*keys)).alias("bv"),
    ).select("doc_id", "dhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    # r17 (execution-only): the band frame feeds BOTH sides of the
    # candidate self-join; without the checkpoint the upstream hash
    # pipeline — for the roundtrip entries a full synth+decode
    # mapInPandas pass — executed twice (AQE's stage cache does not
    # unify the two aliased subtrees). The frame is a few longs per doc.
    bands = bands.localCheckpoint()
    a = bands.select(F.col("doc_id").alias("d1"), F.col("dhash").alias("h1"), "band", "val")
    b = bands.select(F.col("doc_id").alias("d2"), F.col("dhash").alias("h2"), "band", "val")
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("d1", "d2")
    )


def image_near_dup_roundtrip(
    spark: SparkSession, sf_dir: str, max_hamming: int = 6, n_bands: int | None = None
) -> DataFrame:
    """End-to-end REAL-pixel near-dup: per document a cluster-structured
    8×8 image is synthesized byte-for-byte (4 variants per base image,
    across all five container formats), decoded back by the real
    decoders, dHashed, and joined via banded hamming LSH. The DuckDB
    oracle recomputes the dHashes from the luma arithmetic and mirrors
    the banding (EXISTS a shared 8-bit band, 7 bands) plus the exact hamming
    filter — the whole decode→hash→candidate→verify pipeline is
    value-checked."""
    from danae_spark.catalog import load_table
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        synth_cluster_image(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    payloads = docs.repartition(stage_parallelism(docs.sparkSession), "doc_id").mapInPandas(
        synth, schema="doc_id bigint, payload binary"
    )
    # band_k=1 pinned: the registered oracle mirrors the k=1 banding and
    # the sf-lake is far below the auto crossover — pinning also avoids
    # an extra count() execution of the synth+decode pipeline.
    return image_near_dup(
        dhash_frame(payloads), max_hamming=max_hamming, n_bands=n_bands, band_k=1
    )


IMAGE_NEAR_DUP_ORACLE = """
WITH g AS (
  SELECT d.doc_id, s.i,
         ((CAST(d.doc_id // 4 AS BIGINT) + 1) * (s.i * s.i * 13 + s.i * 7)
          + CAST(d.doc_id // 4 AS BIGINT) * CAST(d.doc_id // 4 AS BIGINT) * 11
          + CASE WHEN s.i = (d.doc_id % 4) * 9 THEN 1 ELSE 0 END) % 256 AS p
  FROM documents d, generate_series(0, 63) s(i)
),
h AS (
  SELECT l.doc_id,
         CAST(sum(CASE WHEN l.p < r.p
                       THEN (CAST(1 AS BIGINT) << ((l.i // 8) * 7 + (l.i % 8)))
                       ELSE 0 END) AS BIGINT) AS dhash
  FROM g l JOIN g r ON l.doc_id = r.doc_id AND r.i = l.i + 1
  WHERE l.i % 8 < 7
  GROUP BY l.doc_id
)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
  AND EXISTS (
    SELECT 1 FROM generate_series(0, 6) t(band)
    WHERE ((a.dhash >> (band * 8)) & 255) = ((b.dhash >> (band * 8)) & 255)
  )
ORDER BY d1, d2
"""


# -------------------------------------------- JPEG oracle round-trip

def _jpeg_block_luma(doc_id: int, by: int, bx: int) -> int:
    """Block-constant luma in exact multiples of the DC quant step — the
    construction that makes a LOSSY codec round-trip exactly (every AC
    coefficient zero, DC quantizes without error). Mirrored in SQL."""
    return ((doc_id * 31 + (by * 2 + bx) * 37) % 16) * 16


def jpeg_pixels_roundtrip(
    spark: SparkSession, sf_dir: str, progressive: bool = False
) -> DataFrame:
    """Oracle-checkable BASELINE-JPEG round-trip: per document a 16×16
    image (four 8×8 blocks, block-constant luma in multiples of the DC
    quantization step) is encoded by the real spec-conformant encoder
    (multimodal/jpegcodec.synth_jpeg — FDCT, quantization, canonical
    Huffman tables carried in DHT, byte stuffing; grayscale and 4:4:4
    YCbCr alternating by doc_id) and decoded back by the real baseline
    decoder (marker walk, DHT/DQT load, Huffman entropy decode,
    differential DC, IDCT, color conversion). Block-constant + exact DC
    quantization ⇒ the reconstruction is EXACT, so the DuckDB oracle can
    state luma and both perceptual-hash bit patterns as pure doc_id
    arithmetic even though the codec is lossy."""
    from danae_spark.catalog import load_table
    from danae_spark.multimodal.jpegcodec import (
        decode_jpeg,
        synth_jpeg,
        synth_jpeg_progressive,
    )
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    prefix = "jpeg_prog" if progressive else "jpeg"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                blocks = np.array(
                    [[_jpeg_block_luma(d, by, bx) for bx in range(2)] for by in range(2)],
                    dtype=np.int64,
                )
                lum = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
                if progressive:
                    # d % 3 also exercises RSTn inside progressive scans
                    payload = synth_jpeg_progressive(
                        lum, color=bool(d % 2), restart_interval=d % 3
                    )
                else:
                    payload = synth_jpeg(lum, color=bool(d % 2))
                px = decode_jpeg(payload)
                ok = px is not None
                g = luma_grid(px) if ok else None
                a = avg_hash_bits(g) if ok else None
                rows.append(
                    {
                        "doc_id": d,
                        "fmt": f"{prefix}_color" if d % 2 else f"{prefix}_gray",
                        "width": px.shape[1] if ok else None,
                        "height": px.shape[0] if ok else None,
                        "channels": px.shape[2] if ok else None,
                        "pixel_sum": int(g.sum()) if ok else None,
                        "ahash_lo": (a & 0xFFFFFFFF) if ok else None,
                        "ahash_hi": (a >> 32) if ok else None,
                        "dhash": dhash_bits(g) if ok else None,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "fmt", "width", "height", "channels",
                         "pixel_sum", "ahash_lo", "ahash_hi", "dhash"],
            )
            rows = []

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(
            batches,
            schema=("doc_id bigint, fmt string, width int, height int, "
                    "channels int, pixel_sum bigint, ahash_lo bigint, "
                    "ahash_hi bigint, dhash bigint"),
        )
        .orderBy("doc_id")
    )


def _jpeg_oracle(prefix: str) -> str:
    return JPEG_PIXELS_ORACLE.replace("'jpeg_color'", f"'{prefix}_color'").replace(
        "'jpeg_gray'", f"'{prefix}_gray'"
    )


JPEG_PIXELS_ORACLE = """
WITH g AS (
  -- the 8x8 luma grid after block-mean resize: cell (i//8, i%8) sits in
  -- jpeg block ((i//8)//4, (i%8)//4)
  SELECT d.doc_id, s.i,
         ((d.doc_id * 31 + (((s.i // 8) // 4) * 2 + ((s.i % 8) // 4)) * 37)
          % 16) * 16 AS p
  FROM documents d, generate_series(0, 63) s(i)
),
m AS (
  SELECT doc_id, CAST(sum(p) AS BIGINT) AS pixel_sum,
         CAST(sum(p) AS BIGINT) // 64 AS mean_p
  FROM g GROUP BY doc_id
),
a AS (
  SELECT g.doc_id,
         CAST(sum(CASE WHEN g.p > m.mean_p AND g.i < 32
                       THEN (CAST(1 AS BIGINT) << g.i) ELSE 0 END) AS BIGINT)
           AS ahash_lo,
         CAST(sum(CASE WHEN g.p > m.mean_p AND g.i >= 32
                       THEN (CAST(1 AS BIGINT) << (g.i - 32)) ELSE 0 END) AS BIGINT)
           AS ahash_hi
  FROM g JOIN m USING (doc_id) GROUP BY g.doc_id
),
dh AS (
  SELECT l.doc_id,
         CAST(sum(CASE WHEN l.p < r.p
                       THEN (CAST(1 AS BIGINT) << ((l.i // 8) * 7 + (l.i % 8)))
                       ELSE 0 END) AS BIGINT) AS dhash
  FROM g l JOIN g r ON l.doc_id = r.doc_id AND r.i = l.i + 1
  WHERE l.i % 8 < 7
  GROUP BY l.doc_id
)
SELECT m.doc_id,
       CASE WHEN m.doc_id % 2 = 1 THEN 'jpeg_color' ELSE 'jpeg_gray' END AS fmt,
       16 AS width, 16 AS height,
       CASE WHEN m.doc_id % 2 = 1 THEN 3 ELSE 1 END AS channels,
       m.pixel_sum, a.ahash_lo, a.ahash_hi, dh.dhash
FROM m JOIN a USING (doc_id) JOIN dh USING (doc_id)
ORDER BY doc_id
"""


# ----------------------------------------------- WAV PCM sample decode

def decode_wav_samples(payload: bytes) -> tuple[np.ndarray, int] | None:
    """Decode PCM WAV to ((n_samples, channels) int32 array,
    sample_rate) at every integer PCM depth — 8-bit (unsigned, shifted
    to signed), 16/32-bit (LE signed), and 24-bit (LE signed,
    sign-extended from 3-byte frames). Audio SAMPLES need no codec
    library — this extends 'decode for real' beyond the header triad
    to the waveform itself. None for non-PCM/compressed payloads."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    fmt = None
    data = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        csize = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= n:
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[i + 8 : i + 24]
            )
            if audio_fmt != 1 or bits not in (8, 16, 24, 32) or channels < 1:
                return None  # non-PCM / non-integer-PCM out of subset
            # Header self-consistency: block_align and byte_rate are
            # redundant with channels×bits — a mismatch means a corrupt
            # or hand-patched header, and reinterpreting the data bytes
            # at the claimed depth would produce garbage samples.
            if _ba != channels * (bits // 8) or _br != rate * _ba:
                return None
            fmt = (channels, rate, bits)
        elif cid == b"data":
            data = payload[i + 8 : i + 8 + csize]
        i += 8 + csize + (csize % 2)
    if fmt is None or data is None:
        return None
    channels, rate, bits = fmt
    bysam = bits // 8
    usable = len(data) - (len(data) % (bysam * channels))
    if usable <= 0:
        return None
    if bits == 8:
        samples = (
            np.frombuffer(data, dtype=np.uint8, count=usable).astype(np.int32)
            - 128
        )
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2", count=usable // 2).astype(
            np.int32
        )
    elif bits == 32:
        samples = np.frombuffer(data, dtype="<i4", count=usable // 4).astype(
            np.int32
        )
    else:  # 24-bit: sign-extend 3-byte LE frames
        tri = np.frombuffer(data, dtype=np.uint8, count=usable).reshape(-1, 3)
        samples = (
            tri[:, 0].astype(np.int32)
            | (tri[:, 1].astype(np.int32) << 8)
            | (tri[:, 2].astype(np.int32) << 16)
        )
        samples = np.where(samples & 0x800000, samples - (1 << 24), samples)
    return samples.reshape(-1, channels), rate


AUDIO_FP_BLOCKS = 64
AUDIO_FP_BLOCK_SAMPLES = 16


def audio_energy_fingerprint(samples: np.ndarray) -> tuple[int, int]:
    """(total energy, 63-bit block-energy gradient hash) over channel 0:
    bit b set iff energy(block b) < energy(block b+1) — the audio
    analogue of dHash, integer-exact so a SQL oracle can restate it."""
    ch0 = samples[:, 0].astype(np.int64)
    nb = min(AUDIO_FP_BLOCKS, len(ch0) // AUDIO_FP_BLOCK_SAMPLES)
    energies = [
        int((ch0[b * AUDIO_FP_BLOCK_SAMPLES : (b + 1) * AUDIO_FP_BLOCK_SAMPLES] ** 2).sum())
        for b in range(nb)
    ]
    total = int((samples.astype(np.int64) ** 2).sum())
    bits = 0
    for b in range(nb - 1):
        if energies[b] < energies[b + 1]:
            bits |= 1 << b
    return total, bits


def _pcm_sample(doc_id: int, i: int, c: int) -> int:
    """Deterministic 16-bit sample value — quadratic in the sample index
    so block energies vary; mirrored verbatim in the SQL oracle."""
    return ((doc_id * 7 + i * i * 3 + c * 13) % 2048) - 1024


def synth_wav(samples: np.ndarray, rate: int = 8000, bits: int = 16) -> bytes:
    """PCM WAV from an (n, channels) int array at any integer depth —
    8 (unsigned), 16/32 (LE signed), 24 (3-byte LE signed) — fixtures
    for the depth-generalized decoder."""
    if samples.ndim != 2:
        raise ValueError("samples must be (n, channels)")
    n, channels = samples.shape
    bysam = bits // 8
    frames = bytearray()
    for i in range(n):
        for c in range(channels):
            v = int(samples[i, c])
            if bits == 8:
                frames.append((v + 128) & 0xFF)
            elif bits == 16:
                frames += struct.pack("<h", v)
            elif bits == 24:
                frames += (v & 0xFFFFFF).to_bytes(3, "little")
            elif bits == 32:
                frames += struct.pack("<i", v)
            else:
                raise ValueError("bits must be 8/16/24/32")
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * bysam,
        channels * bysam, bits,
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + bytes(frames)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def synth_wav_pcm(doc_id: int, n_samples: int = 1024) -> bytes:
    """Real 16-bit PCM WAV (RIFF + fmt + interleaved LE data) with
    doc_id-derived samples; 1 or 2 channels by doc parity."""
    channels = 1 + (doc_id % 2)
    rate = 8000 + (doc_id % 8) * 1000
    frames = bytearray()
    for i in range(n_samples):
        for c in range(channels):
            frames += struct.pack("<h", _pcm_sample(doc_id, i, c))
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + bytes(frames)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def audio_pcm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable PCM round-trip: per document a 16-bit WAV with
    doc_id-derived samples (mono/stereo alternating) is synthesized
    byte-for-byte, decoded back by the real PCM reader (RIFF walk,
    little-endian int16, channel de-interleave), and fingerprinted
    (total energy + block-energy gradient hash). The DuckDB oracle
    restates samples, energies and hash bits as pure integer
    arithmetic — any regression in byte packing, chunk walking, or
    de-interleaving breaks the value hash."""
    from danae_spark.catalog import load_table
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                decoded = decode_wav_samples(synth_wav_pcm(d))
                if decoded is None:
                    rows.append({"doc_id": d, "sample_rate": None,
                                 "channels": None, "n_samples": None,
                                 "energy_sum": None, "grad_hash": None})
                    continue
                samples, rate = decoded
                total, bits = audio_energy_fingerprint(samples)
                rows.append(
                    {
                        "doc_id": d,
                        "sample_rate": rate,
                        "channels": samples.shape[1],
                        "n_samples": samples.shape[0],
                        "energy_sum": total,
                        "grad_hash": bits,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "channels", "n_samples",
                         "energy_sum", "grad_hash"],
            )
            rows = []

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(
            batches,
            schema=("doc_id bigint, sample_rate int, channels int, "
                    "n_samples int, energy_sum bigint, grad_hash bigint"),
        )
        .orderBy("doc_id")
    )


AUDIO_PCM_ORACLE = """
WITH s AS (
  SELECT d.doc_id, g.i, c.c,
         (d.doc_id * 7 + g.i * g.i * 3 + c.c * 13) % 2048 - 1024 AS v
  FROM documents d,
       generate_series(0, 1023) g(i),
       generate_series(0, 1) c(c)
  WHERE c.c < 1 + (d.doc_id % 2)
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
SELECT t.doc_id,
       CAST(8000 + (t.doc_id % 8) * 1000 AS INT) AS sample_rate,
       CAST(1 + (t.doc_id % 2) AS INT) AS channels,
       1024 AS n_samples,
       t.energy_sum, gh.grad_hash
FROM tot t JOIN gh USING (doc_id)
ORDER BY doc_id
"""


# ------------------------------------------------ audio near-duplicates


def _cluster_audio_sample(doc_id: int, i: int) -> int:
    """Cluster-structured mono samples: 4 consecutive doc_ids share a
    base waveform (quadratic in the sample index, like _cluster_luma —
    a linear form collapses gradient patterns) and differ by a +50
    perturbation applied to one variant-specific 16-sample block, which
    moves at most the two gradient comparisons touching that block.
    Mirrored verbatim in the SQL oracle."""
    base = doc_id // NEAR_DUP_VARIANTS
    bump = 50 if i // AUDIO_FP_BLOCK_SAMPLES == (doc_id % NEAR_DUP_VARIANTS) * 3 else 0
    return ((base + 1) * (i * i * 3 + i * 7) + base * base * 11 + bump) % 2048 - 1024


def synth_cluster_audio(doc_id: int, n_samples: int = 1024) -> bytes:
    """The cluster waveform in a REAL container — WAV on even docs,
    FLAC on odd — so the near-dup pipeline exercises both decoders and
    demonstrates container-invariance of the fingerprint (FLAC is
    lossless, so both decode to identical PCM)."""
    arr = np.array(
        [[_cluster_audio_sample(doc_id, i)] for i in range(n_samples)], dtype=np.int64
    )
    if doc_id % 2 == 0:
        return synth_wav(arr, rate=8000, bits=16)
    from danae_spark.multimodal.flac import synth_flac

    return synth_flac(arr, rate=8000, bits=16, seed=doc_id)


def audio_fp_frame(
    payloads: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """payload → (doc_id, 63-bit energy-gradient hash, decoded?) via the
    real WAV/FLAC decoders (dispatch on magic); undecodable payloads
    flag decoded=false with the byte-histogram fallback, mirroring
    dhash_frame's contract. The hash column is named `dhash` so the
    banded-LSH join (image_near_dup, width-parameterized) applies
    as-is."""
    from danae_spark.multimodal.flac import decode_flac

    sel = payloads.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None:
                    rows.append((int(doc_id), None, False))
                    continue
                raw = bytes(p)
                decoded = (
                    decode_wav_samples(raw)
                    if raw[:4] == b"RIFF"
                    else decode_flac(raw) if raw[:4] == b"fLaC" else None
                )
                if decoded is not None:
                    _total, bits = audio_energy_fingerprint(decoded[0])
                    rows.append((int(doc_id), bits, True))
                else:
                    arr = np.frombuffer(raw, dtype=np.uint8)
                    hist, _ = np.histogram(arr, bins=64, range=(0, 256))
                    med = float(np.median(hist))
                    bits = 0
                    for i in range(63):
                        if hist[i] > med:
                            bits |= 1 << i
                    rows.append((int(doc_id), bits, False))
            yield pd.DataFrame(rows, columns=["doc_id", "dhash", "decoded"])

    return sel.mapInPandas(run, schema=NEAR_DUP_SCHEMA)


def audio_near_dup_roundtrip(
    spark: SparkSession, sf_dir: str, max_hamming: int = 6
) -> DataFrame:
    """End-to-end REAL-audio near-dup: per document a cluster-structured
    waveform is encoded byte-for-byte into a real container (WAV/FLAC
    alternating), decoded back by the real PCM decoders, fingerprinted
    with the 63-bit block-energy gradient hash, and joined via the same
    banded hamming LSH as the image path (7 bands of 9 bits, pigeonhole
    completeness at radius 6). The DuckDB oracle recomputes the
    fingerprints from the sample arithmetic and mirrors banding +
    verify — the whole decode→fingerprint→candidate→verify pipeline is
    value-checked across two container formats."""
    from danae_spark.catalog import load_table
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        synth_cluster_audio(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    payloads = docs.repartition(
        stage_parallelism(docs.sparkSession), "doc_id"
    ).mapInPandas(synth, schema="doc_id bigint, payload binary")
    # band_k=1 pinned like the image mirror: the oracle restates the
    # k=1 banding and sf lakes sit far below the auto crossover
    return image_near_dup(
        audio_fp_frame(payloads),
        max_hamming=max_hamming,
        band_k=1,
        n_bits=63,
    )


AUDIO_NEAR_DUP_ORACLE = """
WITH s AS (
  SELECT d.doc_id, g.i,
         ((CAST(d.doc_id // 4 AS BIGINT) + 1) * (g.i * g.i * 3 + g.i * 7)
          + CAST(d.doc_id // 4 AS BIGINT) * CAST(d.doc_id // 4 AS BIGINT) * 11
          + CASE WHEN g.i // 16 = (d.doc_id % 4) * 3 THEN 50 ELSE 0 END)
           % 2048 - 1024 AS v
  FROM documents d, generate_series(0, 1023) g(i)
),
blk AS (
  SELECT doc_id, i // 16 AS b,
         CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS e
  FROM s GROUP BY doc_id, i // 16
),
h AS (
  SELECT l.doc_id,
         CAST(coalesce(sum(CASE WHEN l.e < r.e
                       THEN (CAST(1 AS BIGINT) << l.b) ELSE 0 END), 0) AS BIGINT)
           AS ahash
  FROM blk l JOIN blk r ON l.doc_id = r.doc_id AND r.b = l.b + 1
  GROUP BY l.doc_id
)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= 6
  AND EXISTS (
    SELECT 1 FROM generate_series(0, 6) t(band)
    WHERE ((a.ahash >> (band * 9)) & 511) = ((b.ahash >> (band * 9)) & 511)
  )
ORDER BY d1, d2
"""
