"""RFC 8878 (zstandard) frame codec — the Raw/RLE-block subset.

The sibling of brotlistream.py: `Content-Encoding: zstd` is the other
modern coding Common Crawl responses ship, and until r14 the engine
rejected it wholesale and invisibly. This module implements the FRAME
layer of the RFC: the magic number, the frame-header descriptor
(Frame_Content_Size field in all four widths, Single_Segment,
Dictionary_ID in all widths, the reserved-bit reject), Raw and RLE
blocks (the block ladder's 3-byte little-endian headers), skippable
frames (magic 0x184D2A50..5F), and the optional content checksum —
verified for real with a from-spec XXH64 implementation, not skipped.
Compressed blocks (FSE/Huffman sequences) return None HERE; since r15
the FULL decoder lives in multimodal/zstdcodec.py and is what the
crawl surface wires in — this module remains the frame layer, the
XXH64 implementation, and the stored-mode ENCODER for the synth
rotation.

Raw/RLE frames are what `zstd --format=zstd -0`-class encoders emit
for incompressible payloads, and the frame layer is where truncation,
trailing garbage, and checksum mismatches are detected. The paired
encoder (`zstd_store`) emits spec-valid Raw-block frames (checksummed)
for the synth rotation, so the decode path runs on every oracle sweep.
"""

from __future__ import annotations

_MAGIC = 0xFD2FB528
_SKIP_LO = 0x184D2A50
_SKIP_HI = 0x184D2A5F

_PRIME1 = 0x9E3779B185EBCA87
_PRIME2 = 0xC2B2AE3D27D4EB4F
_PRIME3 = 0x165667B19E3779F9
_PRIME4 = 0x85EBCA77C2B2AE63
_PRIME5 = 0x27D4EB2F165667C5
_MASK = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 (the public xxHash spec) — zstd's content checksum."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _PRIME1 + _PRIME2) & _MASK
        v2 = (seed + _PRIME2) & _MASK
        v3 = seed
        v4 = (seed - _PRIME1) & _MASK
        while pos + 32 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[pos + 8 * i : pos + 8 * i + 8], "little")
                v = (v + lane * _PRIME2) & _MASK
                v = (_rotl(v, 31) * _PRIME1) & _MASK
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            v = (_rotl((v * _PRIME2) & _MASK, 31) * _PRIME1) & _MASK
            h = (((h ^ v) * _PRIME1) + _PRIME4) & _MASK
    else:
        h = (seed + _PRIME5) & _MASK
    h = (h + n) & _MASK
    while pos + 8 <= n:
        lane = int.from_bytes(data[pos : pos + 8], "little")
        k = (_rotl((lane * _PRIME2) & _MASK, 31) * _PRIME1) & _MASK
        h = ((_rotl(h ^ k, 27) * _PRIME1) + _PRIME4) & _MASK
        pos += 8
    if pos + 4 <= n:
        lane = int.from_bytes(data[pos : pos + 4], "little")
        h = ((_rotl(h ^ ((lane * _PRIME1) & _MASK), 23) * _PRIME2) + _PRIME3) & _MASK
        pos += 4
    while pos < n:
        h = ((_rotl(h ^ ((data[pos] * _PRIME5) & _MASK), 11) * _PRIME1)) & _MASK
        pos += 1
    h ^= h >> 33
    h = (h * _PRIME2) & _MASK
    h ^= h >> 29
    h = (h * _PRIME3) & _MASK
    h ^= h >> 32
    return h


def _decode_frame(data: bytes, pos: int) -> tuple[bytes, int] | None:
    """Decode ONE zstd frame at `pos`; (content, next_pos) or None."""
    if pos + 4 > len(data):
        return None
    magic = int.from_bytes(data[pos : pos + 4], "little")
    pos += 4
    if _SKIP_LO <= magic <= _SKIP_HI:
        if pos + 4 > len(data):
            return None
        skip = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if pos + skip > len(data):
            return None
        return b"", pos + skip
    if magic != _MAGIC:
        return None
    if pos >= len(data):
        return None
    desc = data[pos]
    pos += 1
    fcs_flag = desc >> 6
    single_segment = (desc >> 5) & 1
    if (desc >> 3) & 1:
        return None  # reserved bit set: invalid frame
    has_checksum = (desc >> 2) & 1
    did_flag = desc & 3
    if not single_segment:
        if pos >= len(data):
            return None
        wd = data[pos]
        pos += 1
        if wd >> 3 > 31:  # Window_Log > 41 is out of spec range
            return None
    did_size = (0, 1, 2, 4)[did_flag]
    pos += did_size  # dictionary id (value unused: no dict support needed
    # for Raw/RLE blocks, which reference no history)
    fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    fcs = None
    if fcs_size:
        if pos + fcs_size > len(data):
            return None
        fcs = int.from_bytes(data[pos : pos + fcs_size], "little")
        if fcs_size == 2:
            fcs += 256
        pos += fcs_size
    out = bytearray()
    while True:
        if pos + 3 > len(data):
            return None
        hdr = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last = hdr & 1
        btype = (hdr >> 1) & 3
        bsize = hdr >> 3
        if btype == 0:  # Raw
            if pos + bsize > len(data):
                return None
            out += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE: one byte, repeated Block_Size times
            if pos >= len(data):
                return None
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:
            return None  # compressed block: unsupported, reject-whole
        else:
            return None  # reserved block type
        if last:
            break
    if fcs is not None and fcs != len(out):
        return None  # frame lied about its content size
    if has_checksum:
        if pos + 4 > len(data):
            return None
        want = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if want != (xxh64(bytes(out)) & 0xFFFFFFFF):
            return None  # checksum mismatch: corruption
    return bytes(out), pos


def zstd_stored_decode(payload: bytes) -> bytes | None:
    """Decode a zstd payload whose frames contain only Raw/RLE blocks
    (skippable frames allowed). None on: truncation, a compressed or
    reserved block, a reserved descriptor bit, a content-size or
    checksum mismatch, or trailing garbage."""
    out = bytearray()
    pos = 0
    got_frame = False
    while pos < len(payload):
        dec = _decode_frame(payload, pos)
        if dec is None:
            return None
        chunk, pos = dec
        out += chunk
        got_frame = True
    return bytes(out) if got_frame else None


def zstd_store(data: bytes, block: int = 65536, checksum: bool = True) -> bytes:
    """Encode `data` as one spec-valid zstd frame of Raw blocks with
    an explicit 8-byte Frame_Content_Size and (by default) a real
    XXH64 content checksum — decodable by any conformant zstd decoder
    and by zstd_stored_decode above."""
    out = bytearray()
    out += _MAGIC.to_bytes(4, "little")
    # descriptor: FCS_flag=3 (8 bytes), single_segment=0, checksum per
    # arg, no dictionary id
    out.append((3 << 6) | ((1 if checksum else 0) << 2))
    out.append(20 << 3)  # window descriptor: Window_Log = 20, mantissa 0
    out += len(data).to_bytes(8, "little")
    pieces = [data[i : i + block] for i in range(0, len(data), block)] or [b""]
    for i, piece in enumerate(pieces):
        last = 1 if i == len(pieces) - 1 else 0
        hdr = last | (0 << 1) | (len(piece) << 3)
        out += hdr.to_bytes(3, "little")
        out += piece
    if checksum:
        out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)
