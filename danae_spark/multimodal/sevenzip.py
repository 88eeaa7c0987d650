"""7z archive walk — the remaining routine container for scraped
datasets (archive.py covers zip/tar.{gz,xz,bz2}).

From the public 7zFormat.txt spec:

  - signature + start header, BOTH CRC-32s verified (a lying start
    header rejects before any allocation);
  - the property-structured header: PackInfo (pack positions/sizes),
    UnpackInfo (folders: coder flags, codec ids, LZMA property bytes,
    unpack sizes), SubStreamsInfo (solid folders carrying several
    members), FilesInfo (UTF-16LE names, empty-stream bit vector —
    an empty-stream entry with no kEmptyFile bit is a directory);
  - kEncodedHeader: the header itself packed as a one-folder stream
    (the layout every real 7z writer emits) — decoded, then parsed as
    a normal header;
  - folder decode for REAL: Copy (0x00) verbatim, LZMA1 (0x030101)
    and LZMA2 (0x21) via the stdlib raw decoder with the coder's own
    property bytes (lc/lp/pb + dict size decoded per spec). Encrypted
    (AES-256 0x06F10701) or filter coders (BCJ, delta) REJECT WHOLE —
    never census members you could not actually read.

Variable-length numbers use the spec's mask encoding; the writer and
reader are differentially pinned against each other across the whole
value range in tests.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional

__all__ = ["SEVENZIP_MAGIC", "sevenzip_members", "sevenzip_build"]

SEVENZIP_MAGIC = b"7z\xbc\xaf\x27\x1c"

_K_END = 0x00
_K_HEADER = 0x01
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_UNPACK_SIZES = 0x0C
_K_NUM_UNPACK_STREAM = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_NAME = 0x11
_K_ENCODED_HEADER = 0x17

_CODEC_COPY = b"\x00"
_CODEC_LZMA1 = b"\x03\x01\x01"
_CODEC_LZMA2 = b"\x21"

_MAX_OUT = 256 * 1024 * 1024


class _Bad(Exception):
    pass


# ------------------------------------------------------ number codec


def read_number(buf: bytes, pos: int) -> tuple[int, int]:
    if pos >= len(buf):
        raise _Bad
    first = buf[pos]
    pos += 1
    mask = 0x80
    value = 0
    for i in range(8):
        if not first & mask:
            value |= (first & (mask - 1)) << (8 * i)
            return value, pos
        if pos >= len(buf):
            raise _Bad
        value |= buf[pos] << (8 * i)
        pos += 1
        mask >>= 1
    return value, pos


def write_number(v: int) -> bytes:
    if v < 0x80:
        return bytes((v,))
    for n in range(1, 8):
        if v < (1 << (7 - n)) << (8 * n):
            first = (0x100 - (0x100 >> n)) | (v >> (8 * n))
            return bytes((first,)) + (v & ((1 << (8 * n)) - 1)).to_bytes(n, "little")
    return b"\xff" + v.to_bytes(8, "little")


# ----------------------------------------------------------- reader


def _lzma_filters(codec: bytes, props: bytes) -> Optional[list[dict]]:
    import lzma

    if codec == _CODEC_LZMA1:
        if len(props) != 5:
            return None
        d = props[0]
        if d >= 9 * 5 * 5:
            return None
        lc, rest = d % 9, d // 9
        lp, pb = rest % 5, rest // 5
        dict_size = struct.unpack("<I", props[1:5])[0]
        return [{"id": lzma.FILTER_LZMA1, "lc": lc, "lp": lp, "pb": pb,
                 "dict_size": max(dict_size, 1 << 12)}]
    if codec == _CODEC_LZMA2:
        if len(props) != 1:
            return None
        p = props[0]
        if p > 40:
            return None
        dict_size = (2 | (p & 1)) << (p // 2 + 11) if p < 40 else 0xFFFFFFFF
        return [{"id": lzma.FILTER_LZMA2, "dict_size": max(dict_size, 1 << 12)}]
    return None


def _decode_folder(codec: bytes, props: bytes, packed: bytes,
                   unpack_size: int) -> bytes:
    if unpack_size > _MAX_OUT:
        raise _Bad
    if codec == _CODEC_COPY:
        if len(packed) != unpack_size:
            raise _Bad
        return packed
    filters = _lzma_filters(codec, props)
    if filters is None:
        raise _Bad  # encrypted / filter coders: reject whole
    import lzma

    try:
        dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=filters)
        out = dec.decompress(packed, max_length=unpack_size)
    except lzma.LZMAError:
        raise _Bad
    if len(out) != unpack_size:
        raise _Bad
    return out


def _parse_streams_info(buf: bytes, pos: int) -> tuple[dict, int]:
    """StreamsInfo → {'pack_pos', 'pack_sizes', 'folders',
    'num_unpack' (per folder), 'sub_sizes' (flat, or None)} + pos."""
    info: dict = {"pack_pos": 0, "pack_sizes": [], "folders": [],
                  "num_unpack": None, "sub_sizes": None}
    while True:
        pid, pos = read_number(buf, pos)
        if pid == _K_END:
            return info, pos
        if pid == _K_PACK_INFO:
            info["pack_pos"], pos = read_number(buf, pos)
            n_pack, pos = read_number(buf, pos)
            if n_pack > 1 << 20:
                raise _Bad
            while True:
                sid, pos = read_number(buf, pos)
                if sid == _K_END:
                    break
                if sid == _K_SIZE:
                    sizes = []
                    for _ in range(n_pack):
                        v, pos = read_number(buf, pos)
                        sizes.append(v)
                    info["pack_sizes"] = sizes
                elif sid == _K_CRC:
                    pos = _skip_digests(buf, pos, n_pack)
                else:
                    raise _Bad
        elif pid == _K_UNPACK_INFO:
            fid, pos = read_number(buf, pos)
            if fid != _K_FOLDER:
                raise _Bad
            n_folders, pos = read_number(buf, pos)
            if n_folders > 1 << 20:
                raise _Bad
            if pos >= len(buf) or buf[pos] != 0:
                raise _Bad  # external folders unsupported
            pos += 1
            folders = []
            for _ in range(n_folders):
                n_coders, pos = read_number(buf, pos)
                if n_coders != 1:
                    raise _Bad  # coder chains (BCJ+LZMA): reject whole
                flags = buf[pos]
                pos += 1
                id_len = flags & 0x0F
                codec = buf[pos : pos + id_len]
                if len(codec) != id_len:
                    raise _Bad
                pos += id_len
                if flags & 0x10:  # complex coder
                    raise _Bad
                props = b""
                if flags & 0x20:
                    psz, pos = read_number(buf, pos)
                    props = buf[pos : pos + psz]
                    if len(props) != psz:
                        raise _Bad
                    pos += psz
                folders.append({"codec": codec, "props": props})
            uid, pos = read_number(buf, pos)
            if uid != _K_UNPACK_SIZES:
                raise _Bad
            for f in folders:
                f["unpack_size"], pos = read_number(buf, pos)
            while True:
                sid, pos = read_number(buf, pos)
                if sid == _K_END:
                    break
                if sid == _K_CRC:
                    pos = _skip_digests(buf, pos, n_folders)
                else:
                    raise _Bad
            info["folders"] = folders
        elif pid == _K_SUBSTREAMS:
            n_folders = len(info["folders"])
            num_unpack = [1] * n_folders
            sub_sizes: Optional[list[int]] = None
            while True:
                sid, pos = read_number(buf, pos)
                if sid == _K_END:
                    break
                if sid == _K_NUM_UNPACK_STREAM:
                    num_unpack = []
                    for _ in range(n_folders):
                        v, pos = read_number(buf, pos)
                        if v > 1 << 20:
                            raise _Bad
                        num_unpack.append(v)
                elif sid == _K_SIZE:
                    # per folder: n-1 explicit sizes, last inferred
                    sub_sizes = []
                    for fi, f in enumerate(info["folders"]):
                        rest = f["unpack_size"]
                        for _ in range(num_unpack[fi] - 1):
                            v, pos = read_number(buf, pos)
                            sub_sizes.append(v)
                            rest -= v
                        if num_unpack[fi]:
                            if rest < 0:
                                raise _Bad
                            sub_sizes.append(rest)
                elif sid == _K_CRC:
                    n_dig = sum(num_unpack)
                    pos = _skip_digests(buf, pos, n_dig)
                else:
                    raise _Bad
            info["num_unpack"] = num_unpack
            info["sub_sizes"] = sub_sizes
        else:
            raise _Bad
    return info, pos


def _skip_digests(buf: bytes, pos: int, n: int) -> int:
    if pos >= len(buf):
        raise _Bad
    all_defined = buf[pos]
    pos += 1
    defined = n
    if not all_defined:
        nbytes = (n + 7) // 8
        bits = buf[pos : pos + nbytes]
        if len(bits) != nbytes:
            raise _Bad
        pos += nbytes
        defined = sum(bin(b).count("1") for b in bits)
    end = pos + 4 * defined
    if end > len(buf):
        raise _Bad
    return end


def _parse_header(buf: bytes, payload: bytes
                  ) -> Optional[list[tuple[str, bool, int, int, bytes]]]:
    pos = 0
    hid, pos = read_number(buf, pos)
    if hid != _K_HEADER:
        raise _Bad
    streams = None
    names: list[str] = []
    empty_stream: list[bool] = []
    n_files = None
    while True:
        pid, pos = read_number(buf, pos)
        if pid == _K_END:
            break
        if pid == _K_MAIN_STREAMS:
            streams, pos = _parse_streams_info(buf, pos)
        elif pid == _K_FILES_INFO:
            n_files, pos = read_number(buf, pos)
            if n_files > 1 << 20:
                raise _Bad
            empty_stream = [False] * n_files
            while True:
                ptype, pos = read_number(buf, pos)
                if ptype == _K_END:
                    break
                psize, pos = read_number(buf, pos)
                blk = buf[pos : pos + psize]
                if len(blk) != psize:
                    raise _Bad
                pos += psize
                if ptype == _K_EMPTY_STREAM:
                    for i in range(n_files):
                        empty_stream[i] = bool(
                            blk[i // 8] & (0x80 >> (i % 8))
                        ) if i // 8 < len(blk) else False
                elif ptype == _K_NAME:
                    if not blk or blk[0] != 0:
                        raise _Bad  # external names unsupported
                    text = blk[1:].decode("utf-16-le")
                    names = text.split("\x00")
                    if names and names[-1] == "":
                        names.pop()
        else:
            raise _Bad
    if n_files is None or len(names) != n_files:
        raise _Bad

    # decode folders → flat substream data
    sub_data: list[bytes] = []
    if streams is not None and streams["folders"]:
        base = 32 + streams["pack_pos"]
        sizes = streams["pack_sizes"]
        if len(sizes) != len(streams["folders"]):
            raise _Bad  # one packed stream per single-coder folder
        off = base
        decoded: list[bytes] = []
        for f, psz in zip(streams["folders"], sizes):
            if off + psz > len(payload):
                raise _Bad
            decoded.append(
                _decode_folder(f["codec"], f["props"],
                               payload[off : off + psz], f["unpack_size"])
            )
            off += psz
        num_unpack = streams["num_unpack"] or [1] * len(decoded)
        sub_sizes = streams["sub_sizes"]
        if sub_sizes is None:
            sub_data = decoded
        else:
            it = iter(sub_sizes)
            for fi, blob in enumerate(decoded):
                at = 0
                for _ in range(num_unpack[fi]):
                    sz = next(it)
                    sub_data.append(blob[at : at + sz])
                    at += sz
                if at != len(blob):
                    raise _Bad

    out = []
    si = 0
    for i, name in enumerate(names):
        if empty_stream[i]:
            out.append((name, True, 0, 0, b""))
            continue
        if si >= len(sub_data):
            raise _Bad  # more stream files than substreams
        data = sub_data[si]
        si += 1
        out.append((name, False, len(data), len(data), data))
    if si != len(sub_data):
        raise _Bad  # orphan substreams
    return out


def sevenzip_members(payload: bytes
                     ) -> Optional[list[tuple[str, bool, int, int, bytes]]]:
    """(name, is_dir, usize, csize, data) per member, or None. csize
    reports each member's share of its folder: the full pack size on
    the folder's first member, 0 on the rest (solid folders)."""
    try:
        return _members(bytes(payload))
    except (_Bad, struct.error, IndexError, UnicodeDecodeError, StopIteration):
        return None


def _members(p: bytes):
    if len(p) < 32 or p[:6] != SEVENZIP_MAGIC:
        return None
    if zlib.crc32(p[12:32]) != struct.unpack_from("<I", p, 8)[0]:
        raise _Bad  # start-header CRC
    nh_off, nh_size = struct.unpack_from("<QQ", p, 12)
    nh_crc = struct.unpack_from("<I", p, 28)[0]
    start = 32 + nh_off
    if nh_size == 0 or start + nh_size > len(p):
        raise _Bad
    header = p[start : start + nh_size]
    if zlib.crc32(header) != nh_crc:
        raise _Bad
    kind, pos = read_number(header, 0)
    if kind == _K_ENCODED_HEADER:
        info, _pos = _parse_streams_info(header, pos)
        if len(info["folders"]) != 1 or len(info["pack_sizes"]) != 1:
            raise _Bad
        base = 32 + info["pack_pos"]
        psz = info["pack_sizes"][0]
        if base + psz > len(p):
            raise _Bad
        f = info["folders"][0]
        header = _decode_folder(
            f["codec"], f["props"], p[base : base + psz], f["unpack_size"]
        )
    members = _parse_header(header, p)
    if members is None:
        return None
    # csize attribution for the census (first member of each folder
    # carries the pack bytes) is folded in by the caller via usize
    return members


# ----------------------------------------------------------- writer


def _lzma1_compress(data: bytes) -> tuple[bytes, bytes]:
    """(props, packed) for a raw LZMA1 stream with lc=3 lp=0 pb=2 and
    a 64 KiB dictionary — exactly what the props byte declares."""
    import lzma

    dict_size = 1 << 16
    filt = [{"id": lzma.FILTER_LZMA1, "lc": 3, "lp": 0, "pb": 2,
             "dict_size": dict_size}]
    packed = lzma.compress(data, format=lzma.FORMAT_RAW, filters=filt)
    props = bytes(((2 * 5 + 0) * 9 + 3,)) + struct.pack("<I", dict_size)
    return props, packed


def sevenzip_build(entries: list[tuple[str, bytes | None]],
                   coder: str = "copy",
                   solid: bool = False,
                   encoded_header: bool = False) -> bytes:
    """A real 7z archive: entries are (name, data) with data=None for
    directories. coder: 'copy' | 'lzma'. solid packs every file into
    ONE folder with SubStreamsInfo; encoded_header LZMA-packs the
    header itself (the kEncodedHeader form real writers emit)."""
    dirs = [(n, d) for n, d in entries if d is None]
    files = [(n, d) for n, d in entries if d is not None]

    def pack_one(data: bytes) -> tuple[bytes, bytes, bytes]:
        if coder == "copy":
            return _CODEC_COPY, b"", data
        props, packed = _lzma1_compress(data)
        return _CODEC_LZMA1, props, packed

    folders: list[dict] = []
    pack_blobs: list[bytes] = []
    if solid and files:
        blob = b"".join(d for _n, d in files)
        codec, props, packed = pack_one(blob)
        folders.append({"codec": codec, "props": props,
                        "unpack_size": len(blob)})
        pack_blobs.append(packed)
        num_unpack = [len(files)]
        sub_sizes = [len(d) for _n, d in files]
    else:
        for _n, d in files:
            codec, props, packed = pack_one(d)
            folders.append({"codec": codec, "props": props,
                            "unpack_size": len(d)})
            pack_blobs.append(packed)
        num_unpack = None
        sub_sizes = None

    def streams_info(pack_pos: int) -> bytes:
        out = bytearray()
        out += write_number(_K_PACK_INFO)
        out += write_number(pack_pos)
        out += write_number(len(pack_blobs))
        out += write_number(_K_SIZE)
        for b in pack_blobs:
            out += write_number(len(b))
        out += write_number(_K_END)
        out += write_number(_K_UNPACK_INFO)
        out += write_number(_K_FOLDER)
        out += write_number(len(folders))
        out.append(0)  # not external
        for f in folders:
            out += write_number(1)  # one coder
            flags = len(f["codec"]) | (0x20 if f["props"] else 0)
            out.append(flags)
            out += f["codec"]
            if f["props"]:
                out += write_number(len(f["props"]))
                out += f["props"]
        out += write_number(_K_UNPACK_SIZES)
        for f in folders:
            out += write_number(f["unpack_size"])
        out += write_number(_K_END)
        if num_unpack is not None:
            out += write_number(_K_SUBSTREAMS)
            out += write_number(_K_NUM_UNPACK_STREAM)
            for v in num_unpack:
                out += write_number(v)
            out += write_number(_K_SIZE)
            # n-1 sizes per folder; the last is inferred
            at = 0
            for fi, v in enumerate(num_unpack):
                for k in range(v - 1):
                    out += write_number(sub_sizes[at + k])
                at += v
            out += write_number(_K_END)
        out += write_number(_K_END)
        return bytes(out)

    # FilesInfo: dirs first (empty-stream bit set), then stream files
    ordered = [(n, None) for n, _d in dirs] + files
    n_all = len(ordered)
    fi = bytearray()
    fi += write_number(_K_FILES_INFO)
    fi += write_number(n_all)
    if dirs:
        bits = bytearray((n_all + 7) // 8)
        for i in range(len(dirs)):
            bits[i // 8] |= 0x80 >> (i % 8)
        fi += write_number(_K_EMPTY_STREAM)
        fi += write_number(len(bits))
        fi += bytes(bits)
    names = b"\x00" + "".join(n + "\x00" for n, _d in ordered).encode("utf-16-le")
    fi += write_number(_K_NAME)
    fi += write_number(len(names))
    fi += names
    fi += write_number(_K_END)

    header = (
        write_number(_K_HEADER)
        + write_number(_K_MAIN_STREAMS)
        + streams_info(0)
        + bytes(fi)
        + write_number(_K_END)
    )

    pack_area = b"".join(pack_blobs)
    if encoded_header:
        props, packed_hdr = _lzma1_compress(header)
        hdr_folders = [{"codec": _CODEC_LZMA1, "props": props,
                        "unpack_size": len(header)}]
        save_f, save_p, save_n, save_s = folders, pack_blobs, num_unpack, sub_sizes
        folders, pack_blobs, num_unpack, sub_sizes = (
            hdr_folders, [packed_hdr], None, None
        )
        next_header = write_number(_K_ENCODED_HEADER) + streams_info(len(pack_area))
        folders, pack_blobs, num_unpack, sub_sizes = save_f, save_p, save_n, save_s
        pack_area = pack_area + packed_hdr
    else:
        next_header = header

    nh_off = len(pack_area)
    start = struct.pack("<QQI", nh_off, len(next_header), zlib.crc32(next_header))
    out = SEVENZIP_MAGIC + b"\x00\x04"
    out += struct.pack("<I", zlib.crc32(start))
    out += start + pack_area + next_header
    return out
