"""Archive census — ZIP and TAR(.GZ) member walks with the members
routed through media triage.

Curated corpora and scraped datasets ship as archives; before any
per-file operator can run, the pipeline must enumerate members,
verify integrity, and classify the payloads. All three layers are
implemented for real:

  - ZIP (APPNOTE): End-of-Central-Directory scan from the tail
    (comment length must account for the remaining bytes exactly,
    single-disk only), central-directory walk (PK\\x01\\x02 entries),
    per-member local-header cross-check (PK\\x03\\x04, names must
    match), and FULL data verification — stored (method 0) and
    raw-deflate (method 8) members are actually decompressed and
    checked against both the declared uncompressed size AND the CRC-32.
    DATA DESCRIPTORS (flag bit 3 — the streamed-writer convention:
    local sizes/CRC are zero, real values follow the member data) are
    read using the authoritative central-directory values and the
    trailing descriptor (optional PK\\x07\\x08 signature; 8-byte sizes
    when the member carries a zip64 extra) is verified against them.
    ZIP64 is walked for real: saturated (0xFFFF/0xFFFFFFFF) EOCD
    fields route through the zip64 EOCD locator (PK\\x06\\x07) to the
    zip64 EOCD record (PK\\x06\\x06), and saturated per-entry fields
    (usize/csize/local offset) resolve from the 0x0001 extended-
    information extra field — the 8-byte arithmetic >4 GiB archives
    need. Declared rejects: encryption (flag bit 0), multi-disk, any
    other method.
  - TAR (POSIX ustar): 512-byte header blocks with the checksum
    recomputed (chksum field read as spaces), octal size fields,
    `ustar` magic (POSIX and GNU forms), file/dir/other typeflags,
    data rounded to block boundaries, and the required two zero
    end-of-archive blocks. Truncation anywhere rejects whole.
  - TAR.GZ: single-member gzip (zlib wbits=31) around a TAR; trailing
    garbage or a truncated member rejects whole.

Member payloads are routed through media triage (triage_payload):
the census counts members per media class — the "what's IN this
archive" answer a crawl pipeline needs before fan-out.

Reject-whole (return None): bad magic, EOCD/central/local
inconsistencies, CRC or size mismatch, bad tar checksum, truncation,
missing end blocks — a half-walked archive must not contribute
phantom members.

Reference parity note: the reference (smartdatalake/danae) has no
archive handling; this is mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd

__all__ = [
    "parse_archive",
    "iter_archive_members",
    "synth_archive",
    "archive_census_frame",
    "archive_census_roundtrip",
    "ARCHIVE_CENSUS_ORACLE",
]

_EOCD = b"PK\x05\x06"
_CDIR = b"PK\x01\x02"
_LOCAL = b"PK\x03\x04"


# ------------------------------------------------------------------- ZIP


def _extra_zip64(extra: bytes, want_usize: bool, want_csize: bool, want_off: bool):
    """Resolve saturated central-entry fields from the 0x0001 zip64
    extended-information extra field (values present only for the
    saturated fields, in usize/csize/offset order). Returns
    (usize, csize, local_off) with None for fields not requested, or
    None on a malformed extra block."""
    p = 0
    while p + 4 <= len(extra):
        fid, flen = struct.unpack_from("<HH", extra, p)
        p += 4
        if p + flen > len(extra):
            return None
        if fid == 0x0001:
            q = p
            vals = []
            for want in (want_usize, want_csize, want_off):
                if not want:
                    vals.append(None)
                    continue
                if q + 8 > p + flen:
                    return None
                vals.append(struct.unpack_from("<Q", extra, q)[0])
                q += 8
            return tuple(vals)
        p += flen
    return None  # saturated field but no zip64 extra


def _has_zip64_extra(extra: bytes) -> bool:
    p = 0
    while p + 4 <= len(extra):
        fid, flen = struct.unpack_from("<HH", extra, p)
        if fid == 0x0001:
            return True
        p += 4 + flen
    return False


def _zip_members(payload: bytes) -> list[tuple[str, bool, int, int, bytes]] | None:
    """Walk a ZIP into [(name, is_dir, usize, csize, data)]; None on
    any structural violation."""
    n = len(payload)
    # EOCD: scan backwards; the comment length must reach EOF exactly
    pos = payload.rfind(_EOCD)
    found = None
    while pos != -1:
        if pos + 22 <= n:
            comment_len = struct.unpack_from("<H", payload, pos + 20)[0]
            if pos + 22 + comment_len == n:
                found = pos
                break
        pos = payload.rfind(_EOCD, 0, pos)
    if found is None:
        return None
    (disk, cd_disk, n_disk, n_total, cd_size, cd_off) = struct.unpack_from(
        "<HHHHII", payload, found + 4
    )
    if disk != 0 or cd_disk != 0 or n_disk != n_total:
        return None
    cd_end = found
    if 0xFFFF in (n_disk, n_total) or 0xFFFFFFFF in (cd_size, cd_off):
        # zip64: the locator sits immediately before the EOCD and names
        # the zip64 EOCD record, which carries the 8-byte truth
        loc_at = found - 20
        if loc_at < 0 or payload[loc_at : loc_at + 4] != b"PK\x06\x07":
            return None
        l_disk, z_off, l_ndisks = struct.unpack_from("<IQI", payload, loc_at + 4)
        if l_disk != 0 or l_ndisks != 1 or z_off + 56 > n:
            return None
        if payload[z_off : z_off + 4] != b"PK\x06\x06":
            return None
        (z_size, _vm, _vn, zd, zcd, zn_disk, zn_total, zcd_size, zcd_off) = (
            struct.unpack_from("<QHHIIQQQQ", payload, z_off + 4)
        )
        if z_size < 44 or zd != 0 or zcd != 0 or zn_disk != zn_total:
            return None
        n_total, cd_size, cd_off = zn_total, zcd_size, zcd_off
        cd_end = z_off  # the central directory ends where the record begins
    if cd_off + cd_size != cd_end:
        return None
    out = []
    p = cd_off
    for _ in range(n_total):
        if payload[p : p + 4] != _CDIR or p + 46 > cd_end:
            return None
        (
            _ver_made,
            _ver_need,
            flags,
            method,
            _time,
            _date,
            crc,
            csize,
            usize,
            name_len,
            extra_len,
            comm_len,
            _disk_start,
            _iattr,
            _eattr,
            local_off,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", payload, p + 4)
        if flags & 0x0001:
            return None  # encryption: declared reject
        has_dd = bool(flags & 0x0008)  # streamed writer: data descriptor
        if method not in (0, 8):
            return None
        if 0xFFFFFFFF in (csize, usize, local_off):
            extra = payload[p + 46 + name_len : p + 46 + name_len + extra_len]
            got = _extra_zip64(
                extra, usize == 0xFFFFFFFF, csize == 0xFFFFFFFF, local_off == 0xFFFFFFFF
            )
            if got is None:
                return None
            usize = got[0] if got[0] is not None else usize
            csize = got[1] if got[1] is not None else csize
            local_off = got[2] if got[2] is not None else local_off
        name = payload[p + 46 : p + 46 + name_len]
        try:
            name_s = name.decode("utf-8")
        except UnicodeDecodeError:
            return None
        p += 46 + name_len + extra_len + comm_len
        # local header cross-check
        lp = local_off
        if payload[lp : lp + 4] != _LOCAL or lp + 30 > n:
            return None
        l_crc, l_csize, l_usize = struct.unpack_from("<III", payload, lp + 14)
        l_name_len, l_extra_len = struct.unpack_from("<HH", payload, lp + 26)
        if payload[lp + 30 : lp + 30 + l_name_len] != name:
            return None
        l_extra = payload[lp + 30 + l_name_len : lp + 30 + l_name_len + l_extra_len]
        if has_dd:
            # a streamed writer leaves the local sizes/CRC zero (real
            # values follow the data); some put the truth there anyway
            sat = 0xFFFFFFFF
            if (l_crc, l_csize, l_usize) not in (
                (0, 0, 0),
                (crc, csize, usize),
                (crc, min(csize, sat), min(usize, sat)),
            ):
                return None
        dstart = lp + 30 + l_name_len + l_extra_len
        raw = payload[dstart : dstart + csize]
        if len(raw) != csize:
            return None
        if has_dd:
            # the descriptor after the data must confirm the central
            # directory's values; 8-byte sizes iff the LOCAL header
            # carries a zip64 extra (APPNOTE 4.3.9.2). The PK\x07\x08
            # signature is OPTIONAL, and a signature-less descriptor
            # whose CRC happens to equal 0x08074B50 is byte-identical
            # to a signed one (the known APPNOTE ambiguity).
            # Acceptance ordering: when the signature is present the
            # SIGNED framing is authoritative; the unsigned reading is
            # consulted ONLY when the member's CRC itself is
            # 0x08074B50 — the one value for which a signature-less
            # descriptor can masquerade as signed — so a corrupt
            # signed descriptor can no longer slip through via a
            # coincidental unsigned match.
            q = dstart + csize
            fmt, need = (
                ("<IQQ", 20) if _has_zip64_extra(l_extra) else ("<III", 12)
            )
            if payload[q : q + 4] == b"PK\x07\x08":
                skips = (4, 0) if crc == 0x08074B50 else (4,)
            else:
                skips = (0,)
            if not any(
                q + s + need <= n
                and struct.unpack_from(fmt, payload, q + s) == (crc, csize, usize)
                for s in skips
            ):
                return None
        if method == 0:
            data = raw
        else:
            try:
                data = zlib.decompress(raw, -15)
            except zlib.error:
                return None
        if len(data) != usize or zlib.crc32(data) != crc:
            return None
        is_dir = name_s.endswith("/")
        if is_dir and usize != 0:
            return None
        out.append((name_s, is_dir, usize, csize, data))
    if p != cd_end:
        return None  # central directory size lie
    return out


# ------------------------------------------------------------------- TAR


def _tar_members(payload: bytes) -> list[tuple[str, bool, int, int, bytes]] | None:
    n = len(payload)
    if n % 512 != 0 or n < 1024:
        return None
    out = []
    p = 0
    while True:
        if p + 512 > n:
            return None  # ran out before end blocks
        block = payload[p : p + 512]
        if block == b"\x00" * 512:
            if payload[p + 512 : p + 1024] != b"\x00" * 512:
                return None
            return out  # two zero blocks: end of archive
        magic = block[257:265]
        if magic not in (b"ustar\x0000", b"ustar  \x00"):
            return None
        # checksum: header bytes with the chksum field read as spaces
        want = sum(block[:148]) + 8 * 0x20 + sum(block[156:])
        try:
            got = int(block[148:156].rstrip(b"\x00 ").decode("ascii") or "0", 8)
            size = int(block[124:136].rstrip(b"\x00 ").decode("ascii") or "0", 8)
        except (UnicodeDecodeError, ValueError):
            return None
        if got != want or size < 0:
            return None
        name = block[0:100].rstrip(b"\x00")
        try:
            name_s = name.decode("utf-8")
        except UnicodeDecodeError:
            return None
        if not name_s:
            return None
        typeflag = block[156:157]
        data_blocks = (size + 511) // 512
        data = payload[p + 512 : p + 512 + size]
        if len(data) != size:
            return None
        is_dir = typeflag == b"5"
        if is_dir and size != 0:
            return None
        out.append((name_s, is_dir, size, size, data))
        p += 512 * (1 + data_blocks)


def _gunzip_single(payload: bytes) -> bytes | None:
    d = zlib.decompressobj(31)
    try:
        raw = d.decompress(payload)
    except zlib.error:
        return None
    if not d.eof or d.unused_data:
        return None  # truncated member or trailing garbage
    return raw


def _members(payload: bytes) -> tuple[str, list] | None:
    if payload[:4] == _LOCAL or payload[:4] == _EOCD:
        m = _zip_members(payload)
        return None if m is None else ("zip", m)
    if payload[:2] == b"\x1f\x8b":
        raw = _gunzip_single(payload)
        if raw is None:
            return None
        m = _tar_members(raw)
        return None if m is None else ("tar.gz", m)
    if payload[:6] == b"\xfd7zXZ\x00":  # r15: .tar.xz via stdlib lzma
        import lzma

        try:
            raw = lzma.decompress(payload, format=lzma.FORMAT_XZ)
        except lzma.LZMAError:
            return None
        m = _tar_members(raw)
        return None if m is None else ("tar.xz", m)
    if payload[:3] == b"BZh":  # r15: .tar.bz2 via stdlib bz2
        import bz2

        try:
            raw = bz2.decompress(payload)
        except (OSError, ValueError):
            return None
        m = _tar_members(raw)
        return None if m is None else ("tar.bz2", m)
    if len(payload) >= 512 and payload[257:265] in (b"ustar\x0000", b"ustar  \x00"):
        m = _tar_members(payload)
        return None if m is None else ("tar", m)
    if payload[:6] == b"7z\xbc\xaf\x27\x1c":  # r17: .7z from spec
        from danae_spark.multimodal.sevenzip import sevenzip_members

        m = sevenzip_members(payload)
        return None if m is None else ("7z", m)
    return None


def iter_archive_members(payload: bytes):
    """Yield (name, is_dir, data) for each member of a valid archive;
    yields nothing for invalid files."""
    got = _members(bytes(payload)) if payload is not None else None
    if got is None:
        return
    for name, is_dir, _usize, _csize, data in got[1]:
        yield name, is_dir, data


def parse_archive(payload: bytes) -> dict | None:
    """Census an archive into one row: format, member/file/dir counts,
    byte totals, first member name, and per-media-class counts of the
    file payloads as classified by media triage."""
    from danae_spark.multimodal.triage import triage_payload

    got = _members(bytes(payload)) if payload is not None else None
    if got is None:
        return None
    fmt, members = got
    n_files = n_dirs = 0
    total_u = total_c = 0
    counts = {"audio": 0, "image": 0, "video": 0, "subtitle": 0}
    first_name = None
    for name, is_dir, usize, csize, data in members:
        if first_name is None:
            first_name = name
        if is_dir:
            n_dirs += 1
            continue
        n_files += 1
        total_u += usize
        total_c += csize
        t = triage_payload(data)
        if t is not None and t["media_class"] in counts:
            counts[t["media_class"]] += 1
    return {
        "format": fmt,
        "n_members": len(members),
        "n_files": n_files,
        "n_dirs": n_dirs,
        "total_bytes": total_u,
        "total_compressed": total_c,
        "first_name": first_name,
        "n_audio": counts["audio"],
        "n_image": counts["image"],
        "n_video": counts["video"],
        "n_subtitle": counts["subtitle"],
    }


# ------------------------------------------------------------- synthesis


def archive_format(d: int) -> str:
    return ("zip", "tar", "tar.gz", "tar.xz", "tar.bz2", "7z")[d % 6]


def archive_n_files(d: int) -> int:
    return 2 + d % 4


def _zip_build(
    entries: list[tuple[str, bytes, int]], dd: bool = False, zip64: bool = False
) -> bytes:
    """entries: (name, data, method). Dirs are names ending '/'.
    dd=True emits the streamed-writer layout (flag bit 3, zeroed local
    sizes/CRC, a PK\\x07\\x08 data descriptor after each member).
    zip64=True emits the zip64 layout: saturated central fields with
    0x0001 extended-information extras, a zip64 EOCD record + locator,
    and a saturated classic EOCD."""
    out = bytearray()
    central = bytearray()
    sat = 0xFFFFFFFF
    for name, data, method in entries:
        raw = data if method == 0 else zlib.compress(data, 6)[2:-4]  # raw deflate
        crc = zlib.crc32(data)
        nb = name.encode("utf-8")
        local_off = len(out)
        flags = 0x0008 if dd else 0
        ver = 45 if zip64 else 20
        if dd:
            # streaming: sizes unknown at local-header time -> zeros,
            # truth in the descriptor (4-byte form: no local zip64 extra)
            out += _LOCAL + struct.pack(
                "<HHHHHIIIHH", ver, flags, method, 0, 0, 0, 0, 0, len(nb), 0
            )
            out += nb + raw
            out += b"PK\x07\x08" + struct.pack("<III", crc, len(raw), len(data))
        elif zip64:
            l_extra = struct.pack("<HHQQ", 1, 16, len(data), len(raw))
            out += _LOCAL + struct.pack(
                "<HHHHHIIIHH", ver, flags, method, 0, 0, crc, sat, sat,
                len(nb), len(l_extra),
            )
            out += nb + l_extra + raw
        else:
            out += _LOCAL + struct.pack(
                "<HHHHHIIIHH", ver, flags, method, 0, 0, crc, len(raw), len(data),
                len(nb), 0,
            )
            out += nb + raw
        if zip64:
            c_extra = struct.pack("<HHQQQ", 1, 24, len(data), len(raw), local_off)
            central += _CDIR + struct.pack(
                "<HHHHHHIIIHHHHHII",
                45, 45, flags, method, 0, 0, crc, sat, sat,
                len(nb), len(c_extra), 0, 0, 0, 0, sat,
            )
            central += nb + c_extra
        else:
            central += _CDIR + struct.pack(
                "<HHHHHHIIIHHHHHII",
                20, 20, flags, method, 0, 0, crc, len(raw), len(data),
                len(nb), 0, 0, 0, 0, 0, local_off,
            )
            central += nb
    cd_off = len(out)
    out += central
    if zip64:
        z_off = len(out)
        out += b"PK\x06\x06" + struct.pack(
            "<QHHIIQQQQ", 44, 45, 45, 0, 0,
            len(entries), len(entries), len(central), cd_off,
        )
        out += b"PK\x06\x07" + struct.pack("<IQI", 0, z_off, 1)
        out += _EOCD + struct.pack("<HHHHIIH", 0, 0, 0xFFFF, 0xFFFF, sat, sat, 0)
    else:
        out += _EOCD + struct.pack(
            "<HHHHIIH", 0, 0, len(entries), len(entries), len(central), cd_off, 0
        )
    return bytes(out)


def _tar_header(name: str, size: int, typeflag: bytes) -> bytes:
    h = bytearray(512)
    nb = name.encode("utf-8")
    h[0 : len(nb)] = nb
    h[100:108] = b"0000644\x00"
    h[108:116] = b"0000000\x00"
    h[116:124] = b"0000000\x00"
    h[124:136] = f"{size:011o}\x00".encode("ascii")
    h[136:148] = b"00000000000\x00"
    h[148:156] = b" " * 8
    h[156:157] = typeflag
    h[257:265] = b"ustar\x0000"
    chk = sum(h)
    h[148:156] = f"{chk:06o}\x00 ".encode("ascii")
    return bytes(h)


def _tar_build(entries: list[tuple[str, bytes | None]]) -> bytes:
    out = bytearray()
    for name, data in entries:
        if data is None:
            out += _tar_header(name, 0, b"5")
        else:
            out += _tar_header(name, len(data), b"0")
            out += data
            pad = (-len(data)) % 512
            out += b"\x00" * pad
    out += b"\x00" * 1024
    return bytes(out)


def synth_archive(doc_id: int) -> bytes:
    """Doc-deterministic archive: zip / tar / tar.gz / tar.xz /
    tar.bz2 / 7z cycling by doc_id % 6 (r15 added the xz and bz2
    members via the stdlib codecs; r17 the from-spec 7z walk with
    copy/LZMA folders, solid archives on d%7==3 and LZMA-encoded
    headers on d%5==2), a leading 'sub/' directory, then 2-5 media files whose
    payloads are real mixed media (triage's synth_media at
    e = doc_id*8 + m). ZIP members alternate stored/deflated; among
    zip docs, doc_id % 6 == 0 emits the STREAMED layout (flag bit 3 +
    data descriptors) and doc_id % 9 == 0 the ZIP64 layout (saturated
    fields, 0x0001 extras, zip64 EOCD + locator) — same members, same
    census, different wire structure, so the oracle covers all three
    without restating bytes."""
    from danae_spark.multimodal.triage import synth_media

    d = doc_id
    files = [
        (f"sub/m{m}.bin", synth_media(d * 8 + m)) for m in range(archive_n_files(d))
    ]
    fmt = archive_format(d)
    if fmt == "zip":
        entries = [("sub/", b"", 0)]
        entries += [(name, data, m % 2 * 8) for m, (name, data) in enumerate(files)]
        return _zip_build(entries, dd=d % 6 == 0, zip64=d % 9 == 0)
    if fmt == "7z":
        from danae_spark.multimodal.sevenzip import sevenzip_build

        # rotate the 7z-specific structures: coder, solid folders,
        # LZMA-encoded header — same members, same census
        return sevenzip_build(
            [("sub/", None)] + files,
            coder="lzma" if d % 2 else "copy",
            solid=d % 7 == 3,
            encoded_header=d % 5 == 2,
        )
    tar = _tar_build([("sub/", None)] + files)
    if fmt == "tar":
        return tar
    if fmt == "tar.xz":
        import lzma

        return lzma.compress(tar, format=lzma.FORMAT_XZ, preset=4)
    if fmt == "tar.bz2":
        import bz2

        return bz2.compress(tar, 5)
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    return c.compress(tar) + c.flush()


# ----------------------------------------------------- Spark entry points

_COLS = [
    "format",
    "n_members",
    "n_files",
    "n_dirs",
    "total_bytes",
    "total_compressed",
    "first_name",
    "n_audio",
    "n_image",
    "n_video",
    "n_subtitle",
]

_SCHEMA = (
    "doc_id bigint, format string, n_members int, n_files int, n_dirs int, "
    "total_bytes bigint, total_compressed bigint, first_name string, "
    "n_audio int, n_image int, n_video int, n_subtitle int"
)


def archive_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Archive census over any (id, binary) frame; nulls for archives
    that cannot be walked. Media-class member counts come from routing
    every file payload through triage_payload."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = parse_archive(bytes(payload)) if payload is not None else None
                row = {id_col: rid}
                row.update({k: (c.get(k) if c else None) for k in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + _COLS)

    return df.mapInPandas(batches, schema=_SCHEMA.replace("doc_id", id_col, 1))


def archive_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable archive walk: per doc a real zip/tar/tar.gz of
    real mixed-media members is built byte-for-byte (CRCs, checksums,
    central directory), walked by the real validators, every member
    routed through media triage, and the census restated as doc_id
    arithmetic. Byte totals (raw media lengths) are excluded from the
    SQL and pinned against the synthesizer by pytest instead."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    cols = [c for c in _COLS if c not in ("total_bytes", "total_compressed")]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                c = parse_archive(synth_archive(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in cols})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + cols)

    schema = (
        "doc_id bigint, format string, n_members int, n_files int, n_dirs int, "
        "first_name string, n_audio int, n_image int, n_video int, n_subtitle int"
    )
    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=schema)
        .orderBy("doc_id")
    )


# member m of doc d is synth_media(d*8 + m); its class is (d*8 + m) % 10:
# 0,1,2,4,9 -> audio; 3 -> image; 5,6,7 -> video; 8 -> subtitle
ARCHIVE_CENSUS_ORACLE = """
WITH g AS (
  SELECT doc_id, CAST(2 + doc_id % 4 AS INT) AS n_files FROM documents
),
cls AS (
  SELECT g.doc_id,
         CASE WHEN (g.doc_id * 8 + m.m) % 10 IN (0, 1, 2, 4, 9) THEN 'audio'
              WHEN (g.doc_id * 8 + m.m) % 10 = 3 THEN 'image'
              WHEN (g.doc_id * 8 + m.m) % 10 IN (5, 6, 7) THEN 'video'
              ELSE 'subtitle' END AS c
  FROM g, generate_series(0, 5) m(m)
  WHERE m.m < g.n_files
),
agg AS (
  SELECT doc_id,
         CAST(count(*) FILTER (WHERE c = 'audio') AS INT) AS n_audio,
         CAST(count(*) FILTER (WHERE c = 'image') AS INT) AS n_image,
         CAST(count(*) FILTER (WHERE c = 'video') AS INT) AS n_video,
         CAST(count(*) FILTER (WHERE c = 'subtitle') AS INT) AS n_subtitle
  FROM cls GROUP BY doc_id
)
SELECT g.doc_id,
       CASE g.doc_id % 6 WHEN 0 THEN 'zip' WHEN 1 THEN 'tar'
            WHEN 2 THEN 'tar.gz' WHEN 3 THEN 'tar.xz'
            WHEN 4 THEN 'tar.bz2' ELSE '7z' END AS format,
       CAST(g.n_files + 1 AS INT) AS n_members,
       g.n_files AS n_files,
       CAST(1 AS INT) AS n_dirs,
       'sub/' AS first_name,
       a.n_audio, a.n_image, a.n_video, a.n_subtitle
FROM g JOIN agg a USING (doc_id)
ORDER BY g.doc_id
"""
