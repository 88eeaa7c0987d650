"""OLE2 / Compound File Binary (.doc/.xls/.ppt) extraction — the
legacy office corpus class.

office.py handles zip-based OPC/ODF (post-2007); decades of crawlable
institutional corpora are in the pre-2007 compound-file binary format.
All four layers here are public specs:

  [MS-CFB]  the container: 512-byte sectors, DIFAT → FAT → chains,
            directory entries (UTF-16LE names, stream/storage types),
            and the mini stream (streams under 4096 bytes live in
            64-byte mini sectors inside the root entry's stream,
            addressed by the miniFAT) — BOTH chain kinds are walked
            and BOTH appear in the synth rotation. Every chain walk
            carries a visited-set guard: a FAT cycle rejects whole
            instead of looping.
  [MS-DOC]  WordDocument: FIB (magic 0xA5EC, fWhichTblStm selecting
            0Table/1Table, ccpText, fcClx/lcbClx) → Clx/piece table in
            the Table stream → text pieces, each 8-bit cp1252
            (fCompressed, fc/2 addressing) or UTF-16LE. fComplex
            (fast-saved) files REJECT WHOLE — their prm-patched piece
            runs can silently reorder text, and a censored corpus
            beats a scrambled one.
  [MS-XLS]  Workbook: BIFF8 record stream (BOF version/type,
            BOUNDSHEET names, SST unique strings in both 8-bit and
            UTF-16 forms, LABELSST/NUMBER cells, EOF). SST strings
            spanning Continue records reject whole (documented
            boundary: the synth never spans, and partial strings must
            not ship).
  [MS-PPT]  PowerPoint Document: the container-record tree
            (recVerAndInstance/recType/recLen headers, recVer 0xF =
            container), SlideContainers counted, text collected from
            TextCharsAtom (UTF-16LE) and TextBytesAtom (latin-1);
            a record overrunning its parent rejects whole.

The extracted doc/ppt text and the xls SST strings are exactly what
text_harvest ships for this class; the census row carries the
structural counts a curation pass filters on.
"""

from __future__ import annotations

import struct
from typing import Optional

__all__ = [
    "cfb_streams",
    "parse_cfb_office",
    "synth_cfb_office",
    "cfb_office_frame",
    "cfb_office_roundtrip",
    "CFB_OFFICE_ORACLE",
]

_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_FREESECT = 0xFFFFFFFF
_NOSTREAM = 0xFFFFFFFF
_MINI_CUTOFF = 4096
_SECT = 512
_MINI_SECT = 64


class _Bad(Exception):
    pass


# ---------------------------------------------------------- CFB reader


def _chain(fat: list[int], start: int, guard: int) -> list[int]:
    """Follow a FAT/miniFAT chain; cycles and overruns reject."""
    out = []
    seen = set()
    s = start
    while s != _ENDOFCHAIN:
        if s in seen or s >= len(fat) or len(out) > guard:
            raise _Bad
        seen.add(s)
        out.append(s)
        s = fat[s]
    return out


def cfb_streams(payload: bytes) -> Optional[dict[str, bytes]]:
    """All stream entries of a CFB container as {name: bytes}, walking
    regular chains from the FAT and sub-cutoff streams from the
    miniFAT inside the root entry's mini stream. None when the payload
    is not CFB; raises nothing (all corruption → None)."""
    try:
        return _cfb_streams(bytes(payload))
    except (_Bad, struct.error, IndexError, UnicodeDecodeError):
        return None


def _cfb_streams(p: bytes) -> Optional[dict[str, bytes]]:
    if len(p) < _SECT or p[:8] != _SIG:
        return None
    (
        major,
        byte_order,
        sect_shift,
        mini_shift,
    ) = struct.unpack_from("<HHHH", p, 26)
    if byte_order != 0xFFFE or major not in (3, 4):
        raise _Bad
    if (major == 3 and sect_shift != 9) or (major == 4 and sect_shift != 12):
        raise _Bad
    if mini_shift != 6:
        raise _Bad
    sect = 1 << sect_shift
    n_fat_sects = struct.unpack_from("<I", p, 44)[0]
    first_dir = struct.unpack_from("<I", p, 48)[0]
    first_minifat, n_minifat = struct.unpack_from("<II", p, 60)
    first_difat, n_difat = struct.unpack_from("<II", p, 68)

    def sector(i: int) -> bytes:
        off = _SECT + i * sect if major == 3 else (i + 1) * sect
        if off + sect > len(p):
            raise _Bad
        return p[off : off + sect]

    # DIFAT: 109 header entries, then a DIFAT sector chain (each
    # sector: sect/4 - 1 entries + a next pointer)
    difat = list(struct.unpack_from("<109I", p, 76))
    s = first_difat
    hops = 0
    while s != _ENDOFCHAIN and s != _FREESECT:
        if hops > n_difat + 4:
            raise _Bad  # DIFAT cycle
        blk = struct.unpack(f"<{sect // 4}I", sector(s))
        difat.extend(blk[:-1])
        s = blk[-1]
        hops += 1
    fat_sects = [x for x in difat if x != _FREESECT][:n_fat_sects]
    if len(fat_sects) != n_fat_sects:
        raise _Bad
    fat: list[int] = []
    for fs in fat_sects:
        fat.extend(struct.unpack(f"<{sect // 4}I", sector(fs)))
    guard = len(p) // sect + 2

    # directory
    entries: list[tuple[str, int, int, int]] = []  # (name, type, start, size)
    for ds in _chain(fat, first_dir, guard):
        blk = sector(ds)
        for e in range(sect // 128):
            ent = blk[e * 128 : (e + 1) * 128]
            name_len = struct.unpack_from("<H", ent, 64)[0]
            otype = ent[66]
            if otype == 0 or name_len < 2 or name_len > 64 or name_len % 2:
                continue
            name = ent[: name_len - 2].decode("utf-16-le")
            start = struct.unpack_from("<I", ent, 116)[0]
            size = struct.unpack_from("<Q", ent, 120)[0]
            if major == 3:
                size &= 0xFFFFFFFF
            entries.append((name, otype, start, size))
    roots = [e for e in entries if e[1] == 5]
    if not roots:
        raise _Bad
    _rname, _rt, mini_start, mini_size = roots[0]

    # mini stream container + miniFAT
    minifat: list[int] = []
    if n_minifat:
        for ms in _chain(fat, first_minifat, guard):
            minifat.extend(struct.unpack(f"<{sect // 4}I", sector(ms)))
    ministream = b""
    if mini_size:
        ministream = b"".join(sector(s) for s in _chain(fat, mini_start, guard))
        if len(ministream) < mini_size:
            raise _Bad
        ministream = ministream[:mini_size]

    out: dict[str, bytes] = {}
    for name, otype, start, size in entries:
        if otype != 2:
            continue
        if size < _MINI_CUTOFF:
            if size == 0:
                out[name] = b""
                continue
            data = b""
            for ms in _chain(minifat, start, guard * (sect // _MINI_SECT)):
                off = ms * _MINI_SECT
                if off + _MINI_SECT > len(ministream) + _MINI_SECT - 1:
                    raise _Bad
                data += ministream[off : off + _MINI_SECT]
            if len(data) < size:
                raise _Bad
            out[name] = data[:size]
        else:
            data = b"".join(sector(s) for s in _chain(fat, start, guard))
            if len(data) < size:
                raise _Bad
            out[name] = data[:size]
    return out


# ------------------------------------------------------- [MS-DOC] text

_FIB_MAGIC = 0xA5EC
_FIB_FLAGS_OFF = 0x000A
_F_COMPLEX = 0x0004
_F_WHICH_TBL = 0x0200
_CCP_TEXT_OFF = 0x004C
_FC_CLX_OFF = 0x01A2


def _doc_text(word: bytes, tables: dict[str, bytes]) -> Optional[dict]:
    if len(word) < 0x01AA or struct.unpack_from("<H", word, 0)[0] != _FIB_MAGIC:
        raise _Bad
    flags = struct.unpack_from("<H", word, _FIB_FLAGS_OFF)[0]
    if flags & _F_COMPLEX:
        return None  # fast-saved: prm-patched pieces can reorder text
    tbl_name = "1Table" if flags & _F_WHICH_TBL else "0Table"
    table = tables.get(tbl_name)
    if table is None:
        raise _Bad
    ccp_text = struct.unpack_from("<I", word, _CCP_TEXT_OFF)[0]
    fc_clx, lcb_clx = struct.unpack_from("<II", word, _FC_CLX_OFF)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(table):
        raise _Bad
    clx = table[fc_clx : fc_clx + lcb_clx]
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:  # RgPrc entries: skip
        sz = struct.unpack_from("<h", clx, pos + 1)[0]
        if sz < 0:
            raise _Bad
        pos += 3 + sz
    if pos >= len(clx) or clx[pos] != 0x02:
        raise _Bad
    lcb = struct.unpack_from("<I", clx, pos + 1)[0]
    plc = clx[pos + 5 : pos + 5 + lcb]
    if len(plc) != lcb or (lcb - 4) % 12:
        raise _Bad
    n = (lcb - 4) // 12
    if n <= 0:
        raise _Bad
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    if list(cps) != sorted(cps) or cps[0] != 0:
        raise _Bad
    pieces = []
    for i in range(n):
        fc_field = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * i + 2)[0]
        count = cps[i + 1] - cps[i]
        compressed = bool(fc_field & 0x40000000)
        fc = fc_field & 0x3FFFFFFF
        if compressed:
            fc //= 2
            raw = word[fc : fc + count]
            if len(raw) != count:
                raise _Bad
            pieces.append(raw.decode("cp1252"))
        else:
            raw = word[fc : fc + 2 * count]
            if len(raw) != 2 * count:
                raise _Bad
            pieces.append(raw.decode("utf-16-le"))
    text = "".join(pieces)
    if len(text) != ccp_text:
        raise _Bad  # the FIB's text length must match the pieces
    # Word control characters: paragraph mark \r → newline; cell/row
    # marks (0x07) and field chars (0x13/0x14/0x15) → space
    clean = []
    for ch in text:
        if ch == "\r":
            clean.append("\n")
        elif ch in "\x07\x13\x14\x15\x0b\x0c":
            clean.append(" ")
        else:
            clean.append(ch)
    return {
        "kind": "doc",
        "text": " ".join("".join(clean).split()) or None,
        "n_pieces": n,
        "text_chars": ccp_text,
    }


# ------------------------------------------------------ [MS-XLS] BIFF8

_R_BOF = 0x0809
_R_EOF = 0x000A
_R_SST = 0x00FC
_R_BOUNDSHEET = 0x0085
_R_LABELSST = 0x00FD
_R_NUMBER = 0x0203


def _xls_workbook(wb: bytes) -> Optional[dict]:
    pos = 0
    n_sheets = 0
    sheet_names: list[str] = []
    sst_strings: list[str] = []
    n_label = n_number = 0
    num_sum = 0.0
    saw_bof = False
    while pos + 4 <= len(wb):
        rid, ln = struct.unpack_from("<HH", wb, pos)
        body = wb[pos + 4 : pos + 4 + ln]
        if len(body) != ln:
            raise _Bad
        pos += 4 + ln
        if rid == _R_BOF:
            if struct.unpack_from("<H", body, 0)[0] != 0x0600:
                raise _Bad  # pre-BIFF8: out of scope, reject
            saw_bof = True
        elif rid == _R_BOUNDSHEET:
            cch = body[6]
            hi = body[7] & 1
            raw = body[8 : 8 + cch * (2 if hi else 1)]
            if len(raw) != cch * (2 if hi else 1):
                raise _Bad
            sheet_names.append(
                raw.decode("utf-16-le" if hi else "latin-1")
            )
            n_sheets += 1
        elif rid == _R_SST:
            c_unique = struct.unpack_from("<I", body, 4)[0]
            at = 8
            for _ in range(c_unique):
                if at + 3 > len(body):
                    raise _Bad  # string spans a Continue: documented reject
                cch, fl = struct.unpack_from("<HB", body, at)
                at += 3
                n_runs = 0
                cb_ext = 0
                if fl & 0x08:
                    n_runs = struct.unpack_from("<H", body, at)[0]
                    at += 2
                if fl & 0x04:
                    cb_ext = struct.unpack_from("<I", body, at)[0]
                    at += 4
                width = 2 if fl & 0x01 else 1
                raw = body[at : at + cch * width]
                if len(raw) != cch * width:
                    raise _Bad
                at += cch * width
                sst_strings.append(
                    raw.decode("utf-16-le" if width == 2 else "latin-1")
                )
                at += 4 * n_runs + cb_ext
                if at > len(body):
                    raise _Bad
        elif rid == _R_LABELSST:
            isst = struct.unpack_from("<I", body, 6)[0]
            if isst >= len(sst_strings):
                raise _Bad  # a cell referencing a string that isn't there
            n_label += 1
        elif rid == _R_NUMBER:
            num_sum += struct.unpack_from("<d", body, 6)[0]
            n_number += 1
        elif rid == _R_EOF and saw_bof and pos >= len(wb):
            break
    if not saw_bof:
        raise _Bad
    return {
        "kind": "xls",
        "text": " ".join(" ".join(sst_strings).split()) or None,
        "n_sheets": n_sheets,
        "n_strings": len(sst_strings),
        "n_label_cells": n_label,
        "n_number_cells": n_number,
        "num_sum": int(num_sum),
        "sheet_names": "/".join(sheet_names) or None,
    }


# ------------------------------------------------------ [MS-PPT] text

_PPT_DOCUMENT = 0x03E8
_PPT_SLIDE = 0x03EE
_PPT_TEXT_CHARS = 0x0FA0
_PPT_TEXT_BYTES = 0x0FA8


def _ppt_text(stream: bytes) -> Optional[dict]:
    """[MS-PPT] record tree: every record is (recVerAndInstance u16,
    recType u16, recLen u32); a recVer nibble of 0xF marks a container
    whose payload is more records. Text lives in TextCharsAtom
    (UTF-16LE) and TextBytesAtom (latin-1) anywhere in the tree;
    slides are SlideContainers. A record overrunning its parent
    rejects whole."""
    n_slides = 0
    atoms: list[str] = []

    def walk(buf: bytes, depth: int) -> None:
        nonlocal n_slides
        if depth > 16:
            raise _Bad
        pos = 0
        while pos < len(buf):
            if pos + 8 > len(buf):
                raise _Bad
            ver_inst, rtype, rlen = struct.unpack_from("<HHI", buf, pos)
            body = buf[pos + 8 : pos + 8 + rlen]
            if len(body) != rlen:
                raise _Bad  # overruns the parent container
            pos += 8 + rlen
            if rtype == _PPT_SLIDE:
                n_slides += 1
            if ver_inst & 0x000F == 0x000F:  # container
                walk(body, depth + 1)
            elif rtype == _PPT_TEXT_CHARS:
                if rlen % 2:
                    raise _Bad
                atoms.append(body.decode("utf-16-le"))
            elif rtype == _PPT_TEXT_BYTES:
                atoms.append(body.decode("latin-1"))

    walk(stream, 0)
    if n_slides == 0 and not atoms:
        raise _Bad  # a PowerPoint stream with no presentation content
    return {
        "kind": "ppt",
        "text": " ".join(" ".join(atoms).split()) or None,
        "n_slides": n_slides,
        "n_text_atoms": len(atoms),
    }


def parse_cfb_office(payload: bytes) -> Optional[dict]:
    """Route a CFB container by its streams: WordDocument → [MS-DOC]
    text, Workbook/Book → BIFF8 census. None for non-CFB payloads and
    for every reject condition (see module docstring)."""
    streams = cfb_streams(payload)
    if streams is None:
        return None
    try:
        if "WordDocument" in streams:
            return _doc_text(streams["WordDocument"], streams)
        wb = streams.get("Workbook", streams.get("Book"))
        if wb is not None:
            return _xls_workbook(wb)
        ppt = streams.get("PowerPoint Document")
        if ppt is not None:
            return _ppt_text(ppt)
    except (_Bad, struct.error, IndexError, UnicodeDecodeError):
        return None
    return None  # a CFB with neither document class (e.g. .msi)


# ----------------------------------------------------------- synthesis
#
# Doc-arithmetic grid (restated verbatim in CFB_OFFICE_ORACLE):
#   kind = [doc, xls, ppt][d % 3] (grids decorrelate via d // 3)
#   doc: n_pieces = 1 + (d//3) % 3; piece i is cp1252 when (d+i) % 2 == 0
#        else UTF-16LE with a '→x' suffix (provably beyond cp1252's
#        repertoire); text chars include the trailing \\r per piece
#   doc: Table stream is 1Table when d % 4 < 2 else 0Table
#   xls: n_sheets = 1 + d % 2 (names sh<d%5>_<j>)
#        strings: 2 + (d//3) % 3, string j = 's<(d+j)%9> t<j>' (+'→' when
#        (d+j) % 2 == 1, stored wide); one LABELSST per string;
#        numbers: 1 + d % 2 cells of value (d+k) % 10
#   the WordDocument / Workbook stream is padded past the 4096 mini
#   cutoff when d % 3 == 0 (regular FAT chain) and stays in the mini
#   stream otherwise — both container paths in one rotation
#   d % 17 == 4: CFB signature corrupted            (reject)
#   d % 13 == 6: doc sets fComplex / xls SST string
#                claims to span past its record     (reject)
#   d % 23 == 9: FAT chain cycle                    (reject)


def doc_kind(d: int) -> str:
    return ("doc", "xls", "ppt")[d % 3]


def _doc_pieces(d: int) -> list[tuple[str, bool]]:
    """[(piece_text_with_par_mark, compressed)]"""
    out = []
    for i in range(1 + (d // 3) % 3):
        compressed = (d + i) % 2 == 0
        t = f"word{(d + i) % 7} p{i}." + ("" if compressed else "→x")
        out.append((t + "\r", compressed))
    return out


def _xls_grid(d: int) -> dict:
    n_str = 2 + (d // 3) % 3
    return {
        "sheets": [f"sh{d % 5}_{j}" for j in range(1 + d % 2)],
        "strings": [
            f"s{(d + j) % 9} t{j}" + ("→" if (d + j) % 2 == 1 else "")
            for j in range(n_str)
        ],
        "numbers": [(d + k) % 10 for k in range(1 + d % 2)],
    }


def _build_word_stream(d: int) -> tuple[bytes, bytes]:
    """(WordDocument, Table) with real FIB + Clx piece table."""
    pieces = _doc_pieces(d)
    fib = bytearray(1538)  # base + rgW + rgLw + 93 FcLcb pairs + padding
    struct.pack_into("<HH", fib, 0, _FIB_MAGIC, 0x00C1)
    flags = _F_WHICH_TBL if d % 4 < 2 else 0
    if d % 13 == 6:
        flags |= _F_COMPLEX
    struct.pack_into("<H", fib, _FIB_FLAGS_OFF, flags)
    struct.pack_into("<H", fib, 32, 14)  # csw
    struct.pack_into("<H", fib, 62, 22)  # cslw
    struct.pack_into("<H", fib, 152, 93)  # cbRgFcLcb
    ccp = sum(len(t) for t, _c in pieces)
    struct.pack_into("<I", fib, _CCP_TEXT_OFF, ccp)

    word = bytearray(fib)
    plc_cps = [0]
    plc_pcds = []
    for t, compressed in pieces:
        plc_cps.append(plc_cps[-1] + len(t))
        if compressed:
            fc = (len(word) * 2) | 0x40000000
            word += t.encode("cp1252")
        else:
            fc = len(word)
            word += t.encode("utf-16-le")
        plc_pcds.append(struct.pack("<HIH", 0, fc, 0))
    n = len(pieces)
    plc = struct.pack(f"<{n + 1}I", *plc_cps) + b"".join(plc_pcds)
    # a one-entry RgPrc before the Pcdt exercises the skip path
    clx = b"\x01" + struct.pack("<h", 2) + b"\x00\x00"
    clx += b"\x02" + struct.pack("<I", len(plc)) + plc
    table = b"\x00" * 32 + clx  # fcClx > 0: offsets are real
    struct.pack_into("<II", word, _FC_CLX_OFF, 32, len(clx))
    if d % 3 == 0:
        word += b"\x20" * (_MINI_CUTOFF + 64 - len(word))  # regular chain
    return bytes(word), table


def _ushort_str(s: str) -> bytes:
    """ShortXLUnicodeString (BOUNDSHEET names)."""
    return bytes((len(s), 0)) + s.encode("latin-1")


def _build_workbook(d: int) -> bytes:
    g = _xls_grid(d)

    def rec(rid: int, body: bytes) -> bytes:
        return struct.pack("<HH", rid, len(body)) + body

    out = rec(_R_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    for name in g["sheets"]:
        out += rec(_R_BOUNDSHEET, struct.pack("<IBB", 0, 0, 0) + _ushort_str(name))
    sst = struct.pack("<II", len(g["strings"]) + 1, len(g["strings"]))
    for j, s in enumerate(g["strings"]):
        wide = "→" in s
        enc = s.encode("utf-16-le" if wide else "latin-1")
        cch = len(s)
        if d % 13 == 6 and j == 0:
            cch = 4000  # claims to span past the record: must reject
        sst += struct.pack("<HB", cch, 1 if wide else 0) + enc
    out += rec(_R_SST, sst)
    for j in range(len(g["strings"])):
        out += rec(_R_LABELSST, struct.pack("<HHHI", j, 0, 0, j))
    for k, v in enumerate(g["numbers"]):
        out += rec(_R_NUMBER, struct.pack("<HHH", 10 + k, 1, 0) + struct.pack("<d", float(v)))
    out += rec(_R_EOF, b"")
    if d % 3 == 0:
        pad = _MINI_CUTOFF + 64 - len(out)
        out += rec(0x005C, b"\x20" * (pad - 4))  # WRITEACCESS padding
    return out


def _cfb_build(
    streams: list[tuple[str, bytes]], d: int, difat_chain: bool = False
) -> bytes:
    """A real v3 CFB container: DIFAT-in-header FAT, directory chain,
    miniFAT + mini stream for sub-cutoff streams, regular chains for
    the rest. d drives the corruption legs. difat_chain routes the FAT
    sector references through a DIFAT SECTOR instead of the header
    (the >6.8 MB form big real-world files use) so that reader path is
    testable without synthesizing a 7 MB payload."""
    minis = [(n, b) for n, b in streams if len(b) < _MINI_CUTOFF]
    regs = [(n, b) for n, b in streams if len(b) >= _MINI_CUTOFF]

    # mini stream container + miniFAT
    ministream = bytearray()
    minifat: list[int] = []
    mini_starts: dict[str, int] = {}
    for name, body in minis:
        nsec = (len(body) + _MINI_SECT - 1) // _MINI_SECT
        mini_starts[name] = len(minifat)
        for i in range(nsec):
            minifat.append(len(minifat) + 1 if i < nsec - 1 else _ENDOFCHAIN)
        ministream += body + b"\x00" * ((-len(body)) % _MINI_SECT)

    # sector plan: [fat][dir][minifat][ministream][regular...]
    n_dir = 1  # 4 entries: root + up to 3 streams
    assert len(streams) <= 3
    n_minifat_sects = (len(minifat) * 4 + _SECT - 1) // _SECT if minifat else 0
    n_ministream = len(ministream) // _SECT + (1 if len(ministream) % _SECT else 0)
    n_reg = sum((len(b) + _SECT - 1) // _SECT for _n, b in regs)
    # FAT sector count: fixpoint (every sector incl. FAT itself is mapped)
    n_fat = 1
    while True:
        total = n_fat + n_dir + n_minifat_sects + n_ministream + n_reg
        need = (total * 4 + _SECT - 1) // _SECT
        if need <= n_fat:
            break
        n_fat = need

    fat: list[int] = []
    order: list[bytes] = []

    def alloc(data: bytes, kind: int | None = None) -> int:
        """Append sectors for `data`; returns start sector."""
        start = len(fat)
        nsec = max(1, (len(data) + _SECT - 1) // _SECT) if data or kind else 0
        for i in range(nsec):
            fat.append(len(fat) + 1 if i < nsec - 1 else _ENDOFCHAIN)
        padded = data + b"\x00" * ((-len(data)) % _SECT)
        order.append(padded)
        return start

    for _ in range(n_fat):
        fat.append(_FATSECT)
    fat_data_placeholder = len(order)

    dir_start = len(fat)
    fat.append(_ENDOFCHAIN)
    dir_placeholder = len(order)
    order.append(b"")

    minifat_start = _ENDOFCHAIN
    if n_minifat_sects:
        mf_data = b"".join(struct.pack("<I", x) for x in minifat)
        mf_data += struct.pack("<I", _FREESECT) * (
            (n_minifat_sects * _SECT - len(mf_data)) // 4
        )
        minifat_start = alloc(mf_data)
    ministream_start = _ENDOFCHAIN
    if ministream:
        ministream_start = alloc(bytes(ministream))
    reg_starts: dict[str, int] = {}
    for name, body in regs:
        reg_starts[name] = alloc(body)

    if d % 23 == 9 and len(fat) > dir_start + 1:
        fat[dir_start] = dir_start  # FAT cycle: the walk must reject

    # directory entries
    def dirent(name: str, otype: int, start: int, size: int,
               left: int = _NOSTREAM, right: int = _NOSTREAM,
               child: int = _NOSTREAM) -> bytes:
        ent = bytearray(128)
        nb = name.encode("utf-16-le")
        ent[: len(nb)] = nb
        struct.pack_into("<H", ent, 64, len(nb) + 2)
        ent[66] = otype
        ent[67] = 1  # black
        struct.pack_into("<III", ent, 68, left, right, child)
        struct.pack_into("<I", ent, 116, start)
        struct.pack_into("<Q", ent, 120, size)
        return bytes(ent)

    ents = [dirent("Root Entry", 5, ministream_start if ministream else _ENDOFCHAIN,
                   len(ministream), child=1)]
    sids = list(range(1, len(streams) + 1))
    for ix, (name, body) in enumerate(streams):
        start = (
            mini_starts[name] if len(body) < _MINI_CUTOFF else reg_starts[name]
        )
        right = sids[ix + 1] if ix + 1 < len(streams) else _NOSTREAM
        ents.append(dirent(name, 2, start, len(body), right=right))
    dir_data = b"".join(ents) + b"\x00" * (_SECT - 128 * len(ents))
    order[dir_placeholder] = dir_data

    fat_data = b"".join(struct.pack("<I", x) for x in fat)
    fat_data += struct.pack("<I", _FREESECT) * ((n_fat * _SECT - len(fat_data)) // 4)
    order.insert(fat_data_placeholder, fat_data)

    first_difat, n_difat_sects = _ENDOFCHAIN, 0
    if difat_chain:
        # one DIFAT sector at the tail carrying every FAT sector ref
        assert len(fat) + 1 <= n_fat * (_SECT // 4)
        first_difat = len(fat)
        fat.append(_DIFSECT)
        refs = list(range(n_fat)) + [_FREESECT] * (_SECT // 4 - 1 - n_fat)
        order.append(
            b"".join(struct.pack("<I", x) for x in refs)
            + struct.pack("<I", _ENDOFCHAIN)
        )
        n_difat_sects = 1

    header = bytearray(_SECT)
    header[:8] = _SIG
    struct.pack_into("<HH", header, 24, 0x003E, 3)  # minor, major
    struct.pack_into("<HHH", header, 28, 0xFFFE, 9, 6)
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, _MINI_CUTOFF)
    struct.pack_into("<II", header, 60, minifat_start, n_minifat_sects)
    struct.pack_into("<II", header, 68, first_difat, n_difat_sects)
    for i in range(109):
        struct.pack_into(
            "<I", header, 76 + 4 * i,
            i if (i < n_fat and not difat_chain) else _FREESECT,
        )
    if d % 17 == 4:
        header[0] ^= 0xFF  # corrupt the signature
    return bytes(header) + b"".join(order)


def _ppt_grid(d: int) -> list[tuple[str, bool]]:
    """[(slide_text, wide)] — wide atoms are TextCharsAtoms carrying a
    char beyond latin-1."""
    out = []
    for s in range(1 + (d // 3) % 3):
        wide = (d + s) % 2 == 1
        out.append((f"slide{s} w{(d + s) % 7}" + ("→" if wide else ""), wide))
    return out


def _build_ppt(d: int) -> bytes:
    def rec(ver_inst: int, rtype: int, body: bytes) -> bytes:
        return struct.pack("<HHI", ver_inst, rtype, len(body)) + body

    slides = b""
    for text, wide in _ppt_grid(d):
        if wide:
            atom = rec(0x0000, _PPT_TEXT_CHARS, text.encode("utf-16-le"))
        else:
            atom = rec(0x0000, _PPT_TEXT_BYTES, text.encode("latin-1"))
        slides += rec(0x000F, _PPT_SLIDE, atom)
    doc = rec(0x000F, _PPT_DOCUMENT, slides)
    if d % 13 == 6:
        # the document container claims one more byte than it has:
        # the walk must reject whole
        doc = doc[:4] + struct.pack("<I", len(doc) - 8 + 1) + doc[8:]
    return doc


def synth_cfb_office(d: int) -> bytes:
    kind = doc_kind(d)
    if kind == "doc":
        word, table = _build_word_stream(d)
        tbl_name = "1Table" if d % 4 < 2 else "0Table"
        return _cfb_build([("WordDocument", word), (tbl_name, table)], d)
    if kind == "ppt":
        return _cfb_build([("PowerPoint Document", _build_ppt(d))], d)
    return _cfb_build([("Workbook", _build_workbook(d))], d)


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, kind string, text string, n_pieces int, "
    "text_chars int, n_sheets int, n_strings int, n_label_cells int, "
    "n_number_cells int, num_sum bigint, sheet_names string, "
    "n_slides int, n_text_atoms int"
)
_COLS = ["kind", "text", "n_pieces", "text_chars", "n_sheets",
         "n_strings", "n_label_cells", "n_number_cells", "num_sum",
         "sheet_names", "n_slides", "n_text_atoms"]


def cfb_office_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """CFB office extraction over any (id, binary) frame: one
    Arrow-batched narrow map, no shuffle (multimodal/docframes.py)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(
        df, parse_cfb_office, _COLS, _SCHEMA, id_col, payload_col
    )


def cfb_office_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real CFB container (.doc
    with FIB + piece table across cp1252/UTF-16 pieces, or .xls with
    BIFF8 BOF/BOUNDSHEET/SST/LABELSST/NUMBER/EOF), with sub-cutoff
    streams in the mini stream and d%3==0 docs padded onto regular FAT
    chains, is parsed by the from-spec walks; every column restated as
    doc_id arithmetic. d%17==4 (signature), d%13==6 (fComplex /
    SST-span) and d%23==9 (FAT cycle) reject whole."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(
        spark, sf_dir, synth_cfb_office, parse_cfb_office, _COLS, _SCHEMA
    )


CFB_OFFICE_ORACLE = """
WITH d0 AS (
  SELECT doc_id, doc_id AS d,
         CASE WHEN doc_id % 17 = 4 OR doc_id % 13 = 6 OR doc_id % 23 = 9
              THEN 1 ELSE 0 END AS rej,
         CASE doc_id % 3 WHEN 0 THEN 'doc' WHEN 1 THEN 'xls'
              ELSE 'ppt' END AS kind
  FROM documents
),
-- doc pieces: i < 1 + d%3 (d%3=0 here, so always 1); text
-- 'word<(d+i)%7> p<i>.' + '→x' on odd (d+i); chars include the
-- trailing CR (9 + 1, or 9 + 2 + 1)
dpiece AS (
  SELECT d0.doc_id,
         string_agg('word' || CAST((d0.d + i.i) % 7 AS VARCHAR) || ' p'
                    || CAST(i.i AS VARCHAR) || '.'
                    || CASE WHEN (d0.d + i.i) % 2 = 1 THEN '→x' ELSE '' END,
                    ' ' ORDER BY i.i) AS text,
         CAST(count(*) AS INT) AS n_pieces,
         CAST(sum(10 + CASE WHEN (d0.d + i.i) % 2 = 1 THEN 2 ELSE 0 END)
              AS INT) AS text_chars
  FROM d0 JOIN generate_series(0, 2) i(i) ON i.i < 1 + (d0.d // 3) % 3
  WHERE d0.rej = 0 AND d0.kind = 'doc'
  GROUP BY d0.doc_id
),
xstr AS (
  SELECT d0.doc_id,
         string_agg('s' || CAST((d0.d + j.j) % 9 AS VARCHAR) || ' t'
                    || CAST(j.j AS VARCHAR)
                    || CASE WHEN (d0.d + j.j) % 2 = 1 THEN '→' ELSE '' END,
                    ' ' ORDER BY j.j) AS text,
         CAST(count(*) AS INT) AS n_strings
  FROM d0 JOIN generate_series(0, 4) j(j) ON j.j < 2 + (d0.d // 3) % 3
  WHERE d0.rej = 0 AND d0.kind = 'xls'
  GROUP BY d0.doc_id
),
xnum AS (
  SELECT d0.doc_id, CAST(sum((d0.d + k.k) % 10) AS BIGINT) AS num_sum,
         CAST(count(*) AS INT) AS n_numbers
  FROM d0 JOIN generate_series(0, 1) k(k) ON k.k < 1 + d0.d % 2
  WHERE d0.rej = 0 AND d0.kind = 'xls'
  GROUP BY d0.doc_id
),
xsheet AS (
  SELECT d0.doc_id,
         string_agg('sh' || CAST(d0.d % 5 AS VARCHAR) || '_'
                    || CAST(j.j AS VARCHAR), '/' ORDER BY j.j) AS names,
         CAST(count(*) AS INT) AS n_sheets
  FROM d0 JOIN generate_series(0, 1) j(j) ON j.j < 1 + d0.d % 2
  WHERE d0.rej = 0 AND d0.kind = 'xls'
  GROUP BY d0.doc_id
),
pslide AS (
  SELECT d0.doc_id,
         string_agg('slide' || CAST(s.s AS VARCHAR) || ' w'
                    || CAST((d0.d + s.s) % 7 AS VARCHAR)
                    || CASE WHEN (d0.d + s.s) % 2 = 1 THEN '→' ELSE '' END,
                    ' ' ORDER BY s.s) AS text,
         CAST(count(*) AS INT) AS n_slides
  FROM d0 JOIN generate_series(0, 2) s(s) ON s.s < 1 + (d0.d // 3) % 3
  WHERE d0.rej = 0 AND d0.kind = 'ppt'
  GROUP BY d0.doc_id
)
SELECT d0.doc_id,
       CASE WHEN rej = 1 THEN NULL ELSE kind END AS kind,
       CASE WHEN rej = 1 THEN NULL
            WHEN kind = 'doc' THEN dpiece.text
            WHEN kind = 'xls' THEN xstr.text
            ELSE pslide.text END AS text,
       dpiece.n_pieces, dpiece.text_chars,
       xsheet.n_sheets, xstr.n_strings,
       xstr.n_strings AS n_label_cells,
       xnum.n_numbers AS n_number_cells,
       xnum.num_sum,
       xsheet.names AS sheet_names,
       pslide.n_slides,
       pslide.n_slides AS n_text_atoms
FROM d0
LEFT JOIN dpiece USING (doc_id)
LEFT JOIN xstr USING (doc_id)
LEFT JOIN xnum USING (doc_id)
LEFT JOIN xsheet USING (doc_id)
LEFT JOIN pslide USING (doc_id)
ORDER BY d0.doc_id
"""
