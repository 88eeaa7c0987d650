"""PDF text extraction — the second-highest-volume document format a
training corpus ingests after HTML (papers, reports, books).

A from-scratch classic-PDF reader over the bytes, with every layer
implemented for real:

  - File structure: `%PDF-1.x` header, `startxref` -> classic xref
    TABLE walk (20-byte entries, multi-subsection, `/Prev` chains for
    incrementally-updated files — later tables win), trailer dict with
    `/Root`/`/Size`, `%%EOF`.
  - Object grammar: the full COS syntax — dictionaries, arrays,
    literal strings (balanced parens, all escape forms incl. octal and
    line continuations), hex strings, names with `#xx` escapes,
    numbers, booleans, null, indirect references (`n g R`), streams
    (`/Length` may itself be indirect; the `endstream` keyword must
    sit exactly past the declared bytes — a mismatch rejects the
    file).
  - Filters: `/FlateDecode` (zlib), `/LZWDecode` (MSB-first variable
    width codes, EarlyChange parameter honored), `/ASCIIHexDecode`,
    `/ASCII85Decode` (z-group shorthand, partial final group),
    `/RunLengthDecode`, unfiltered streams, and filter CHAINS
    (`/Filter` array decoded left-to-right with per-filter
    `/DecodeParms`); Flate/LZW honor the PNG predictors (10-15).
  - Document structure: Catalog -> Pages tree walk (nested `/Pages`
    nodes, `/Count` cross-checked against the leaves found, cycle
    guard), per-page `/Contents` (single ref or array, concatenated).
  - Text: content-stream interpretation of the text operators — BT/ET
    blocks, Tj / TJ (array form: shown strings concatenate; kerning
    numbers are positioning, not text), ' and " (next-line-and-show),
    with Td / TD / T* / Tm treated as line breaks; unknown operators
    clear the operand stack and continue (the spec's forward-compat
    rule). Simple-font string bytes decode as Latin-1. COMPOSITE
    (Type0/CID) fonts are read through their /ToUnicode CMap: the
    font selected by `Tf` is resolved from the page's /Resources
    /Font dict; Identity-H/V-encoded 2-byte CID strings map through
    the CMap's bfchar / bfrange (base-increment and array-destination
    forms) sections to real Unicode. A Type0 font WITHOUT a ToUnicode
    CMap — or with an unmapped CID in shown text — rejects the file
    whole (the Latin-1 reading of 2-byte CID strings would be silent
    mojibake, exactly what the reject contract exists to prevent).

PDF 1.5+ files are covered too (most modern PDFs): cross-reference
STREAMS (/Type /XRef — W field widths, Index subsections, type-0/1/2
entries) with the PNG-filter Flate predictors they conventionally
use (10-15: None/Sub/Up/Average/Paeth, reversed byte-wise per row),
and OBJECT streams (/Type /ObjStm — N header pairs, objects parsed at
/First + offset; objstm-in-objstm is the spec-forbidden reject).

ENCRYPTED files using the STANDARD security handler with an EMPTY
user password — how the large "protected but readable" share of real
PDFs ship — are decrypted (r12): ISO 32000-1 §7.6.3's RC4 stack,
revisions 2 and 3 (V 1/2, 40-128 bit keys) — Algorithm 2 MD5 key
derivation over (pad ‖ /O ‖ /P ‖ /ID[0], 50 extra MD5 rounds for R3),
Algorithms 4/5 user-password VERIFICATION against /U (a mismatch,
i.e. a non-empty password or a garbled key, rejects whole), then
per-object keys MD5(key ‖ objnum[0:3] ‖ gen[0:2]) applied RC4-wise to
every string (at lex time, after escape resolution) and every stream
(before filters) — except the /Encrypt dict itself and XRef streams,
which the spec leaves plaintext.

Declared boundaries (reject whole, documented because each needs
out-of-spec-table or cryptographic machinery that cannot be certified
from first principles here): NON-empty-password encryption, AES
encryption (V 4/5 — /CF crypt filters, AESV2/V3), non-Standard
security handlers, image/crypt filters (DCTDecode, JBIG2Decode,
JPXDecode, CCITTFaxDecode, Crypt), the TIFF predictor (2) and
sub-byte predictor rows, inline images (BI..EI) inside content,
Type0 fonts whose /Encoding is a predefined CMap name other than
Identity-H/V (the predefined CMap tables are out-of-spec-table data),
and Type0 fonts without a /ToUnicode CMap.

Reference parity note: the reference (smartdatalake/danae) ingests
tabular files only; PDF extraction is mandated LLM-pipeline extension
surface (document text feeding the quality/dedup/token stack).
"""

from __future__ import annotations

import hashlib
import re
import struct
import zlib
from typing import Iterator

import pandas as pd

__all__ = [
    "parse_pdf",
    "synth_pdf",
    "synth_pdf_cid",
    "synth_pdf_encrypted",
    "pdf_text_frame",
    "pdf_text_roundtrip",
    "pdf_text_cid_roundtrip",
    "pdf_text_encrypted_roundtrip",
    "PDF_TEXT_ORACLE",
    "PDF_TEXT_CID_ORACLE",
    "PDF_TEXT_ENCRYPTED_ORACLE",
]

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


class _Lexer:
    """COS-syntax object reader over a bytes buffer."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.b = buf
        self.i = pos
        # per-object string decrypt hook (encrypted documents): applied
        # to the RAW bytes of literal/hex strings after escape
        # resolution — encryption is the last thing a writer applies
        self.decrypt = None

    def _post_str(self, s: str) -> str:
        if self.decrypt is None:
            return s
        return self.decrypt(s.encode("latin-1")).decode("latin-1")

    def _ws(self) -> None:
        b, n = self.b, len(self.b)
        while self.i < n:
            c = self.b[self.i]
            if c in _WS:
                self.i += 1
            elif c == 0x25:  # '%' comment to EOL
                j = self.b.find(b"\n", self.i)
                self.i = n if j == -1 else j + 1
            else:
                return

    def _keyword(self) -> str:
        start = self.i
        b, n = self.b, len(self.b)
        while self.i < n and b[self.i] not in _WS and b[self.i] not in _DELIM:
            self.i += 1
        return b[start : self.i].decode("latin-1")

    def _name(self) -> str:
        self.i += 1  # '/'
        start = self.i
        b, n = self.b, len(self.b)
        out = []
        while self.i < n and b[self.i] not in _WS and b[self.i] not in _DELIM:
            c = b[self.i]
            if c == 0x23 and self.i + 2 < n:  # '#xx'
                try:
                    out.append(chr(int(b[self.i + 1 : self.i + 3].decode("ascii"), 16)))
                    self.i += 3
                    continue
                except (UnicodeDecodeError, ValueError):
                    raise _Bad()
            out.append(chr(c))
            self.i += 1
        if self.i == start:
            raise _Bad()
        return "".join(out)

    def _string(self) -> str:
        self.i += 1  # '('
        b, n = self.b, len(self.b)
        depth = 1
        out = []
        while self.i < n:
            c = b[self.i]
            if c == 0x5C:  # backslash
                self.i += 1
                if self.i >= n:
                    raise _Bad()
                e = b[self.i]
                if e in b"nrtbf":
                    out.append({0x6E: "\n", 0x72: "\r", 0x74: "\t", 0x62: "\b", 0x66: "\f"}[e])
                    self.i += 1
                elif e in b"()\\":
                    out.append(chr(e))
                    self.i += 1
                elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                    oct_digits = []
                    while len(oct_digits) < 3 and self.i < n and 0x30 <= b[self.i] <= 0x37:
                        oct_digits.append(chr(b[self.i]))
                        self.i += 1
                    out.append(chr(int("".join(oct_digits), 8) & 0xFF))
                elif e in b"\r\n":  # line continuation
                    self.i += 1
                    if e == 0x0D and self.i < n and b[self.i] == 0x0A:
                        self.i += 1
                else:  # unknown escape: the char itself
                    out.append(chr(e))
                    self.i += 1
            elif c == 0x28:
                depth += 1
                out.append("(")
                self.i += 1
            elif c == 0x29:
                depth -= 1
                self.i += 1
                if depth == 0:
                    return self._post_str("".join(out))
                out.append(")")
            else:
                out.append(chr(c))
                self.i += 1
        raise _Bad()  # unterminated string

    def _hex_string(self) -> str:
        self.i += 1  # '<'
        end = self.b.find(b">", self.i)
        if end == -1:
            raise _Bad()
        digits = bytes(c for c in self.b[self.i : end] if c not in _WS)
        self.i = end + 1
        if not re.fullmatch(rb"[0-9a-fA-F]*", digits):
            raise _Bad()
        if len(digits) % 2:
            digits += b"0"
        return self._post_str(bytes.fromhex(digits.decode("ascii")).decode("latin-1"))

    def obj(self):
        self._ws()
        if self.i >= len(self.b):
            raise _Bad()
        b = self.b
        c = b[self.i]
        if b.startswith(b"<<", self.i):
            self.i += 2
            d = {}
            while True:
                self._ws()
                if b.startswith(b">>", self.i):
                    self.i += 2
                    return d
                if self.i >= len(b) or b[self.i] != 0x2F:
                    raise _Bad()
                key = self._name()
                d[key] = self.obj()
        if c == 0x5B:  # '['
            self.i += 1
            arr = []
            while True:
                self._ws()
                if self.i < len(b) and b[self.i] == 0x5D:
                    self.i += 1
                    return arr
                arr.append(self.obj())
        if c == 0x2F:
            return self._name()
        if c == 0x28:
            return self._string()
        if c == 0x3C:
            return self._hex_string()
        if c in b"+-.0123456789":
            m = re.match(rb"[+-]?(\d+\.\d*|\.\d+|\d+)", b[self.i :])
            if not m:
                raise _Bad()
            tok = m.group(0)
            self.i += len(tok)
            if b"." in tok:
                return float(tok)
            num = int(tok)
            # lookahead for an indirect reference: <num> <gen> R
            save = self.i
            try:
                self._ws()
                m2 = re.match(rb"\d+", b[self.i :])
                if m2:
                    self.i += len(m2.group(0))
                    self._ws()
                    if b[self.i : self.i + 1] == b"R" and (
                        self.i + 1 >= len(b)
                        or b[self.i + 1] in _WS
                        or b[self.i + 1] in _DELIM
                    ):
                        self.i += 1
                        return _Ref(num)
            except _Bad:
                pass
            self.i = save
            return num
        kw = self._keyword()
        if kw == "true":
            return True
        if kw == "false":
            return False
        if kw == "null":
            return None
        raise _Bad()


class _Bad(Exception):
    pass


def _asciihex_decode(data: bytes) -> bytes:
    """ASCIIHexDecode: hex digits, whitespace ignored, '>' EOD marker
    required; an odd final digit pads with 0 (spec rule)."""
    end = data.find(b">")
    if end == -1:
        raise _Bad()  # missing EOD
    if data[end + 1 :].strip(_WS):
        raise _Bad()  # bytes after EOD
    digits = bytes(c for c in data[:end] if c not in _WS)
    if not re.fullmatch(rb"[0-9a-fA-F]*", digits):
        raise _Bad()
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    """ASCII85Decode: 5 chars ('!'..'u') -> 4 bytes base-85 groups,
    'z' shorthand for a zero group, '~>' EOD; a partial final group of
    n chars yields n-1 bytes. Rejects: bad chars, 'z' inside a group,
    a 1-char final group, group value overflow, missing EOD."""
    end = data.find(b"~>")
    if end == -1:
        raise _Bad()
    if data[end + 2 :].strip(_WS):
        raise _Bad()
    out = bytearray()
    group: list[int] = []
    for c in data[:end]:
        if c in _WS:
            continue
        if c == 0x7A:  # 'z'
            if group:
                raise _Bad()  # z inside a group
            out += b"\x00\x00\x00\x00"
            continue
        if not (0x21 <= c <= 0x75):
            raise _Bad()
        group.append(c - 33)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            if v > 0xFFFFFFFF:
                raise _Bad()
            out += v.to_bytes(4, "big")
            group = []
    if group:
        n = len(group)
        if n == 1:
            raise _Bad()  # a single trailing char encodes nothing
        v = 0
        for g in group + [84] * (5 - n):
            v = v * 85 + g
        if v > 0xFFFFFFFF:
            raise _Bad()
        out += v.to_bytes(4, "big")[: n - 1]
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes:
    """RunLengthDecode: length byte 0-127 copies the next L+1 bytes,
    129-255 repeats the next byte 257-L times, 128 is EOD (required;
    trailing bytes after it reject)."""
    out = bytearray()
    i = 0
    while True:
        if i >= len(data):
            raise _Bad()  # missing EOD
        tag = data[i]
        i += 1
        if tag == 128:
            if i != len(data):
                raise _Bad()  # bytes after EOD
            return bytes(out)
        if tag < 128:
            chunk = data[i : i + tag + 1]
            if len(chunk) != tag + 1:
                raise _Bad()
            out += chunk
            i += tag + 1
        else:
            if i >= len(data):
                raise _Bad()
            out += bytes([data[i]]) * (257 - tag)
            i += 1


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """LZWDecode: MSB-first variable-width codes (9..12 bits), clear
    code 256, EOD 257; the code width grows when the NEXT table slot
    plus EarlyChange reaches the width limit (the decoder lags the
    encoder's table by one entry, which is what EarlyChange=1 — the
    PDF default — compensates for). Truncated input, an out-of-table
    code, or a non-literal first code reject."""
    out = bytearray()
    table: dict[int, bytes] = {}
    next_code = 258
    width = 9
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise _Bad()  # truncated: no EOD seen
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (bitbuf >> nbits) & ((1 << width) - 1)
        if code == 256:
            table = {}
            next_code = 258
            width = 9
            prev = None
            continue
        if code == 257:
            return bytes(out)
        if prev is None:
            if code > 255:
                raise _Bad()
            entry = bytes([code])
        elif code < 256:
            entry = bytes([code])
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise _Bad()
        out += entry
        if prev is not None:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code + early >= (1 << width) and width < 12:
                width += 1
        prev = entry


def _png_unpredict(raw: bytes, rowlen: int, bpp: int) -> bytes:
    """Reverse the PNG row filters (per-row tag byte; None/Sub/Up/
    Average/Paeth) as PDF's Flate predictors 10-15 apply them —
    byte-wise over rows of `rowlen` bytes with pixel width `bpp`."""
    if rowlen <= 0 or len(raw) % (rowlen + 1) != 0:
        raise _Bad()
    out = bytearray()
    prev = bytearray(rowlen)
    for r in range(0, len(raw), rowlen + 1):
        tag = raw[r]
        row = bytearray(raw[r + 1 : r + 1 + rowlen])
        if tag == 0:
            pass
        elif tag == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif tag == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif tag == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif tag == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        else:
            raise _Bad()
        out += row
        prev = row
    return bytes(out)


def _parse_tounicode(data: bytes):
    """Parse a /ToUnicode CMap stream (ISO 32000-1 §9.10.3) into a
    code->Unicode decoder. Reads the codespacerange (uniform 1- or
    2-byte codes; mixed lengths reject), bfchar pairs, and bfrange
    triples (base-increment and array-destination forms; destinations
    are UTF-16BE). Other CMap/PostScript operators clear the operand
    stack and are skipped — the forward-compat rule the content-stream
    interpreter already uses. Returns a decode(str)->str callable with
    a `.clen` attribute; an unmapped code at decode time raises _Bad
    (emitting mojibake for it would silently corrupt training text)."""
    lx = _Lexer(data)
    clen: int | None = None
    single: dict[int, str] = {}
    ranges: list[tuple[int, int, object]] = []
    pending: list = []

    def hex_bytes(v) -> bytes:
        if not isinstance(v, str):
            raise _Bad()
        return v.encode("latin-1")

    def utf16(bs: bytes) -> str:
        if len(bs) % 2:
            raise _Bad()
        try:
            return bs.decode("utf-16-be")
        except UnicodeDecodeError:
            raise _Bad()

    while True:
        lx._ws()
        if lx.i >= len(data):
            break
        c = data[lx.i]
        if (
            c == 0x28
            or c == 0x2F
            or c == 0x5B
            or data.startswith(b"<<", lx.i)
            or c == 0x3C
            or c in b"+-.0123456789"
        ):
            pending.append(lx.obj())
            continue
        kw = lx._keyword()
        if not kw:
            raise _Bad()
        if kw in ("begincodespacerange", "beginbfchar", "beginbfrange"):
            pending = []
        elif kw == "endcodespacerange":
            if len(pending) % 2:
                raise _Bad()
            for k in range(0, len(pending), 2):
                lo, hi = hex_bytes(pending[k]), hex_bytes(pending[k + 1])
                if len(lo) != len(hi) or len(lo) not in (1, 2):
                    raise _Bad()
                if clen is None:
                    clen = len(lo)
                elif clen != len(lo):
                    raise _Bad()  # mixed-length codespaces: declared reject
            pending = []
        elif kw == "endbfchar":
            if len(pending) % 2:
                raise _Bad()
            for k in range(0, len(pending), 2):
                src = hex_bytes(pending[k])
                if clen is None or len(src) != clen:
                    raise _Bad()
                single[int.from_bytes(src, "big")] = utf16(hex_bytes(pending[k + 1]))
            pending = []
        elif kw == "endbfrange":
            if len(pending) % 3:
                raise _Bad()
            for k in range(0, len(pending), 3):
                lo_b, hi_b = hex_bytes(pending[k]), hex_bytes(pending[k + 1])
                if clen is None or len(lo_b) != clen or len(hi_b) != clen:
                    raise _Bad()
                lo, hi = int.from_bytes(lo_b, "big"), int.from_bytes(hi_b, "big")
                if hi < lo:
                    raise _Bad()
                dst = pending[k + 2]
                if isinstance(dst, list):
                    if len(dst) != hi - lo + 1:
                        raise _Bad()
                    ranges.append((lo, hi, [utf16(hex_bytes(x)) for x in dst]))
                else:
                    base = hex_bytes(dst)
                    utf16(base)  # validate the base decodes
                    if len(base) < 2:
                        raise _Bad()
                    ranges.append((lo, hi, base))
            pending = []
        else:
            pending = []  # def / dict / begincmap / findresource / ...
    if clen is None:
        raise _Bad()  # a CMap without a codespacerange

    def decode(s: str) -> str:
        raw = s.encode("latin-1")
        if len(raw) % clen:
            raise _Bad()
        out: list[str] = []
        for i in range(0, len(raw), clen):
            code = int.from_bytes(raw[i : i + clen], "big")
            got = single.get(code)
            if got is None:
                for lo, hi, dst in ranges:
                    if lo <= code <= hi:
                        if isinstance(dst, list):
                            got = dst[code - lo]
                        else:
                            unit = int.from_bytes(dst[-2:], "big") + (code - lo)
                            if unit > 0xFFFF:
                                raise _Bad()
                            got = utf16(dst[:-2] + unit.to_bytes(2, "big"))
                        break
            if got is None:
                raise _Bad()  # unmapped CID: mojibake guard
            out.append(got)
        return "".join(out)

    decode.clen = clen
    return decode


# ------------------------------------------- standard security handler
#
# ISO 32000-1 §7.6.3: the RC4 stack of the Standard security handler,
# revisions 2 (40-bit) and 3 (40-128 bit). Only the EMPTY user
# password is accepted — Algorithm 4/5 verification against /U rejects
# everything else whole.

# the 32-byte password pad of Algorithm 2 (ISO 32000-1 Table 3.1)
_STD_PAD = bytes(
    (
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
        0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    )
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (the spec's 'RC4 encryption function' — symmetric)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _std_file_key(o: bytes, p: int, id0: bytes, r: int, klen: int) -> bytes:
    """Algorithm 2 (empty user password): MD5(pad ‖ O ‖ P-as-int32-LE ‖
    ID[0]), then for R>=3 fifty more MD5 rounds over the first klen
    bytes; the file key is the first klen bytes."""
    h = hashlib.md5()
    h.update(_STD_PAD)  # padded empty user password IS the pad
    h.update(o)
    h.update(struct.pack("<i", p))
    h.update(id0)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:klen]).digest()
    return key[:klen]


def _std_user_check(key: bytes, u: bytes, id0: bytes, r: int) -> bool:
    """Algorithms 4 (R2) / 5 (R3): does /U prove the EMPTY user
    password under this file key?"""
    if r == 2:
        return _rc4(key, _STD_PAD) == u
    want = _rc4(key, hashlib.md5(_STD_PAD + id0).digest())
    for i in range(1, 20):
        want = _rc4(bytes(b ^ i for b in key), want)
    return want == u[:16]


def _std_object_key(file_key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1 per-object key: MD5(file key ‖ objnum low 3 bytes LE
    ‖ gen low 2 bytes LE), truncated to min(klen+5, 16)."""
    h = hashlib.md5(
        file_key + struct.pack("<I", num)[:3] + struct.pack("<H", gen & 0xFFFF)
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


class _Doc:
    def __init__(self, buf: bytes):
        self.b = buf
        self.xref: dict[int, int] = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._crypt_key: bytes | None = None

    # -------------------------------------------------- file structure

    def load(self) -> None:
        if not self.b.startswith(b"%PDF-1."):
            raise _Bad()
        tail = self.b[-64:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise _Bad()
        offset = int(m.group(1))
        seen = set()
        while True:
            if offset in seen or offset >= len(self.b):
                raise _Bad()
            seen.add(offset)
            trailer = self._read_xref(offset)
            if not self.trailer:
                self.trailer = trailer
            prev = trailer.get("Prev")
            if prev is None:
                break
            if not isinstance(prev, int):
                raise _Bad()
            offset = prev
        if "Root" not in self.trailer:
            raise _Bad()
        if "Encrypt" in self.trailer:
            # must run BEFORE any other object parses: every later
            # string/stream read needs the per-object decrypt
            self._setup_encryption()

    def _setup_encryption(self) -> None:
        """Standard security handler, EMPTY user password only (RC4,
        revisions 2/3). The /Encrypt dict parses with no decrypt hook
        active — its own /O and /U strings are plaintext per spec —
        and /ID lives in the (never encrypted) trailer. Anything the
        verification can't prove rejects whole: non-empty passwords,
        AES (V 4/5), non-Standard handlers, garbled keys."""
        enc = self.resolve(self.trailer["Encrypt"])
        if not isinstance(enc, dict) or enc.get("Filter") != "Standard":
            raise _Bad()  # third-party security handlers: declared reject
        v = self.resolve(enc.get("V"))
        r = self.resolve(enc.get("R"))
        if v not in (1, 2) or r not in (2, 3):
            raise _Bad()  # AES / crypt filters (V4+): declared reject
        length = 40 if v == 1 else self.resolve(enc.get("Length", 40))
        if not (isinstance(length, int) and 40 <= length <= 128 and length % 8 == 0):
            raise _Bad()
        o = self.resolve(enc.get("O"))
        u = self.resolve(enc.get("U"))
        p = self.resolve(enc.get("P"))
        ids = self.resolve(self.trailer.get("ID"))
        if not (
            isinstance(o, str)
            and isinstance(u, str)
            and isinstance(p, int)
            and isinstance(ids, list)
            and ids
            and isinstance(ids[0], str)
        ):
            raise _Bad()
        ob = o.encode("latin-1")
        ub = u.encode("latin-1")
        id0 = ids[0].encode("latin-1")
        if len(ob) != 32 or len(ub) != 32:
            raise _Bad()
        key = _std_file_key(ob, p, id0, r, length // 8)
        if not _std_user_check(key, ub, id0, r):
            raise _Bad()  # non-empty user password (or corrupt keys)
        self._crypt_key = key

    def _read_xref(self, offset: int) -> dict:
        """Classic xref TABLE ('xref' keyword) or a PDF 1.5+ xref
        STREAM ('N G obj' of a /Type /XRef stream) — both forms load
        into the same entry map, later tables/streams winning."""
        lx = _Lexer(self.b, offset)
        lx._ws()
        if self.b.startswith(b"xref", lx.i):
            return self._read_xref_table(lx.i)
        return self._read_xref_stream(offset)

    def _read_xref_stream(self, offset: int) -> dict:
        num, obj = self._parse_indirect(offset)
        if not (isinstance(obj, tuple) and obj[0] == "stream"):
            raise _Bad()
        d = obj[1]
        if d.get("Type") != "XRef":
            raise _Bad()
        data = self.stream_data(obj)
        w = d.get("W")
        size = d.get("Size")
        if (
            not isinstance(w, list)
            or len(w) != 3
            or not all(isinstance(x, int) and 0 <= x <= 8 for x in w)
            or not isinstance(size, int)
        ):
            raise _Bad()
        index = d.get("Index", [0, size])
        if not isinstance(index, list) or len(index) % 2 or not all(
            isinstance(x, int) and x >= 0 for x in index
        ):
            raise _Bad()
        row = sum(w)
        if row == 0 or len(data) != row * sum(index[1::2]):
            raise _Bad()

        def field(buf: bytes, lo: int, width: int, default: int) -> int:
            if width == 0:
                return default
            return int.from_bytes(buf[lo : lo + width], "big")

        pos = 0
        for s in range(0, len(index), 2):
            start, count = index[s], index[s + 1]
            for k in range(count):
                rowb = data[pos : pos + row]
                pos += row
                num_k = start + k
                t = field(rowb, 0, w[0], 1)  # absent type field defaults to 1
                f2 = field(rowb, w[0], w[1], 0)
                f3 = field(rowb, w[0] + w[1], w[2], 0)
                if num_k in self.xref or t == 0:
                    continue  # free, or already set by a LATER section
                if t == 1:
                    self.xref[num_k] = f2
                elif t == 2:
                    self.xref[num_k] = ("objstm", f2, f3)
                else:
                    raise _Bad()  # unknown entry type
        # the xref stream's dict IS the trailer (/Root /Info /Prev /Size)
        self._cache[num] = obj
        return d

    def _read_xref_table(self, at: int) -> dict:
        lx = _Lexer(self.b, at)
        lx.i += 4  # past 'xref'
        while True:
            lx._ws()
            if self.b.startswith(b"trailer", lx.i):
                lx.i += 7
                trailer = lx.obj()
                if not isinstance(trailer, dict):
                    raise _Bad()
                return trailer
            m = re.match(rb"(\d+)\s+(\d+)", self.b[lx.i :])
            if not m:
                raise _Bad()
            start, count = int(m.group(1)), int(m.group(2))
            lx.i += m.end()
            lx._ws()
            for k in range(count):
                entry = self.b[lx.i : lx.i + 20]
                em = re.match(rb"(\d{10}) (\d{5}) ([nf])(\r\n| \r| \n)", entry)
                if not em:
                    raise _Bad()
                num = start + k
                # earlier tables in the /Prev chain must not override
                # the updated entries already loaded
                if em.group(3) == b"n" and num not in self.xref:
                    self.xref[num] = int(em.group(1))
                lx.i += 20

    # ------------------------------------------------------ object layer

    def resolve(self, v):
        if isinstance(v, _Ref):
            return self.get(v.num)
        return v

    def _parse_indirect(self, offset: int):
        """Parse the 'N G obj ... endobj' at a byte offset; returns
        (num, obj) where obj is a value or a ('stream', dict, raw)
        triple."""
        lx = _Lexer(self.b, offset)
        m = re.match(rb"\s*(\d+)\s+(\d+)\s+obj", self.b[lx.i :])
        if not m:
            raise _Bad()
        num = int(m.group(1))
        gen = int(m.group(2))
        if self._crypt_key is not None:
            okey = _std_object_key(self._crypt_key, num, gen)
            lx.decrypt = lambda bs: _rc4(okey, bs)
        lx.i += m.end()
        obj = lx.obj()
        lx._ws()
        if isinstance(obj, dict) and self.b.startswith(b"stream", lx.i):
            lx.i += 6
            if self.b.startswith(b"\r\n", lx.i):
                lx.i += 2
            elif self.b.startswith(b"\n", lx.i):
                lx.i += 1
            else:
                raise _Bad()
            length = self.resolve(obj.get("Length"))
            if not isinstance(length, int) or length < 0:
                raise _Bad()
            data = self.b[lx.i : lx.i + length]
            if len(data) != length:
                raise _Bad()
            lx.i += length
            lx._ws()
            if not self.b.startswith(b"endstream", lx.i):
                raise _Bad()  # /Length does not reach endstream
            if self._crypt_key is not None and obj.get("Type") != "XRef":
                # streams decrypt BEFORE filters apply (encryption is
                # the last thing the writer did); XRef streams are
                # plaintext by spec (they must parse pre-key)
                data = _rc4(_std_object_key(self._crypt_key, num, gen), data)
            obj = ("stream", obj, data)
        return num, obj

    def _objstm(self, stm_num: int) -> dict[int, object]:
        """Load a /Type /ObjStm container into {objnum: obj}. The
        container itself must be a DIRECT (type-1) entry — the spec
        forbids objstm-in-objstm, and the guard also breaks cycles."""
        key = ("objstm", stm_num)
        if key in self._cache:
            return self._cache[key]
        if not isinstance(self.xref.get(stm_num), int):
            raise _Bad()
        obj = self.get(stm_num)
        if not (isinstance(obj, tuple) and obj[0] == "stream"):
            raise _Bad()
        d = obj[1]
        if d.get("Type") != "ObjStm":
            raise _Bad()
        n = self.resolve(d.get("N"))
        first = self.resolve(d.get("First"))
        if not isinstance(n, int) or not isinstance(first, int) or n < 0 or first < 0:
            raise _Bad()
        data = self.stream_data(obj)
        head = _Lexer(data[:first])
        out: dict[int, object] = {}
        pairs = []
        for _ in range(n):
            onum = head.obj()
            ooff = head.obj()
            if not isinstance(onum, int) or not isinstance(ooff, int):
                raise _Bad()
            pairs.append((onum, ooff))
        for onum, ooff in pairs:
            if first + ooff > len(data):
                raise _Bad()
            out[onum] = _Lexer(data, first + ooff).obj()
        self._cache[key] = out
        return out

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        entry = self.xref.get(num)
        if entry is None:
            raise _Bad()
        if isinstance(entry, tuple):  # ('objstm', container, idx)
            objs = self._objstm(entry[1])
            if num not in objs:
                raise _Bad()
            self._cache[num] = objs[num]
            return objs[num]
        got_num, obj = self._parse_indirect(entry)
        if got_num != num:
            raise _Bad()
        self._cache[num] = obj
        return obj

    def _unpredict(self, raw: bytes, parms) -> bytes:
        """Apply the /DecodeParms predictor (shared by Flate and LZW)."""
        if parms is None:
            return raw
        if not isinstance(parms, dict):
            raise _Bad()
        pred = self.resolve(parms.get("Predictor", 1))
        if pred == 1:
            return raw
        if not (isinstance(pred, int) and pred >= 10):
            raise _Bad()  # TIFF predictor 2: declared reject
        cols = self.resolve(parms.get("Columns", 1))
        colors = self.resolve(parms.get("Colors", 1))
        bpc = self.resolve(parms.get("BitsPerComponent", 8))
        if not all(isinstance(x, int) and x > 0 for x in (cols, colors, bpc)):
            raise _Bad()
        if bpc != 8:
            raise _Bad()  # sub-byte predictor rows: declared reject
        return _png_unpredict(raw, cols * colors, colors)

    def _apply_filter(self, name, parms, data: bytes) -> bytes:
        if name == "FlateDecode":
            try:
                raw = zlib.decompress(data)
            except zlib.error:
                raise _Bad()
            return self._unpredict(raw, parms)
        if name == "LZWDecode":
            early = 1
            if isinstance(parms, dict):
                early = self.resolve(parms.get("EarlyChange", 1))
                if early not in (0, 1):
                    raise _Bad()
            return self._unpredict(_lzw_decode(data, early), parms)
        if name == "ASCIIHexDecode":
            return _asciihex_decode(data)
        if name == "ASCII85Decode":
            return _ascii85_decode(data)
        if name == "RunLengthDecode":
            return _runlength_decode(data)
        raise _Bad()  # DCT/JBIG2/JPX/CCITT/Crypt: declared reject

    def stream_data(self, obj) -> bytes:
        if not (isinstance(obj, tuple) and obj[0] == "stream"):
            raise _Bad()
        d, data = obj[1], obj[2]
        filt = self.resolve(d.get("Filter"))
        if filt is None:
            return data
        filters = filt if isinstance(filt, list) else [filt]
        parms = self.resolve(d.get("DecodeParms"))
        if parms is None:
            parms_list: list = [None] * len(filters)
        elif isinstance(parms, list):
            if len(parms) != len(filters):
                raise _Bad()
            parms_list = [self.resolve(p) for p in parms]
        else:
            if len(filters) != 1:
                raise _Bad()  # array Filter needs array DecodeParms
            parms_list = [parms]
        for name, pm in zip(filters, parms_list):
            name = self.resolve(name)
            if not isinstance(name, str):
                raise _Bad()
            data = self._apply_filter(name, pm, data)
        return data

    # --------------------------------------------------- document layer

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer["Root"])
        if not isinstance(root, dict) or root.get("Type") != "Catalog":
            raise _Bad()
        tree = self.resolve(root.get("Pages"))
        out: list[dict] = []
        seen: set[int] = set()

        def walk(node, inherited_res) -> None:
            # /Resources is INHERITABLE down the page tree (ISO 32000-1
            # §7.7.3.4): a Page without its own entry uses the nearest
            # ancestor Pages node's — common in real files
            if not isinstance(node, dict):
                raise _Bad()
            t = node.get("Type")
            if t == "Pages":
                nid = id(node)
                if nid in seen or len(seen) > 1000:
                    raise _Bad()
                seen.add(nid)
                if "Resources" in node:
                    inherited_res = node["Resources"]
                kids = self.resolve(node.get("Kids"))
                if not isinstance(kids, list):
                    raise _Bad()
                for k in kids:
                    walk(self.resolve(k), inherited_res)
            elif t == "Page":
                if "Resources" not in node and inherited_res is not None:
                    node = dict(node)  # don't mutate the cached object
                    node["Resources"] = inherited_res
                out.append(node)
            else:
                raise _Bad()

        walk(tree, None)
        count = self.resolve(tree.get("Count")) if isinstance(tree, dict) else None
        if count != len(out):
            raise _Bad()  # /Count must match the leaves actually found
        return out

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        parts = contents if isinstance(contents, list) else [contents]
        out = []
        for part in parts:
            out.append(self.stream_data(self.resolve(part) if isinstance(part, _Ref) else part))
        return b"\n".join(out)

    def page_fonts(self, page: dict) -> dict | None:
        """Map the page's /Resources /Font names to string decoders:
        None for simple fonts (Latin-1 passthrough), a ToUnicode-CMap
        decoder for Type0/CID fonts. A Type0 font without a usable
        ToUnicode, a non-Identity Encoding, or an unknown Subtype
        rejects the file (mojibake guard)."""
        res = self.resolve(page.get("Resources"))
        if not isinstance(res, dict):
            return None
        fdict = self.resolve(res.get("Font"))
        if not isinstance(fdict, dict):
            return None
        out: dict = {}
        for name, ref in fdict.items():
            fobj = self.resolve(ref)
            if not isinstance(fobj, dict) or fobj.get("Type") != "Font":
                raise _Bad()
            sub = fobj.get("Subtype")
            if sub == "Type0":
                enc = self.resolve(fobj.get("Encoding"))
                if enc not in ("Identity-H", "Identity-V"):
                    raise _Bad()  # predefined CMap encodings: declared reject
                tu = self.resolve(fobj.get("ToUnicode"))
                if not (isinstance(tu, tuple) and tu[0] == "stream"):
                    raise _Bad()  # CID font without ToUnicode: mojibake reject
                dec = _parse_tounicode(self.stream_data(tu))
                if dec.clen != 2:
                    raise _Bad()  # Identity-H/V code units are 2 bytes
                out[name] = dec
            elif sub in ("Type1", "TrueType", "Type3", "MMType1"):
                out[name] = None  # simple font: Latin-1 passthrough
            else:
                raise _Bad()
        return out


# -------------------------------------------------- content-stream text

_LINE_OPS = frozenset(("Td", "TD", "T*", "Tm"))


def _page_text(content: bytes, fonts: dict | None = None) -> list[str]:
    """Interpret the text operators of one page's content stream into
    lines. `fonts` maps /Resources /Font names to decoders (None =
    simple-font Latin-1 passthrough); the `Tf` operator selects the
    active decoder for subsequent shown strings. Raises _Bad on
    structural violations (unterminated string, unbalanced BT/ET,
    inline images, a Tf naming an unknown font)."""
    lx = _Lexer(content)
    stack: list = []
    lines: list[str] = []
    cur: list[str] = []
    in_text = False
    decoder = None  # active font's decoder; None = Latin-1 passthrough

    def shown(s: str) -> str:
        if fonts is None:
            # a page that SHOWS text but has no resolvable /Resources
            # /Font map can't be decoded safely: reject, never guess
            # (the mojibake guard — a Type0 string read as Latin-1
            # would ship NUL-interleaved garbage)
            raise _Bad()
        return s if decoder is None else decoder(s)

    def newline() -> None:
        s = "".join(cur)
        if s:
            lines.append(s)
        cur.clear()

    while True:
        lx._ws()
        if lx.i >= len(content):
            break
        c = content[lx.i]
        if c == 0x28 or c == 0x2F or c == 0x5B or content.startswith(b"<<", lx.i) or c == 0x3C or c in b"+-.0123456789":
            stack.append(lx.obj())
            continue
        op = lx._keyword()
        if not op:
            raise _Bad()
        if op == "BI":
            raise _Bad()  # inline images: declared reject
        if op == "BT":
            if in_text:
                raise _Bad()
            in_text = True
            newline()
        elif op == "ET":
            if not in_text:
                raise _Bad()
            in_text = False
            newline()
        elif op == "Tf":
            if len(stack) < 2 or not isinstance(stack[-2], str):
                raise _Bad()
            if fonts is None:
                raise _Bad()  # Tf with no resolvable /Resources /Font map
            if stack[-2] not in fonts:
                raise _Bad()  # Tf names a font absent from /Resources
            decoder = fonts[stack[-2]]
        elif op == "Tj" and in_text:
            if not stack or not isinstance(stack[-1], str):
                raise _Bad()
            cur.append(shown(stack[-1]))
        elif op == "TJ" and in_text:
            if not stack or not isinstance(stack[-1], list):
                raise _Bad()
            for el in stack[-1]:
                if isinstance(el, str):
                    cur.append(shown(el))
                elif not isinstance(el, (int, float)):
                    raise _Bad()
        elif op in ("'", '"') and in_text:
            if not stack or not isinstance(stack[-1], str):
                raise _Bad()
            newline()
            cur.append(shown(stack[-1]))
        elif op in _LINE_OPS and in_text:
            newline()
        stack.clear()
    if in_text:
        raise _Bad()  # unbalanced BT
    newline()
    return lines


def parse_pdf(payload: bytes) -> dict | None:
    """Extract document text and metadata from a classic PDF:

      n_pages, n_objects (live xref entries), title / author (from
      /Info, Latin-1 simple-string subset), text (content-stream text
      lines joined by newlines, pages in tree order), n_chars, n_words

    Returns None for anything outside the certified subset — see the
    module docstring's declared boundaries."""
    if not isinstance(payload, (bytes, bytearray)) or len(payload) < 16:
        return None
    try:
        doc = _Doc(bytes(payload))
        doc.load()
        pages = doc.pages()
        lines: list[str] = []
        for page in pages:
            lines.extend(_page_text(doc.page_content(page), doc.page_fonts(page)))
        title = author = None
        info = doc.resolve(doc.trailer.get("Info"))
        if isinstance(info, dict):
            t = doc.resolve(info.get("Title"))
            a = doc.resolve(info.get("Author"))
            title = t if isinstance(t, str) else None
            author = a if isinstance(a, str) else None
        text = "\n".join(lines)
        return {
            "n_pages": len(pages),
            "n_objects": len(doc.xref),
            "title": title,
            "author": author,
            "text": text,
            "n_chars": len(text),
            "n_words": len(text.split()),
        }
    except (_Bad, RecursionError):
        return None


# ------------------------------------------------------------- synthesis


def _pdf_n_pages(d: int) -> int:
    return 1 + d % 3


def _pdf_line_words(d: int, p: int, l: int) -> list[str]:
    return [f"p{(d * 7 + p * 5 + l * 3 + j * 2) % 100}" for j in range(2 + (d + p + l) % 3)]


def _pdf_line_text(d: int, p: int, l: int) -> str:
    base = " ".join(_pdf_line_words(d, p, l))
    if p == 0 and l == 0:
        base += " (x)" if d % 2 == 0 else " A"
    return base


def _content_stream(d: int, p: int) -> bytes:
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for l in range(2 + (d + p) % 2):
        if l > 0:
            ops.append("0 -14 Td")
        words = _pdf_line_words(d, p, l)
        if p == 0 and l == 0 and d % 2 == 1:
            # TJ array form: kerning numbers are positioning, not text
            first, rest = words[0], " ".join(words[1:])
            ops.append(f"[({first} ) -250 ({rest})] TJ")
            ops.append("<2041> Tj")  # hex string: ' A'
        else:
            line = " ".join(words)
            if p == 0 and l == 0:
                line += r" \(x\)"  # escaped parens -> literal ' (x)'
            ops.append(f"({line}) Tj")
    ops.append("ET")
    return " ".join(ops).encode("latin-1")


def synth_pdf(doc_id: int) -> bytes:
    """Doc-deterministic classic PDF, built object-by-object with a
    real xref table: 1-3 pages (three-page docs get a NESTED Pages
    tree), per-page Flate-compressed content on odd docs, Tj / TJ /
    escaped-paren / hex-string text forms, and an /Info dict."""
    d = doc_id
    np_ = _pdf_n_pages(d)
    objects: dict[int, bytes] = {}
    # numbering: 1 catalog, 2 pages root, 3 font, 4 info,
    # 5..4+np pages, 5+np..4+2np contents, [5+2np nested Pages node]
    page_nums = [5 + p for p in range(np_)]
    content_nums = [5 + np_ + p for p in range(np_)]
    nested = np_ == 3
    nested_num = 5 + 2 * np_
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    if nested:
        kids = f"[{page_nums[0]} 0 R {nested_num} 0 R]"
        objects[nested_num] = (
            f"<< /Type /Pages /Parent 2 0 R /Kids [{page_nums[1]} 0 R "
            f"{page_nums[2]} 0 R] /Count 2 >>"
        ).encode()
    else:
        kids = "[" + " ".join(f"{n} 0 R" for n in page_nums) + "]"
    objects[2] = f"<< /Type /Pages /Kids {kids} /Count {np_} >>".encode()
    objects[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    objects[4] = f"<< /Title (Doc {d}) /Author (author a{d % 5}) >>".encode()
    for p in range(np_):
        parent = nested_num if (nested and p > 0) else 2
        objects[page_nums[p]] = (
            f"<< /Type /Page /Parent {parent} 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_nums[p]} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >> >>"
        ).encode()
        data = _content_stream(d, p)
        if d % 2 == 1:
            data = zlib.compress(data, 6)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>"
        else:
            head = f"<< /Length {len(data)} >>"
        objects[content_nums[p]] = head.encode() + b"\nstream\n" + data + b"\nendstream"

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    size = max(objects) + 1
    out += f"xref\n0 {size}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, size):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {size} /Root 1 0 R /Info 4 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _synth_std_encrypt(d: int):
    """Doc-deterministic Standard-security-handler parameters: R2/V1
    40-bit on even docs, R3/V2 128-bit on odd — /O from a real owner
    password via Algorithm 3, /U proving the EMPTY user password via
    Algorithm 4/5, and the resulting file key. Returns
    (r, v, nbits, id0, o, u, p, file_key)."""
    r = 2 if d % 2 == 0 else 3
    v = 1 if r == 2 else 2
    nbits = 40 if r == 2 else 128
    klen = nbits // 8
    id0 = hashlib.md5(f"synth-id-{d}".encode()).digest()
    owner_pw = f"owner-{d % 7}".encode()
    opad = (owner_pw + _STD_PAD)[:32]
    h = hashlib.md5(opad).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:klen]
    o = _rc4(okey, _STD_PAD)  # empty USER password, padded
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in okey), o)
    p = -44
    key = _std_file_key(o, p, id0, r, klen)
    if r == 2:
        u = _rc4(key, _STD_PAD)
    else:
        u = _rc4(key, hashlib.md5(_STD_PAD + id0).digest())
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        u = u + bytes(16)  # arbitrary 16-byte pad (ignored by readers)
    return r, v, nbits, id0, o, u, p, key


def synth_pdf_encrypted(doc_id: int, break_u: bool = False) -> bytes:
    """The classic synth_pdf grid ENCRYPTED with the Standard security
    handler and an empty user password: same pages/content arithmetic
    (so the oracle reuses pdf_text_sql's classic form), every string
    written as an RC4-encrypted HEX string and every content stream
    RC4-encrypted AFTER its optional Flate compression, /Encrypt as an
    indirect plaintext dict, /ID in the trailer. `break_u=True` writes
    a corrupted /U — the non-empty-password / garbled-key shape that
    must reject whole."""
    d = doc_id
    r, v, nbits, id0, o, u, p, key = _synth_std_encrypt(d)
    if break_u:
        u = bytes(b ^ 0xA5 for b in u)

    def enc_hex_str(s: str, num: int) -> str:
        ct = _rc4(_std_object_key(key, num, 0), s.encode("latin-1"))
        return "<" + ct.hex() + ">"

    np_ = _pdf_n_pages(d)
    objects: dict[int, bytes] = {}
    page_nums = [5 + p_ for p_ in range(np_)]
    content_nums = [5 + np_ + p_ for p_ in range(np_)]
    nested = np_ == 3
    nested_num = 5 + 2 * np_
    enc_num = nested_num + 1 if nested else 5 + 2 * np_
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    if nested:
        kids = f"[{page_nums[0]} 0 R {nested_num} 0 R]"
        objects[nested_num] = (
            f"<< /Type /Pages /Parent 2 0 R /Kids [{page_nums[1]} 0 R "
            f"{page_nums[2]} 0 R] /Count 2 >>"
        ).encode()
    else:
        kids = "[" + " ".join(f"{n} 0 R" for n in page_nums) + "]"
    objects[2] = f"<< /Type /Pages /Kids {kids} /Count {np_} >>".encode()
    objects[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    objects[4] = (
        f"<< /Title {enc_hex_str(f'Doc {d}', 4)} "
        f"/Author {enc_hex_str(f'author a{d % 5}', 4)} >>"
    ).encode()
    for p_ in range(np_):
        parent = nested_num if (nested and p_ > 0) else 2
        objects[page_nums[p_]] = (
            f"<< /Type /Page /Parent {parent} 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_nums[p_]} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >> >>"
        ).encode()
        data = _content_stream(d, p_)
        if d % 2 == 1:
            data = zlib.compress(data, 6)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>"
        else:
            head = f"<< /Length {len(data)} >>"
        # encryption is the LAST write-side transform: compress, then RC4
        data = _rc4(_std_object_key(key, content_nums[p_], 0), data)
        objects[content_nums[p_]] = head.encode() + b"\nstream\n" + data + b"\nendstream"
    objects[enc_num] = (
        f"<< /Filter /Standard /V {v} /R {r} /Length {nbits} "
        f"/O <{o.hex()}> /U <{u.hex()}> /P {p} >>"
    ).encode()

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    size = max(objects) + 1
    out += f"xref\n0 {size}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, size):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {size} /Root 1 0 R /Info 4 0 R "
        f"/Encrypt {enc_num} 0 R /ID [<{id0.hex()}> <{id0.hex()}>] >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def expected_pdf_encrypted_row(d: int) -> dict:
    """parse_pdf(synth_pdf_encrypted(d)) — the classic expectation
    plus one object (the /Encrypt dict)."""
    row = expected_pdf_row(d)
    row["n_objects"] += 1
    return row


def expected_pdf_row(d: int) -> dict:
    """Pure-arithmetic expectation for parse_pdf(synth_pdf(d)) — the
    Python statement of what PDF_TEXT_ORACLE states in SQL."""
    np_ = _pdf_n_pages(d)
    lines = []
    for p in range(np_):
        for l in range(2 + (d + p) % 2):
            lines.append(_pdf_line_text(d, p, l))
    text = "\n".join(lines)
    return {
        "n_pages": np_,
        "n_objects": 4 + 2 * np_ + (1 if np_ == 3 else 0),
        "title": f"Doc {d}",
        "author": f"author a{d % 5}",
        "text": text,
        "n_chars": len(text),
        "n_words": len(text.split()),
    }


# ----------------------------------------------------- Spark entry points

_COLS = ["n_pages", "n_objects", "title", "author", "text", "n_chars", "n_words"]

_SCHEMA = (
    "doc_id bigint, n_pages int, n_objects int, title string, author string, "
    "text string, n_chars int, n_words int"
)


def pdf_text_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """PDF text extraction over any (id, binary) frame; nulls for
    files outside the certified subset. The `text` column feeds the
    text-curation stack; title/author feed the metadata search stack."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = parse_pdf(bytes(payload)) if payload is not None else None
                row = {id_col: rid}
                row.update({k: (c.get(k) if c else None) for k in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + _COLS)

    return df.mapInPandas(batches, schema=_SCHEMA.replace("doc_id", id_col, 1))


def pdf_text_roundtrip(spark, sf_dir: str):
    """Oracle-checkable PDF extraction: per doc a classic PDF is built
    object-by-object with a real xref table (Flate on odd docs, nested
    Pages tree on 3-page docs, Tj/TJ/escape/hex text forms), read back
    by the real xref -> object -> pages -> content-stream pipeline,
    and the extracted text string itself restated in SQL."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                c = parse_pdf(synth_pdf(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + _COLS)

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_SCHEMA)
        .orderBy("doc_id")
    )


def pdf_text_sql(pages_cte: str, suffix_sql: str | None = None, n_base: int = 4) -> str:
    """The extraction arithmetic as SQL over a `pages(doc_id, e)` CTE
    (e = the synth parameter), shared between PDF_TEXT_ORACLE
    (e = doc_id), the text-harvest oracle, and (with its own
    `suffix_sql` / `n_base`) the CID-font oracle, so every entry
    certifies the SAME restated rules. `suffix_sql` is the p0/l0
    first-line suffix expression over column `e`; `n_base` the
    non-page object count (classic grid 4, CID grid 6 — + ToUnicode
    CMap and descendant font)."""
    if suffix_sql is None:
        suffix_sql = "CASE WHEN e % 2 = 0 THEN ' (x)' ELSE ' A' END"
    return f"""
WITH pdf_pages AS ({pages_cte}),
pg AS (
  SELECT doc_id, e, CAST(1 + e % 3 AS INT) AS n_pages FROM pdf_pages
),
pw AS (
  SELECT g.doc_id, g.e, p.p, l.l, j.j,
         'p' || CAST((g.e * 7 + p.p * 5 + l.l * 3 + j.j * 2) % 100
                     AS VARCHAR) AS word
  FROM pg g, generate_series(0, 2) p(p), generate_series(0, 2) l(l),
       generate_series(0, 3) j(j)
  WHERE p.p < g.n_pages
    AND l.l < 2 + (g.e + p.p) % 2
    AND j.j < 2 + (g.e + p.p + l.l) % 3
),
pline AS (
  SELECT doc_id, e, p, l,
         string_agg(word, ' ' ORDER BY j)
           || CASE WHEN p = 0 AND l = 0
                   THEN {suffix_sql}
                   ELSE '' END AS line
  FROM pw GROUP BY doc_id, e, p, l
),
pdoc AS (
  SELECT doc_id, e, string_agg(line, chr(10) ORDER BY p, l) AS text
  FROM pline GROUP BY doc_id, e
)
SELECT g.doc_id, g.e, g.n_pages,
       CAST({n_base} + 2 * g.n_pages
            + CASE WHEN g.n_pages = 3 THEN 1 ELSE 0 END AS INT) AS n_objects,
       'Doc ' || CAST(g.e AS VARCHAR) AS title,
       'author a' || CAST(g.e % 5 AS VARCHAR) AS author,
       t.text
FROM pg g JOIN pdoc t ON g.doc_id = t.doc_id AND g.e = t.e
"""


PDF_TEXT_ORACLE = f"""
WITH x AS ({pdf_text_sql("SELECT doc_id, doc_id AS e FROM documents")})
SELECT doc_id, n_pages, n_objects, title, author, text,
       CAST(length(text) AS INT) AS n_chars,
       CAST(length(text)
            - length(replace(replace(text, chr(10), ' '), ' ', ''))
            + 1 AS INT) AS n_words
FROM x ORDER BY doc_id
"""


# -------------------------------------------- modern (PDF 1.5+) synthesis


def synth_pdf_modern(doc_id: int) -> bytes:
    """The same document as synth_pdf(doc_id) in MODERN file syntax:
    every non-stream object (catalog, pages nodes, font, info, pages)
    packed into ONE object stream, content streams top-level, and a
    cross-reference STREAM instead of a table — Flate with the PNG Up
    predictor on odd docs, unpredicted on even. Text content is
    byte-identical to the classic file's, so pdf_text_sql restates
    both."""
    d = doc_id
    np_ = _pdf_n_pages(d)
    page_nums = [5 + p for p in range(np_)]
    content_nums = [5 + np_ + p for p in range(np_)]
    nested = np_ == 3
    nested_num = 5 + 2 * np_
    objstm_num = nested_num + 1 if nested else 5 + 2 * np_
    xref_num = objstm_num + 1

    packed: dict[int, bytes] = {1: b"<< /Type /Catalog /Pages 2 0 R >>"}
    if nested:
        kids = f"[{page_nums[0]} 0 R {nested_num} 0 R]"
        packed[nested_num] = (
            f"<< /Type /Pages /Parent 2 0 R /Kids [{page_nums[1]} 0 R "
            f"{page_nums[2]} 0 R] /Count 2 >>"
        ).encode()
    else:
        kids = "[" + " ".join(f"{n} 0 R" for n in page_nums) + "]"
    packed[2] = f"<< /Type /Pages /Kids {kids} /Count {np_} >>".encode()
    packed[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    packed[4] = f"<< /Title (Doc {d}) /Author (author a{d % 5}) >>".encode()
    for p in range(np_):
        parent = nested_num if (nested and p > 0) else 2
        packed[page_nums[p]] = (
            f"<< /Type /Page /Parent {parent} 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_nums[p]} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >> >>"
        ).encode()

    # object stream payload: N (num offset) header pairs, then bodies
    nums = sorted(packed)
    bodies = []
    offs = []
    pos = 0
    for n in nums:
        offs.append((n, pos))
        bodies.append(packed[n])
        pos += len(packed[n]) + 1
    header = " ".join(f"{n} {o}" for n, o in offs).encode() + b"\n"
    stm_payload = header + b"\n".join(bodies) + b"\n"
    first = len(header)
    stm_z = zlib.compress(stm_payload, 6)

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    def emit(num: int, head: str, data: bytes) -> None:
        offsets[num] = len(out)
        out.extend(
            f"{num} 0 obj\n{head}\nstream\n".encode() + data + b"\nendstream\nendobj\n"
        )

    emit(
        objstm_num,
        f"<< /Type /ObjStm /N {len(nums)} /First {first} "
        f"/Length {len(stm_z)} /Filter /FlateDecode >>",
        stm_z,
    )
    for p in range(np_):
        data = _content_stream(d, p)
        data = zlib.compress(data, 6)
        emit(content_nums[p], f"<< /Length {len(data)} /Filter /FlateDecode >>", data)

    # xref stream: W [1 2 1]; type 0 for obj 0, type 2 (objstm, idx)
    # for packed objects, type 1 for contents/objstm/xref itself
    size = xref_num + 1
    xref_off = len(out)
    offsets[xref_num] = xref_off
    rows = bytearray()
    idx_of = {n: i for i, (n, _o) in enumerate(offs)}
    for n in range(size):
        if n == 0:
            rows += bytes([0]) + (0).to_bytes(2, "big") + bytes([255])
        elif n in idx_of:
            rows += bytes([2]) + objstm_num.to_bytes(2, "big") + bytes([idx_of[n]])
        else:
            rows += bytes([1]) + offsets[n].to_bytes(2, "big") + bytes([0])
    if d % 2 == 1:
        # PNG Up predictor over 4-byte rows
        rowlen = 4
        pred_rows = bytearray()
        prev = bytes(rowlen)
        for r in range(0, len(rows), rowlen):
            row = rows[r : r + rowlen]
            pred_rows += bytes([2]) + bytes((row[i] - prev[i]) & 0xFF for i in range(rowlen))
            prev = row
        xdata = zlib.compress(bytes(pred_rows), 6)
        parms = " /DecodeParms << /Predictor 12 /Columns 4 >>"
    else:
        xdata = zlib.compress(bytes(rows), 6)
        parms = ""
    head = (
        f"<< /Type /XRef /Size {size} /W [1 2 1] /Index [0 {size}] "
        f"/Root 1 0 R /Info 4 0 R /Length {len(xdata)} /Filter /FlateDecode{parms} >>"
    )
    out.extend(
        f"{xref_num} 0 obj\n{head}\nstream\n".encode() + xdata + b"\nendstream\nendobj\n"
    )
    out.extend(f"startxref\n{xref_off}\n%%EOF\n".encode())
    return bytes(out)


def pdf_text_modern_roundtrip(spark, sf_dir: str):
    """Oracle-checkable MODERN-PDF extraction: the same documents as
    pdf_text_extract but in PDF 1.5+ file syntax — object streams,
    a cross-reference stream (PNG Up predictor on odd docs) — read
    back through the same pipeline; the text restates via the SAME
    pdf_text_sql fragment, n_objects gains the objstm + xref-stream
    containers (+2)."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                c = parse_pdf(synth_pdf_modern(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + _COLS)

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_SCHEMA)
        .orderBy("doc_id")
    )


# ------------------------------------- CID (Type0) fonts + filter grid

# synth-side encoders for the filter grid (decode-side counterparts
# live at module top); the LZW encoder is the EarlyChange=1 mirror of
# _lzw_decode: it bumps width at next_code == 2^w (its table runs one
# entry AHEAD of the decoder's, which bumps at 2^w - 1)
def _asciihex_encode(data: bytes) -> bytes:
    return data.hex().encode("ascii") + b">"


def _ascii85_encode(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 4):
        grp = data[i : i + 4]
        n = len(grp)
        v = int.from_bytes(grp + b"\x00" * (4 - n), "big")
        if v == 0 and n == 4:
            out += b"z"
            continue
        chars = []
        for _ in range(5):
            chars.append(v % 85)
            v //= 85
        out += bytes(33 + c for c in reversed(chars))[: n + 1]
    return bytes(out) + b"~>"


def _runlength_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (
                j < len(data)
                and j - i < 128
                and not (j + 2 < len(data) and data[j] == data[j + 1] == data[j + 2])
            ):
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    out.append(128)
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((bitbuf >> nbits) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code >= (1 << width) and width < 12:
            width += 1
        w = bytes([b])
        if next_code == 4095:  # clear before the table fills
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
    if w:
        emit(table[w], width)
    emit(257, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _filter_encode(data: bytes, e: int, p: int) -> tuple[bytes, str]:
    """Encode one CID content stream under the grid's 7-way filter
    rotation; returns (encoded, dict-fragment)."""
    enc = (e + p) % 7
    if enc == 0:
        return data, f"/Length {len(data)}"
    if enc == 1:
        z = zlib.compress(data, 6)
        return z, f"/Length {len(z)} /Filter /FlateDecode"
    if enc == 2:
        h = _asciihex_encode(data)
        return h, f"/Length {len(h)} /Filter /ASCIIHexDecode"
    if enc == 3:
        a = _ascii85_encode(data)
        return a, f"/Length {len(a)} /Filter /ASCII85Decode"
    if enc == 4:
        r = _runlength_encode(data)
        return r, f"/Length {len(r)} /Filter /RunLengthDecode"
    if enc == 5:
        lz = _lzw_encode(data)
        return lz, f"/Length {len(lz)} /Filter /LZWDecode"
    chained = _ascii85_encode(zlib.compress(data, 6))
    return chained, f"/Length {len(chained)} /Filter [/ASCII85Decode /FlateDecode]"


_CID_GREEK = {"α": 0xE000, "β": 0xE001, "γ": 0xE002}
_CID_SUFFIX = {0: " α", 1: " βγ", 2: " fifl"}


def _cid_encode(s: str) -> bytes:
    """Encode text to the synth CMap's 2-byte codes: ASCII printable
    identity, Greek via bfchar, fi/fl ligature codes via the
    array-destination bfrange."""
    out = bytearray()
    i = 0
    while i < len(s):
        if s[i : i + 2] == "fi":
            out += (0xE100).to_bytes(2, "big")
            i += 2
        elif s[i : i + 2] == "fl":
            out += (0xE101).to_bytes(2, "big")
            i += 2
        elif s[i] in _CID_GREEK:
            out += _CID_GREEK[s[i]].to_bytes(2, "big")
            i += 1
        else:
            out += ord(s[i]).to_bytes(2, "big")
            i += 1
    return bytes(out)


_CID_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /Synth-UTF def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
1 beginbfrange
<0020> <007E> <0020>
endbfrange
3 beginbfchar
<E000> <03B1>
<E001> <03B2>
<E002> <03B3>
endbfchar
1 beginbfrange
<E100> <E101> [<00660069> <0066006C>]
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end end"""


def _pdf_cid_line_text(e: int, p: int, l: int) -> str:
    base = " ".join(_pdf_line_words(e, p, l))
    if p == 0 and l == 0:
        base += _CID_SUFFIX[e % 3]
    return base


def _cid_content_stream(e: int, p: int) -> bytes:
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for l in range(2 + (e + p) % 2):
        if l > 0:
            ops.append("0 -14 Td")
        codes = _cid_encode(_pdf_cid_line_text(e, p, l)).hex().upper()
        if l == 1:
            mid = (len(codes) // 2) - (len(codes) // 2) % 4  # code boundary
            ops.append(f"[<{codes[:mid]}> -250 <{codes[mid:]}>] TJ")
        else:
            ops.append(f"<{codes}> Tj")
    ops.append("ET")
    return " ".join(ops).encode("latin-1")


def synth_pdf_cid(doc_id: int) -> bytes:
    """Doc-deterministic classic-syntax PDF whose text is shown
    through a Type0 (Identity-H) font with a real /ToUnicode CMap —
    ASCII identity bfrange, Greek bfchar entries, fi/fl ligatures via
    an array-destination bfrange — and whose content streams rotate
    through the full filter grid (none / Flate / ASCIIHex / ASCII85 /
    RunLength / LZW / ASCII85+Flate chain by (doc_id+p)%7); the CMap
    stream itself is Flate on odd docs."""
    d = doc_id
    np_ = _pdf_n_pages(d)
    # 1 catalog, 2 pages root, 3 Type0 font, 4 info, 5 ToUnicode CMap,
    # 6 descendant CIDFont, 7.. pages, 7+np.. contents, [nested last]
    page_nums = [7 + p for p in range(np_)]
    content_nums = [7 + np_ + p for p in range(np_)]
    nested = np_ == 3
    nested_num = 7 + 2 * np_
    objects: dict[int, bytes] = {}
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    if nested:
        kids = f"[{page_nums[0]} 0 R {nested_num} 0 R]"
        objects[nested_num] = (
            f"<< /Type /Pages /Parent 2 0 R /Kids [{page_nums[1]} 0 R "
            f"{page_nums[2]} 0 R] /Count 2 >>"
        ).encode()
    else:
        kids = "[" + " ".join(f"{n} 0 R" for n in page_nums) + "]"
    objects[2] = f"<< /Type /Pages /Kids {kids} /Count {np_} >>".encode()
    objects[3] = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth-CID "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] /ToUnicode 5 0 R >>"
    )
    objects[4] = f"<< /Title (Doc {d}) /Author (author a{d % 5}) >>".encode()
    if d % 2 == 1:
        cmap = zlib.compress(_CID_CMAP, 6)
        chead = f"<< /Length {len(cmap)} /Filter /FlateDecode >>"
    else:
        cmap = _CID_CMAP
        chead = f"<< /Length {len(cmap)} >>"
    objects[5] = chead.encode() + b"\nstream\n" + cmap + b"\nendstream"
    objects[6] = (
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth-CID "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> >>"
    )
    for p in range(np_):
        parent = nested_num if (nested and p > 0) else 2
        objects[page_nums[p]] = (
            f"<< /Type /Page /Parent {parent} 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_nums[p]} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >> >>"
        ).encode()
        data, head = _filter_encode(_cid_content_stream(d, p), d, p)
        objects[content_nums[p]] = f"<< {head} >>".encode() + b"\nstream\n" + data + b"\nendstream"

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    size = max(objects) + 1
    out += f"xref\n0 {size}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, size):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {size} /Root 1 0 R /Info 4 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def expected_pdf_cid_row(d: int) -> dict:
    """Pure-arithmetic expectation for parse_pdf(synth_pdf_cid(d))."""
    np_ = _pdf_n_pages(d)
    lines = []
    for p in range(np_):
        for l in range(2 + (d + p) % 2):
            lines.append(_pdf_cid_line_text(d, p, l))
    text = "\n".join(lines)
    return {
        "n_pages": np_,
        "n_objects": 6 + 2 * np_ + (1 if np_ == 3 else 0),
        "title": f"Doc {d}",
        "author": f"author a{d % 5}",
        "text": text,
        "n_chars": len(text),
        "n_words": len(text.split()),
    }


def pdf_text_cid_roundtrip(spark, sf_dir: str):
    """Oracle-checkable CID-font PDF extraction: per doc a Type0/
    Identity-H document with a real ToUnicode CMap (Greek bfchars,
    fi/fl array bfrange) and the full filter grid on its content
    streams, read back through xref -> fonts -> CMap -> content text,
    the Unicode text restated via the SAME pdf_text_sql fragment."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                c = parse_pdf(synth_pdf_cid(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + _COLS)

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_SCHEMA)
        .orderBy("doc_id")
    )


_CID_SUFFIX_SQL = (
    "CASE e % 3 WHEN 0 THEN ' α' WHEN 1 THEN ' βγ' ELSE ' fifl' END"
)

PDF_TEXT_CID_ORACLE = f"""
WITH x AS ({{cid}})
SELECT doc_id, n_pages, n_objects, title, author, text,
       CAST(length(text) AS INT) AS n_chars,
       CAST(length(text)
            - length(replace(replace(text, chr(10), ' '), ' ', ''))
            + 1 AS INT) AS n_words
FROM x ORDER BY doc_id
""".format(
    cid=pdf_text_sql(
        "SELECT doc_id, doc_id AS e FROM documents",
        suffix_sql=_CID_SUFFIX_SQL,
        n_base=6,
    )
)


PDF_TEXT_MODERN_ORACLE = f"""
WITH x AS ({pdf_text_sql("SELECT doc_id, doc_id AS e FROM documents")})
SELECT doc_id, n_pages,
       CAST(n_objects + 2 AS INT) AS n_objects,
       title, author, text,
       CAST(length(text) AS INT) AS n_chars,
       CAST(length(text)
            - length(replace(replace(text, chr(10), ' '), ' ', ''))
            + 1 AS INT) AS n_words
FROM x ORDER BY doc_id
"""


def pdf_text_encrypted_roundtrip(spark, sf_dir: str):
    """Oracle-checkable ENCRYPTED-PDF extraction (r12): per doc the
    classic grid document re-written under the Standard security
    handler with an EMPTY user password (R2/40-bit on even docs,
    R3/128-bit on odd) — RC4-encrypted strings and content streams,
    real /O derived from an owner password, /U proving the empty user
    password. Read back through key derivation -> user-password
    verification -> per-object RC4 -> the normal xref/content
    pipeline; the text restates via the SAME pdf_text_sql fragment as
    the plaintext grid, so a decryption bug cannot hash-match."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                c = parse_pdf(synth_pdf_encrypted(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + _COLS)

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_SCHEMA)
        .orderBy("doc_id")
    )


# the classic grid + one object (the /Encrypt dict) — n_base 5
PDF_TEXT_ENCRYPTED_ORACLE = f"""
WITH x AS ({pdf_text_sql("SELECT doc_id, doc_id AS e FROM documents", n_base=5)})
SELECT doc_id, n_pages, n_objects, title, author, text,
       CAST(length(text) AS INT) AS n_chars,
       CAST(length(text)
            - length(replace(replace(text, chr(10), ' '), ' ', ''))
            + 1 AS INT) AS n_words
FROM x ORDER BY doc_id
"""
