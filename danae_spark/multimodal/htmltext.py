"""HTML -> training-text extraction: the single highest-volume text
transform in a crawl pipeline.

Web crawls deliver HTML, not text: before any quality filter, dedup
pass, or token count can run, each page must be reduced to its visible
prose. This module implements that reduction from scratch over the
bytes (no html.parser dependency on lenient mode-recovery semantics we
can't certify), with the exact rules stated so the oracle can restate
the extracted string:

  - Tag scanner: `<name attr="v">` with quote-aware attribute scanning
    (a `>` inside a quoted attribute value does not end the tag),
    `<!-- -->` comments, `<!DOCTYPE>` declarations, self-closing tags,
    case-insensitive names.
  - Raw-text elements: `script` and `style` content is skipped up to
    the matching case-insensitive close tag — `<` and even literal
    `"</div>"` strings inside JavaScript never reach the text stream.
  - Boilerplate drop: `nav`, `header`, `footer`, `aside` subtrees are
    removed whole (nesting-tracked); `head` content is dropped except
    `<title>`, which is captured separately.
  - Block structure: block-level elements (p, div, h1-h6, ul/ol/li,
    table/tr/td/th, blockquote, pre, br, hr, section, article, main,
    figure, form, dl/dt/dd) delimit output lines; inline elements
    (a, b, i, em, strong, span, code, small, u, sub, sup, mark, abbr)
    do not. Within a line, whitespace runs collapse to single spaces;
    empty lines are dropped; lines join with '\n'.
  - Entities: named (amp lt gt quot apos nbsp) and numeric
    (`&#NN;` / `&#xHH;`) decode; an unrecognized `&foo;` stays
    literal (browser behavior — crawl HTML is full of them).
  - Link accounting: n_links counts every `<a>` open tag in the
    document; link_chars counts extracted-text characters inside
    anchors within KEPT content (each anchor's text measured after
    whitespace collapse); link_density = link_chars / n_chars — the
    classic boilerplate signal a curation pipeline thresholds on.

Reject-whole (return None): undecodable UTF-8, `<` at EOF, an
unterminated comment / tag / raw-text element, or a close tag for a
drop-element that was never opened — a page whose structure cannot be
walked must not silently contribute half-extracted text to a corpus.

Reference parity note: the reference (smartdatalake/danae) ingests
tabular files only (profiler.py routes csv/parquet; everything else is
"Unsupported"); HTML extraction is mandated LLM-pipeline extension
surface (the text source feeding the quality/dedup/token stack).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

__all__ = [
    "parse_html_text",
    "synth_html",
    "html_text_frame",
    "html_text_roundtrip",
    "HTML_TEXT_ORACLE",
]

_BLOCK = frozenset(
    """p div h1 h2 h3 h4 h5 h6 ul ol li table tr td th blockquote pre br hr
    section article main figure figcaption form fieldset legend address
    dl dt dd body html""".split()
)
_DROP = frozenset("nav header footer aside head".split())
_RAWTEXT = frozenset(("script", "style"))
_VOID = frozenset("br hr meta link img input area base col embed source track wbr".split())
_INLINE_HEADINGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))

_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'", "nbsp": " "}
_ENT_RE = re.compile(r"&(#x[0-9a-fA-F]{1,6}|#[0-9]{1,7}|[a-zA-Z][a-zA-Z0-9]{0,31});")
# tag names: HTML names plus the XML name chars the feed/sitemap walks
# need — ':' (namespaces, <rdf:RDF>), '-' (custom elements), '_', '.'
_NAME_RE = re.compile(r"[a-zA-Z_][a-zA-Z0-9:._-]*")


def _decode_entities(s: str) -> str:
    def sub(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            cp = int(body[2:], 16)
        elif body.startswith("#"):
            cp = int(body[1:])
        else:
            return _ENTITIES.get(body.lower(), m.group(0))
        if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            return chr(cp)
        return m.group(0)

    return _ENT_RE.sub(sub, s)


def _scan_tag(text: str, pos: int) -> tuple[str, bool, bool, dict, int] | None:
    """Scan a tag starting at `pos` (which points at '<'). Returns
    (name, is_close, self_closing, attrs, end_pos_after_gt) or None on
    a malformed/unterminated tag. Attribute names lowercase; first
    occurrence wins; quoted values may contain '>'."""
    i = pos + 1
    n = len(text)
    is_close = False
    if i < n and text[i] == "/":
        is_close = True
        i += 1
    m = _NAME_RE.match(text, i)
    if not m:
        return None
    name = m.group(0).lower()
    i = m.end()
    attrs: dict[str, str] = {}
    self_closing = False
    while True:
        while i < n and text[i] in " \t\r\n":
            i += 1
        if i >= n:
            return None  # EOF inside tag
        c = text[i]
        if c == ">":
            return name, is_close, self_closing, attrs, i + 1
        if c == "/":
            self_closing = True
            i += 1
            continue
        if c in "\"'":  # anonymous quoted token: skip it whole
            j = text.find(c, i + 1)
            if j == -1:
                return None
            i = j + 1
            self_closing = False
            continue
        start = i
        while i < n and text[i] not in " \t\r\n=>/\"'":
            i += 1
        aname = text[start:i].lower()
        if not aname:  # stray '=' or other delimiter: consume it
            i += 1
            self_closing = False
            continue
        while i < n and text[i] in " \t\r\n":
            i += 1
        val = ""
        if i < n and text[i] == "=":
            i += 1
            while i < n and text[i] in " \t\r\n":
                i += 1
            if i < n and text[i] in "\"'":
                q = text[i]
                j = text.find(q, i + 1)
                if j == -1:
                    return None
                val = text[i + 1 : j]
                i = j + 1
            else:
                start = i
                while i < n and text[i] not in " \t\r\n>":
                    i += 1
                val = text[start:i]
        attrs.setdefault(aname, val)
        self_closing = False


_CHARSET_DECL = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?|content\s*=\s*["'][^"']*charset=)"""
    rb"""([A-Za-z0-9_.:-]+)""",
    re.IGNORECASE,
)
# WHATWG Encoding Standard label -> Python stdlib codec. Covers every
# encoding in the WHATWG set that the stdlib implements (all of them
# except x-user-defined and the deliberate 'replacement' family) —
# https://encoding.spec.whatwg.org/ "Names and labels". Notable WHATWG
# aliasing: latin-1/ascii-family labels mean windows-1252 on the web;
# iso-8859-9 means windows-1254; iso-8859-11/tis-620 mean windows-874;
# Shift_JIS means windows-31j (cp932); EUC-KR means windows-949
# (cp949); every GBK label decodes with gb18030's decoder.


def _build_legacy_charsets() -> dict[str, str]:
    m: dict[str, str] = {}

    def put(codec: str, *labels: str) -> None:
        for lbl in labels:
            m[lbl] = codec

    put("utf-8", "utf-8", "utf8", "unicode-1-1-utf-8", "unicode11utf8",
        "unicode20utf8", "x-unicode20utf8")
    put("windows-1252", "windows-1252", "cp1252", "x-cp1252", "iso-8859-1",
        "iso8859-1", "iso_8859-1", "iso88591", "latin-1", "latin1", "l1",
        "csisolatin1", "iso-ir-100", "ibm819", "ansi_x3.4-1968")
    put("ascii", "us-ascii", "ascii")  # stricter than WHATWG's 1252 alias
    put("cp866", "ibm866", "866", "cp866", "csibm866")
    for i in (2, 3, 4, 5, 6, 7, 8, 10, 13, 14, 15, 16):
        put(f"iso8859-{i}", f"iso-8859-{i}", f"iso8859-{i}", f"iso_8859-{i}",
            f"iso8859{i}")
    put("iso8859-8", "iso-8859-8-i", "csiso88598i", "logical", "hebrew",
        "visual", "csisolatinhebrew")
    # bare script-name labels belong to the ISO-8859 family per the
    # WHATWG "Names and labels" table — NOT to the windows-125x pages
    # (different byte layouts; mapping them to windows would mojibake
    # every page that declares the bare label)
    put("iso8859-5", "cyrillic", "csisolatincyrillic", "iso-ir-144")
    put("iso8859-7", "greek", "greek8", "csisolatingreek", "ecma-118",
        "elot_928", "iso-ir-126", "sun_eu_greek")
    put("iso8859-6", "arabic", "csisolatinarabic", "ecma-114", "asmo-708",
        "iso-ir-127", "iso-8859-6-e", "iso-8859-6-i", "csiso88596e",
        "csiso88596i")
    put("windows-1254", "iso-8859-9", "iso8859-9", "iso_8859-9", "latin5")
    put("cp874", "windows-874", "dos-874", "tis-620", "iso-8859-11",
        "iso8859-11", "iso_8859-11")
    put("koi8-r", "koi8-r", "koi8_r", "koi8", "koi", "cskoi8r")
    put("koi8-u", "koi8-u", "koi8-ru")
    put("mac-roman", "macintosh", "x-mac-roman", "mac", "csmacintosh")
    put("mac-cyrillic", "x-mac-cyrillic", "x-mac-ukrainian")
    for i in (1250, 1251, 1253, 1255, 1256, 1257, 1258):
        put(f"windows-{i}", f"windows-{i}", f"cp{i}", f"x-cp{i}")
    put("windows-1254", "windows-1254", "cp1254", "x-cp1254")
    put("windows-1252", "windows-1252", "cp1252", "x-cp1252")
    put("gb18030", "gb18030", "gbk", "gb2312", "gb_2312", "gb_2312-80",
        "chinese", "csgb2312", "csiso58gb231280", "iso-ir-58", "x-gbk")
    put("big5hkscs", "big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5")
    put("euc_jp", "euc-jp", "x-euc-jp", "cseucpkdfmtjapanese")
    put("iso2022_jp", "iso-2022-jp", "csiso2022jp")
    put("cp932", "shift_jis", "shift-jis", "sjis", "x-sjis", "ms_kanji",
        "ms932", "windows-31j", "csshiftjis")
    put("cp949", "euc-kr", "korean", "ks_c_5601-1987", "ks_c_5601-1989",
        "ksc_5601", "ksc5601", "iso-ir-149", "csksc56011987", "cseuckr",
        "windows-949")
    # WHATWG: the "utf-16"/"ucs-2" labels select the UTF-16LE decoder;
    # BOM'd pages never reach the label path (_decode_page BOM-sniffs
    # first, which routes AND strips either endianness), so the label
    # decode below only ever sees BOM-less payloads — those run through
    # the swapped-endianness gate (_utf16_swapped) before shipping
    put("utf-16-le", "utf-16", "utf-16le", "ucs-2")
    put("utf-16-be", "utf-16be")
    return m


_LEGACY_CHARSETS = _build_legacy_charsets()


def _fallback_gibberish(text: str) -> bool:
    """Sanity gate on the UNDECLARED-charset windows-1252 fallback: a
    page whose true encoding was a multibyte legacy code (EUC-JP, GBK,
    EUC-KR, ...) often still 'decodes' under cp1252 — into dense runs
    of high-byte letters and symbols no real Latin-script page has
    (every multibyte character becomes 2+ consecutive chars > 0x7F).
    WHATWG tells browsers to render that; a corpus engine rejects it
    instead of shipping mojibake into training text. Real windows-1252
    prose keeps accented letters ISOLATED (run length 1-3) and mostly
    alphabetic — both signals are checked over the first 4 KiB."""
    sample = text[:4096]
    hi = sym = run = best = 0
    for c in sample:
        if ord(c) > 0x7F:
            hi += 1
            run += 1
            if run > best:
                best = run
            if not c.isalpha() and not c.isspace() and c not in _HI_PUNCT_OK:
                sym += 1
        else:
            run = 0
    if best >= 6:
        return True  # a 3+ multibyte-char run: not Latin prose
    return hi >= 8 and sym * 2 > hi


# high-byte punctuation common in GENUINE windows-1252 text
_HI_PUNCT_OK = frozenset("‘’“”–—…·€«»°©®™¡¿")


def _utf16_swapped(text: str) -> bool:
    """Mojibake gate for BOM-LESS utf-16 label decodes: big-endian
    bytes read with the LE decoder (or vice versa) byte-swap every
    code point, so the structural char every HTML page must contain —
    '<' U+003C — becomes U+3C00. Weigh the STRUCTURAL chars, not the
    text body (r14, was a global U+XX00-plurality count): a genuine
    BOM-less UTF-16 page whose prose is dominated by U+xx00 points
    (Hangul syllables like U+AC00) still decodes its markup to real
    '<', while a swapped page has NO genuine '<' and at least one
    U+3C00 regardless of how CJK-dense its prose is. Swapped iff the
    byte-swapped form of '<' outnumbers the real one; reject instead
    of shipping CJK-looking garbage (WHATWG renders it; a corpus
    engine must not)."""
    sample = text[:4096]
    if not sample:
        return False
    swapped = sample.count("㰀")
    return swapped > 0 and swapped > sample.count("<")


def _looks_binary(payload: bytes) -> bool:
    """Guard for the undeclared-charset fallback: a NUL byte or >2%
    C0 control characters (excluding tab/LF/FF/CR) in the first 4 KiB
    says 'not text' — windows-1252 would happily 'decode' a JPEG."""
    sample = payload[:4096]
    if not sample:
        return False
    if b"\x00" in sample:
        return True
    ctrl = sum(1 for c in sample if c < 0x20 and c not in (9, 10, 12, 13))
    return ctrl > len(sample) * 0.02


def _decode_page(payload: bytes, header_charset: str | None = None) -> str | None:
    """Decode an HTML payload following WHATWG precedence:

      1. a byte-order mark outranks EVERYTHING (WHATWG "BOM sniffing"):
         EF BB BF -> UTF-8, FF FE -> UTF-16LE, FE FF -> UTF-16BE,
         decode failure rejects;
      2. a transport-layer charset (the HTTP Content-Type `charset=`
         parameter) OUTRANKS any in-document meta declaration — when
         given, it is used directly (unknown names or decode failures
         reject; no second-guessing a server that declared wrongly);
      3. otherwise UTF-8 is tried first;
      4. then a declared legacy charset (<meta charset=...> or
         http-equiv content=...charset=...) from the WHATWG-mapped
         set above;
      5. undeclared non-UTF-8 content falls back to windows-1252 —
         WHATWG's default for undeclared content and the long tail of
         real crawls — GUARDED by a binary sniff (_looks_binary), so
         actual binary never 'decodes'."""
    for bom, codec in ((b"\xef\xbb\xbf", "utf-8"), (b"\xff\xfe", "utf-16-le"),
                       (b"\xfe\xff", "utf-16-be")):
        if payload[: len(bom)] == bom:
            try:
                return payload[len(bom) :].decode(codec)
            except UnicodeDecodeError:
                return None
    if header_charset is not None:
        codec = _LEGACY_CHARSETS.get(header_charset.lower())
        if codec is None:
            return None  # unknown transport charset: reject, don't guess
        try:
            text = payload.decode(codec)
        except (UnicodeDecodeError, ValueError):
            return None
        if codec in ("utf-16-le", "utf-16-be") and _utf16_swapped(text):
            return None  # BOM-less page whose bytes are the OTHER endianness
        return text
    try:
        return payload.decode("utf-8")
    except (UnicodeDecodeError, AttributeError):
        pass
    m = _CHARSET_DECL.search(payload[:4096])
    if m:
        codec = _LEGACY_CHARSETS.get(m.group(1).decode("ascii", "replace").lower())
        if codec is None or codec in ("utf-8", "utf-16-le", "utf-16-be"):
            # declared utf-8 but invalid utf-8: corrupt page (WHATWG
            # folds meta utf-16 declarations into utf-8 too)
            return None
        try:
            return payload.decode(codec)
        except (UnicodeDecodeError, ValueError):
            return None
    if _looks_binary(payload):
        return None
    try:
        text = payload.decode("windows-1252")
    except UnicodeDecodeError:
        return None  # 0x81/0x8D/0x8F/0x90/0x9D: undefined in cp1252
    if _fallback_gibberish(text):
        return None  # an undeclared multibyte page: reject, don't pollute
    return text


def parse_html_text(
    payload: bytes,
    header_charset: str | None = None,
    drop_boilerplate: bool = False,
) -> dict | None:
    """Extract the visible training text from an HTML payload.

    Returns {title, text, n_chars, n_words, n_links, n_headings,
    n_paragraphs, n_list_items, link_density} or None when the page
    cannot be walked (see module docstring for the reject contract).
    `header_charset` is the HTTP Content-Type charset parameter when
    the page arrived over HTTP (it outranks meta per WHATWG); decode
    precedence and the guarded windows-1252 fallback for undeclared
    pages live in _decode_page.

    `drop_boilerplate=True` (r12) adds the per-BLOCK classification of
    the jusText/Boilerpipe family over the block structure the walk
    already builds: a block is boilerplate when MORE THAN HALF its
    characters sit inside anchors (link farms in undifferentiated
    <div>s the nav/header/footer rule can't see), or when it is a
    short (<5 words) linky stub ("read more", pager links). Dropped
    blocks leave text / n_chars / n_words / link_density, and the
    result gains n_blocks_kept / n_blocks_dropped; the page-level
    counters (n_links, n_headings, ...) stay page-level."""
    text = _decode_page(payload, header_charset)
    if text is None:
        return None

    n = len(text)
    pos = 0
    blocks: list[tuple[str, int]] = []  # (collapsed text, anchor chars)
    cur: list[str] = []
    drop_depth = 0  # nesting depth inside nav/header/footer/aside/head
    drop_stack: list[str] = []
    title: str | None = None
    in_title = False
    anchor: list[str] | None = None  # open <a> capture buffer (kept content)
    n_links = n_headings = n_paragraphs = n_list_items = 0
    link_chars = 0
    block_link = 0  # anchor chars attributed to the CURRENT block

    def flush() -> None:
        nonlocal cur, block_link
        s = " ".join("".join(cur).split())
        if s:
            blocks.append((s, block_link))
        cur = []
        block_link = 0

    def close_anchor() -> None:
        nonlocal anchor, link_chars, block_link
        if anchor is not None:
            got = len(" ".join("".join(anchor).split()))
            link_chars += got
            block_link += got
            anchor = None

    while pos < n:
        lt = text.find("<", pos)
        if lt == -1:
            chunk = text[pos:]
            pos = n
        else:
            chunk = text[pos:lt]
            pos = lt
        if chunk:
            if in_title:
                title = (title or "") + chunk
            elif drop_depth == 0:
                decoded = _decode_entities(chunk)
                cur.append(decoded)
                if anchor is not None:
                    anchor.append(decoded)
        if pos >= n:
            break
        # pos is at '<'
        if text.startswith("<!--", pos):
            end = text.find("-->", pos + 4)
            if end == -1:
                return None  # unterminated comment
            pos = end + 3
            continue
        if text.startswith("<!", pos) or text.startswith("<?", pos):
            end = text.find(">", pos + 2)
            if end == -1:
                return None
            pos = end + 1
            continue
        tag = _scan_tag(text, pos)
        if tag is None:
            return None  # malformed or EOF inside tag / stray '<'
        name, is_close, self_closing, _attrs, pos = tag

        if name in _RAWTEXT and not is_close:
            if self_closing:
                continue
            close_re = re.compile(rf"</{name}\s*>", re.IGNORECASE)
            m = close_re.search(text, pos)
            if not m:
                return None  # unterminated raw-text element
            pos = m.end()
            continue

        if name == "title":
            if not is_close:
                in_title = True
                if title is None:
                    title = ""
            else:
                in_title = False
                if title is not None:
                    title = " ".join(title.split())
            continue

        if name in _DROP:
            if not is_close and not self_closing:
                drop_stack.append(name)
                drop_depth += 1
            elif is_close:
                if not drop_stack or drop_stack[-1] != name:
                    return None  # close without matching open
                drop_stack.pop()
                drop_depth -= 1
            flush()
            continue

        if name == "a":
            if not is_close:
                n_links += 1
                if drop_depth == 0:
                    close_anchor()
                    anchor = []
            else:
                close_anchor()
            continue

        if drop_depth == 0 and not is_close:
            if name in _INLINE_HEADINGS:
                n_headings += 1
            elif name == "p":
                n_paragraphs += 1
            elif name == "li":
                n_list_items += 1

        if name in _BLOCK:
            close_anchor()
            flush()
        # inline elements: no effect on the text stream

    if drop_stack or in_title:
        return None  # unterminated drop element or title
    close_anchor()
    flush()

    kept = blocks
    n_dropped = 0
    if drop_boilerplate:
        kept = []
        for s, bl in blocks:
            if is_boilerplate_block(s, bl):
                n_dropped += 1
            else:
                kept.append((s, bl))

    full = "\n".join(s for s, _ in kept)
    n_chars = len(full)
    eff_link = sum(bl for _, bl in kept) if drop_boilerplate else link_chars
    out = {
        "title": title or "",
        "text": full,
        "n_chars": n_chars,
        "n_words": len(full.split()),
        "n_links": n_links,
        "n_headings": n_headings,
        "n_paragraphs": n_paragraphs,
        "n_list_items": n_list_items,
        "link_density": (eff_link / n_chars) if n_chars else 0.0,
    }
    if drop_boilerplate:
        out["n_blocks_kept"] = len(kept)
        out["n_blocks_dropped"] = n_dropped
    return out


def is_boilerplate_block(s: str, anchor_chars: int) -> bool:
    """The per-block keep rule (jusText/Boilerpipe family, structural
    form): boilerplate iff anchors cover MORE THAN HALF the block's
    characters, or the block is a short (<5 words) stub containing any
    anchor text at all."""
    if anchor_chars * 2 > len(s):
        return True
    return len(s.split()) < 5 and anchor_chars > 0


# ------------------------------------------------------------- synthesis


def _n_paras(d: int) -> int:
    return 2 + d % 4


def _n_items(d: int) -> int:
    return 1 + d % 3


def _para_words(d: int, i: int) -> list[str]:
    return [f"w{(d * 7 + i * 5 + j * 3) % 100}" for j in range(3 + (d + i) % 3)]


def synth_html(doc_id: int) -> bytes:
    """Doc-deterministic HTML page exercising every extraction rule:
    head with title/meta/style, a script whose body contains `<` and a
    close-tag lookalike string, a nav boilerplate block (3 links,
    dropped), an h1, paragraphs with inline anchors (even i) and
    entities (i % 3 == 0), a ul, and a footer (dropped)."""
    d = doc_id
    out = [
        "<!DOCTYPE html>",
        '<html lang="en">',
        "<head>",
        f"  <title>Doc {d} t{d % 10}</title>",
        '  <meta charset="utf-8"/>',
        f'  <link rel="canonical" href="{_messy_canonical(d)}">',
        f'  <meta name="description" content="desc w{d % 9} &amp; more">',
        f'  <meta property="og:title" content="Doc {d} t{d % 10}">',
        "  <style>body { color: #222; } /* < not a tag */</style>",
        '  <script type="text/javascript">',
        '    if (a < b) { x = "</div" + ">"; } // raw-text rules',
        "  </script>",
        "</head>",
        "<body>",
        "  <nav>",
        f'    <a href="/">home</a> <a href="/about?x=1&amp;y=2">about</a>',
        f'    <a href="/p{d}">self</a>',
        "  </nav>",
        "  <!-- deterministic fixture -->",
        f"  <h1>heading h{d % 7}</h1>",
    ]
    for i in range(_n_paras(d)):
        words = _para_words(d, i)
        parts = []
        for j, w in enumerate(words):
            if i % 2 == 0 and j == 1:
                parts.append(f'<a href="/p{d}/{i}" title="x > y">{w}</a>')
            else:
                parts.append(w)
        line = " ".join(parts)
        if i % 3 == 0:
            line += " &amp; x&#33;"
        out.append(f"  <p>{line}</p>")
    out.append("  <ul>")
    for k in range(_n_items(d)):
        out.append(f"    <li>item k{(d + k) % 9}</li>")
    out.append("  </ul>")
    out.append(f"  <footer><p>copyright f{d % 4}</p></footer>")
    out.append("</body>")
    out.append("</html>")
    return "\n".join(out).encode("utf-8")


def expected_html_row(d: int) -> dict:
    """Pure-arithmetic expectation for parse_html_text(synth_html(d)) —
    the Python statement of exactly what HTML_TEXT_ORACLE states in
    SQL (pytest pins the three-way agreement)."""
    lines = [f"heading h{d % 7}"]
    link_chars = 0
    for i in range(_n_paras(d)):
        words = _para_words(d, i)
        if i % 2 == 0:
            link_chars += len(words[1])
        line = " ".join(words)
        if i % 3 == 0:
            line += " & x!"
        lines.append(line)
    for k in range(_n_items(d)):
        lines.append(f"item k{(d + k) % 9}")
    text = "\n".join(lines)
    return {
        "title": f"Doc {d} t{d % 10}",
        "text": text,
        "n_chars": len(text),
        "n_words": len(text.split()),
        "n_links": 3 + (_n_paras(d) + 1) // 2,
        "n_headings": 1,
        "n_paragraphs": _n_paras(d),
        "n_list_items": _n_items(d),
        "link_density": link_chars / len(text),
    }


# ------------------------------------------- boilerplate fixtures (r12)


def _n_boiler_paras(d: int) -> int:
    return 2 + d % 3


def synth_boiler_html(doc_id: int, mirror: bool = False) -> bytes:
    """Doc-deterministic page for the per-BLOCK boilerplate rule:
    prose paragraphs (kept — the same _para_words arithmetic the main
    grid uses) plus a link-farm <div> (anchors only: density 1) and a
    short 'more' stub <div> — both in undifferentiated divs the
    nav/header/footer rule cannot see, both dropped by the block rule.
    The mirror variant swaps the FARM words only, so after boilerplate
    stripping main and mirror captures become byte-identical — the
    property crawl_curate_boiler's dedup stage certifies."""
    d = doc_id
    off = 17 if mirror else 0
    out = [
        "<!DOCTYPE html>",
        "<html>",
        f"<head><title>B{d % 10} doc {d}</title></head>",
        "<body>",
    ]
    for i in range(_n_boiler_paras(d)):
        out.append(f"  <p>{' '.join(_para_words(d, i))}</p>")
    farm = " ".join(
        f'<a href="/x{j}">z{(d * 3 + j + off) % 50}</a>' for j in range(4 + d % 3)
    )
    out.append(f"  <div>{farm}</div>")
    out.append(f'  <div><a href="/more">more m{(d + off) % 5}</a></div>')
    out.append("</body>")
    out.append("</html>")
    return "\n".join(out).encode("utf-8")


def expected_boiler_row(d: int) -> dict:
    """parse_html_text(synth_boiler_html(d), drop_boilerplate=True) —
    prose only; the farm and the stub are gone."""
    lines = [" ".join(_para_words(d, i)) for i in range(_n_boiler_paras(d))]
    text = "\n".join(lines)
    return {
        "title": f"B{d % 10} doc {d}",
        "text": text,
        "n_chars": len(text),
        "n_words": len(text.split()),
        "n_blocks_kept": _n_boiler_paras(d),
        "n_blocks_dropped": 2,
    }


def boiler_text_sql(pages_cte: str) -> str:
    """The boilerplate-STRIPPED extraction arithmetic as SQL over a
    `pages(doc_id, e)` CTE — prose paragraphs only (the same
    _para_words formula), shared between HTML_BOILER_ORACLE and the
    crawl_curate_boiler composition."""
    return f"""
WITH bp AS ({pages_cte}),
bw AS (
  SELECT g.doc_id, g.e, i.i, j.j,
         'w' || CAST((g.e * 7 + i.i * 5 + j.j * 3) % 100 AS VARCHAR) AS word
  FROM bp g, generate_series(0, 4) i(i), generate_series(0, 5) j(j)
  WHERE i.i < 2 + g.e % 3 AND j.j < 3 + (g.e + i.i) % 3
),
bl AS (
  SELECT doc_id, e, i, string_agg(word, ' ' ORDER BY j) AS line
  FROM bw GROUP BY doc_id, e, i
),
bd AS (
  SELECT doc_id, e, string_agg(line, chr(10) ORDER BY i) AS text
  FROM bl GROUP BY doc_id, e
)
SELECT doc_id, e, text FROM bd
"""


HTML_BOILER_ORACLE = f"""
WITH x AS ({boiler_text_sql("SELECT doc_id, doc_id AS e FROM documents")})
SELECT doc_id,
       'B' || CAST(doc_id % 10 AS VARCHAR) || ' doc '
         || CAST(doc_id AS VARCHAR) AS title,
       text,
       CAST(length(text) AS INT) AS n_chars,
       CAST(length(text)
            - length(replace(replace(text, chr(10), ' '), ' ', ''))
            + 1 AS INT) AS n_words,
       CAST(2 + doc_id % 3 AS INT) AS n_blocks_kept,
       CAST(2 AS INT) AS n_blocks_dropped
FROM x ORDER BY doc_id
"""


def html_boilerplate_roundtrip(spark, sf_dir: str):
    """Oracle-certified block-level boilerplate classification: per doc
    the planted-boilerplate page (prose + link-farm div + linky stub)
    extracts with drop_boilerplate=True and the KEPT STRING — prose
    only — value-checks against SQL arithmetic, with the block
    keep/drop counts."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    cols = ["title", "text", "n_chars", "n_words", "n_blocks_kept", "n_blocks_dropped"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                c = parse_html_text(synth_boiler_html(d), drop_boilerplate=True)
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in cols})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + cols)

    schema = (
        "doc_id bigint, title string, text string, n_chars int, n_words int, "
        "n_blocks_kept int, n_blocks_dropped int"
    )
    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=schema)
        .orderBy("doc_id")
    )


# ----------------------------------------------------- Spark entry points

_COLS = [
    "title",
    "text",
    "n_chars",
    "n_words",
    "n_links",
    "n_headings",
    "n_paragraphs",
    "n_list_items",
    "link_density",
]

_SCHEMA = (
    "doc_id bigint, title string, text string, n_chars int, n_words int, "
    "n_links int, n_headings int, n_paragraphs int, n_list_items int, "
    "link_density double"
)


def html_text_frame(
    df,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    drop_boilerplate: bool = False,
):
    """HTML text extraction over any (id, binary) frame; nulls for
    pages that cannot be walked. The `text` column feeds the
    quality/dedup/token-count stack; `link_density` is the boilerplate
    threshold signal. `drop_boilerplate=True` applies the per-block
    keep rule (is_boilerplate_block) and adds the kept/dropped block
    counts to the schema."""
    cols = _COLS + (["n_blocks_kept", "n_blocks_dropped"] if drop_boilerplate else [])
    schema = _SCHEMA.replace("doc_id", id_col, 1)
    if drop_boilerplate:
        schema += ", n_blocks_kept int, n_blocks_dropped int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = (
                    parse_html_text(bytes(payload), drop_boilerplate=drop_boilerplate)
                    if payload is not None
                    else None
                )
                row = {id_col: rid}
                row.update({k: (c.get(k) if c else None) for k in cols})
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + cols)

    return df.mapInPandas(batches, schema=schema)


def html_text_roundtrip(spark, sf_dir: str):
    """Oracle-checkable HTML extraction: per doc a full page is
    synthesized byte-for-byte (script/style raw text, comments,
    entities, nav/footer boilerplate, inline anchors), walked by the
    real scanner, and EVERYTHING — the title and the extracted text
    string itself included — is restated in SQL, so the value hash
    covers the exact prose the curation stack would consume."""
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
                c = parse_html_text(synth_html(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + _COLS)

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_SCHEMA)
        .orderBy("doc_id")
    )


def html_text_sql(pages_cte: str) -> str:
    """The extraction arithmetic as SQL over a `pages(doc_id, e)` CTE
    (e = the synth parameter), shared between HTML_TEXT_ORACLE
    (e = doc_id) and the crawl-pipeline oracle (e = doc_id*4 + p) so
    the two entries certify the SAME restated rules."""
    return f"""
WITH pages AS ({pages_cte}),
para_words AS (
  SELECT p.doc_id, p.e, c.i AS para, j.j AS wi,
         'w' || CAST((p.e * 7 + c.i * 5 + j.j * 3) % 100 AS VARCHAR) AS word
  FROM pages p, generate_series(0, 5) c(i), generate_series(0, 4) j(j)
  WHERE c.i < 2 + p.e % 4 AND j.j < 3 + (p.e + c.i) % 3
),
para_lines AS (
  SELECT doc_id, e, para,
         string_agg(word, ' ' ORDER BY wi)
           || CASE WHEN para % 3 = 0 THEN ' & x!' ELSE '' END AS line,
         CASE WHEN para % 2 = 0
              THEN length(max(CASE WHEN wi = 1 THEN word END))
              ELSE 0 END AS link_chars
  FROM para_words GROUP BY doc_id, e, para
),
item_lines AS (
  SELECT p.doc_id, p.e, k.k AS item,
         'item k' || CAST((p.e + k.k) % 9 AS VARCHAR) AS line
  FROM pages p, generate_series(0, 3) k(k)
  WHERE k.k < 1 + p.e % 3
),
all_lines AS (
  SELECT doc_id, e, 0 AS grp, -1 AS ord,
         'heading h' || CAST(e % 7 AS VARCHAR) AS line, 0 AS link_chars
  FROM pages
  UNION ALL
  SELECT doc_id, e, 1, para, line, link_chars FROM para_lines
  UNION ALL
  SELECT doc_id, e, 2, item, line, 0 FROM item_lines
),
page_text AS (
  SELECT doc_id, e,
         string_agg(line, chr(10) ORDER BY grp, ord) AS text,
         CAST(sum(link_chars) AS BIGINT) AS link_chars
  FROM all_lines GROUP BY doc_id, e
)
SELECT doc_id, e,
       'Doc ' || CAST(e AS VARCHAR) || ' t' || CAST(e % 10 AS VARCHAR) AS title,
       text,
       CAST(length(text) AS INT) AS n_chars,
       CAST(length(text) - length(replace(replace(text, chr(10), ' '), ' ', ''))
            + 1 AS INT) AS n_words,
       CAST(3 + (2 + e % 4 + 1) // 2 AS INT) AS n_links,
       CAST(1 AS INT) AS n_headings,
       CAST(2 + e % 4 AS INT) AS n_paragraphs,
       CAST(1 + e % 3 AS INT) AS n_list_items,
       CAST(link_chars AS DOUBLE) / length(text) AS link_density
FROM page_text
"""


HTML_TEXT_ORACLE = f"""
WITH x AS ({html_text_sql("SELECT doc_id, doc_id AS e FROM documents")})
SELECT doc_id, title, text, n_chars, n_words, n_links, n_headings,
       n_paragraphs, n_list_items, link_density
FROM x ORDER BY doc_id
"""


# -------------------------------------------------- metadata extraction


def _messy_canonical(d: int) -> str:
    from danae_spark.operators.urlops import synth_messy_url

    return synth_messy_url(d)


def parse_html_meta(payload: bytes) -> dict | None:
    """Extract page metadata from the attribute layer the text
    extractor ignores: title, html lang, meta charset, the
    rel=canonical link (raw AND canonicalized via
    urlops.canonicalize_url — the frontier-dedup integration),
    meta description, og:title, and the meta-tag count. Entity
    references inside attribute values decode. Same reject-whole
    contract as parse_html_text."""
    from danae_spark.operators.urlops import canonicalize_url

    text = _decode_page(payload)
    if text is None:
        return None
    n = len(text)
    pos = 0
    title: str | None = None
    in_title = False
    out = {
        "lang": None,
        "charset": None,
        "canonical_raw": None,
        "canonical": None,
        "description": None,
        "og_title": None,
        "n_meta": 0,
    }
    drop_stack: list[str] = []
    while pos < n:
        lt = text.find("<", pos)
        if lt == -1:
            break
        if in_title:
            title = (title or "") + text[pos:lt]
        pos = lt
        if text.startswith("<!--", pos):
            end = text.find("-->", pos + 4)
            if end == -1:
                return None
            pos = end + 3
            continue
        if text.startswith("<!", pos) or text.startswith("<?", pos):
            end = text.find(">", pos + 2)
            if end == -1:
                return None
            pos = end + 1
            continue
        tag = _scan_tag(text, pos)
        if tag is None:
            return None
        name, is_close, self_closing, attrs, pos = tag
        if name in _RAWTEXT and not is_close and not self_closing:
            m = re.compile(rf"</{name}\s*>", re.IGNORECASE).search(text, pos)
            if not m:
                return None
            pos = m.end()
            continue
        if name == "title":
            if not is_close:
                in_title = True
                if title is None:
                    title = ""
            else:
                in_title = False
            continue
        if name in _DROP:
            if not is_close and not self_closing:
                drop_stack.append(name)
            elif is_close:
                if not drop_stack or drop_stack[-1] != name:
                    return None
                drop_stack.pop()
            continue
        if is_close:
            continue
        if name == "html" and out["lang"] is None:
            out["lang"] = attrs.get("lang")
        elif name == "meta":
            out["n_meta"] += 1
            if "charset" in attrs and out["charset"] is None:
                out["charset"] = attrs["charset"].lower()
            nm = attrs.get("name", "").lower()
            prop = attrs.get("property", "").lower()
            content = _decode_entities(attrs.get("content", ""))
            if nm == "description" and out["description"] is None:
                out["description"] = content
            elif prop == "og:title" and out["og_title"] is None:
                out["og_title"] = content
        elif name == "link":
            rels = attrs.get("rel", "").lower().split()
            if "canonical" in rels and out["canonical_raw"] is None:
                href = _decode_entities(attrs.get("href", ""))
                out["canonical_raw"] = href
                out["canonical"] = canonicalize_url(href)
    if drop_stack or in_title:
        return None
    out["title"] = " ".join(title.split()) if title is not None else ""
    return out


_META_COLS = [
    "title",
    "lang",
    "charset",
    "canonical_raw",
    "canonical",
    "description",
    "og_title",
    "n_meta",
]

_META_SCHEMA = (
    "doc_id bigint, title string, lang string, charset string, "
    "canonical_raw string, canonical string, description string, "
    "og_title string, n_meta int"
)


def html_meta_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """HTML metadata extraction over any (id, binary) frame; nulls for
    pages that cannot be walked. `canonical` is the RFC 3986
    canonicalized rel=canonical target — THE dedup key a frontier
    prefers over the fetched URL."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = parse_html_meta(bytes(payload)) if payload is not None else None
                row = {id_col: rid}
                row.update({k: (c.get(k) if c else None) for k in _META_COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + _META_COLS)

    return df.mapInPandas(batches, schema=_META_SCHEMA.replace("doc_id", id_col, 1))


def html_meta_roundtrip(spark, sf_dir: str):
    """Oracle-checkable metadata extraction: the SAME synth_html pages
    as html_text_extract (their heads carry a messy rel=canonical, an
    entity-bearing description, og:title), walked by the attribute
    scanner, with the canonical target normalized by the C69
    canonicalizer — raw AND canonical restated in SQL."""
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
                c = parse_html_meta(synth_html(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in _META_COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + _META_COLS)

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_META_SCHEMA)
        .orderBy("doc_id")
    )


def _meta_oracle() -> str:
    # raw + canonical built from the SAME fragment as the C69 oracle
    # (urlops.messy_url_sql_exprs) so the two restatements cannot drift
    from danae_spark.operators.urlops import messy_url_sql_exprs

    u = messy_url_sql_exprs("doc_id")
    return f"""
SELECT doc_id,
       'Doc ' || CAST(doc_id AS VARCHAR) || ' t'
         || CAST(doc_id % 10 AS VARCHAR) AS title,
       'en' AS lang,
       'utf-8' AS charset,
       {u["raw"]} AS canonical_raw,
       {u["canon"]} AS canonical,
       'desc w' || CAST(doc_id % 9 AS VARCHAR) || ' & more' AS description,
       'Doc ' || CAST(doc_id AS VARCHAR) || ' t'
         || CAST(doc_id % 10 AS VARCHAR) AS og_title,
       CAST(3 AS INT) AS n_meta
FROM documents
ORDER BY doc_id
"""


HTML_META_ORACLE = _meta_oracle()


# ---------------------------------------- structured data (r12): JSON-LD + og


def parse_html_structured(payload: bytes, header_charset: str | None = None) -> dict | None:
    """Extract the page's STRUCTURED metadata — the fields a
    BM25/metadata-search stack indexes the way ID3/VorbisComment feed
    it for media:

      - the full OpenGraph/article property set beyond C70's og:title
        (og:description/type/url/image, article:published_time);
      - the first <script type="application/ld+json"> block (schema.org
        JSON-LD): @type, headline (or name), author name (object or
        string form), datePublished, wordCount.

    Same decode ladder and reject-whole contract as the text extractor
    for the HTML LAYER; a malformed JSON-LD block yields NULL ld_*
    fields instead of rejecting — the metadata is optional enrichment,
    and dropping the whole page's text over a broken script would be
    wrong for a corpus pipeline."""
    import json as _json

    text = _decode_page(payload, header_charset)
    if text is None:
        return None
    n = len(text)
    pos = 0
    title: str | None = None
    in_title = False
    og: dict[str, str] = {}
    ld_raw: str | None = None
    drop_stack: list[str] = []
    while pos < n:
        lt = text.find("<", pos)
        if lt == -1:
            break
        if in_title:
            title = (title or "") + text[pos:lt]
        pos = lt
        if text.startswith("<!--", pos):
            end = text.find("-->", pos + 4)
            if end == -1:
                return None
            pos = end + 3
            continue
        if text.startswith("<!", pos) or text.startswith("<?", pos):
            end = text.find(">", pos + 2)
            if end == -1:
                return None
            pos = end + 1
            continue
        tag = _scan_tag(text, pos)
        if tag is None:
            return None
        name, is_close, self_closing, attrs, pos = tag
        if name in _RAWTEXT and not is_close and not self_closing:
            m = re.compile(rf"</{name}\s*>", re.IGNORECASE).search(text, pos)
            if not m:
                return None
            if (
                name == "script"
                and ld_raw is None
                and attrs.get("type", "").strip().lower() == "application/ld+json"
            ):
                ld_raw = text[pos : m.start()]
            pos = m.end()
            continue
        if name == "title":
            if not is_close:
                in_title = True
                if title is None:
                    title = ""
            else:
                in_title = False
            continue
        if name in _DROP:
            if not is_close and not self_closing:
                drop_stack.append(name)
            elif is_close:
                if not drop_stack or drop_stack[-1] != name:
                    return None
                drop_stack.pop()
            continue
        if is_close:
            continue
        if name == "meta":
            prop = attrs.get("property", "").lower()
            if prop.startswith(("og:", "article:")) and prop not in og:
                og[prop] = _decode_entities(attrs.get("content", ""))
    if drop_stack or in_title:
        return None

    ld_type = ld_headline = ld_author = ld_date = None
    ld_word_count = None
    if ld_raw is not None:
        try:
            obj = _json.loads(ld_raw)
        except ValueError:
            obj = None
        if isinstance(obj, list) and obj:
            obj = obj[0]
        if isinstance(obj, dict):
            t = obj.get("@type")
            ld_type = t if isinstance(t, str) else None
            h = obj.get("headline", obj.get("name"))
            ld_headline = h if isinstance(h, str) else None
            a = obj.get("author")
            if isinstance(a, dict):
                a = a.get("name")
            ld_author = a if isinstance(a, str) else None
            dp = obj.get("datePublished")
            ld_date = dp if isinstance(dp, str) else None
            wc = obj.get("wordCount")
            ld_word_count = wc if isinstance(wc, int) and not isinstance(wc, bool) else None
    return {
        "title": " ".join(title.split()) if title is not None else "",
        "og_title": og.get("og:title"),
        "og_description": og.get("og:description"),
        "og_type": og.get("og:type"),
        "og_url": og.get("og:url"),
        "og_image": og.get("og:image"),
        "published_time": og.get("article:published_time"),
        "ld_type": ld_type,
        "ld_headline": ld_headline,
        "ld_author": ld_author,
        "ld_date": ld_date,
        "ld_word_count": ld_word_count,
    }


_LD_TYPES = ("Article", "NewsArticle", "BlogPosting")


def synth_structured_html(doc_id: int) -> bytes:
    """Doc-deterministic page carrying the full structured-data layer:
    the extended og:/article: property set and a schema.org JSON-LD
    Article block (object-form author, datePublished, wordCount) —
    plus a decoy plain <script> BEFORE it (must not be read as
    JSON-LD) and entity refs in og content (must decode)."""
    d = doc_id
    t = _LD_TYPES[d % 3]
    date = f"2026-{1 + d % 9:02d}-{1 + d % 7:02d}"
    ld = (
        f'{{"@context": "https://schema.org", "@type": "{t}", '
        f'"headline": "S{d} h{d % 10}", '
        f'"author": {{"@type": "Person", "name": "author a{d % 5}"}}, '
        f'"datePublished": "{date}", "wordCount": {10 + d % 23}}}'
    )
    return (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        f"  <title>S{d} t{d % 10}</title>\n"
        f'  <meta property="og:title" content="S{d} t{d % 10}">\n'
        f'  <meta property="og:description" content="sdesc w{d % 7} &amp; more">\n'
        f'  <meta property="og:type" content="article">\n'
        f'  <meta property="og:url" content="https://site{d % 5}.example/s{d}">\n'
        f'  <meta property="og:image" content="https://img{d % 3}.example/i{d % 11}.jpg">\n'
        f'  <meta property="article:published_time" content="{date}T00:00:00Z">\n'
        '  <script>var x = {"@type": "Decoy"}; if (1 < 2) {}</script>\n'
        f'  <script type="application/ld+json">{ld}</script>\n'
        "</head>\n<body>\n"
        f"  <p>body b{d % 4}</p>\n"
        "</body>\n</html>\n"
    ).encode("utf-8")


HTML_STRUCTURED_ORACLE = """
SELECT doc_id,
       'S' || CAST(doc_id AS VARCHAR) || ' t'
         || CAST(doc_id % 10 AS VARCHAR) AS title,
       'S' || CAST(doc_id AS VARCHAR) || ' t'
         || CAST(doc_id % 10 AS VARCHAR) AS og_title,
       'sdesc w' || CAST(doc_id % 7 AS VARCHAR) || ' & more' AS og_description,
       'article' AS og_type,
       'https://site' || CAST(doc_id % 5 AS VARCHAR) || '.example/s'
         || CAST(doc_id AS VARCHAR) AS og_url,
       'https://img' || CAST(doc_id % 3 AS VARCHAR) || '.example/i'
         || CAST(doc_id % 11 AS VARCHAR) || '.jpg' AS og_image,
       '2026-' || lpad(CAST(1 + doc_id % 9 AS VARCHAR), 2, '0') || '-'
         || lpad(CAST(1 + doc_id % 7 AS VARCHAR), 2, '0')
         || 'T00:00:00Z' AS published_time,
       CASE doc_id % 3 WHEN 0 THEN 'Article' WHEN 1 THEN 'NewsArticle'
            ELSE 'BlogPosting' END AS ld_type,
       'S' || CAST(doc_id AS VARCHAR) || ' h'
         || CAST(doc_id % 10 AS VARCHAR) AS ld_headline,
       'author a' || CAST(doc_id % 5 AS VARCHAR) AS ld_author,
       '2026-' || lpad(CAST(1 + doc_id % 9 AS VARCHAR), 2, '0') || '-'
         || lpad(CAST(1 + doc_id % 7 AS VARCHAR), 2, '0') AS ld_date,
       CAST(10 + doc_id % 23 AS INT) AS ld_word_count
FROM documents ORDER BY doc_id
"""

_STRUCT_COLS = [
    "title", "og_title", "og_description", "og_type", "og_url", "og_image",
    "published_time", "ld_type", "ld_headline", "ld_author", "ld_date",
    "ld_word_count",
]


def html_structured_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Structured-data extraction over any (id, binary) frame; nulls
    for pages that cannot be walked."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = parse_html_structured(bytes(payload)) if payload is not None else None
                row = {id_col: rid}
                row.update({k: (c.get(k) if c else None) for k in _STRUCT_COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + _STRUCT_COLS)

    schema = (
        f"{id_col} bigint, title string, og_title string, og_description string, "
        "og_type string, og_url string, og_image string, published_time string, "
        "ld_type string, ld_headline string, ld_author string, ld_date string, "
        "ld_word_count int"
    )
    return df.mapInPandas(batches, schema=schema)


def html_structured_roundtrip(spark, sf_dir: str):
    """Oracle-certified structured-data extraction: per doc the
    structured page (og:/article: set + JSON-LD Article with a decoy
    plain script) extracts and every field value-checks against SQL
    string arithmetic."""
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
                c = parse_html_structured(synth_structured_html(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in _STRUCT_COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + _STRUCT_COLS)

    schema = (
        "doc_id bigint, title string, og_title string, og_description string, "
        "og_type string, og_url string, og_image string, published_time string, "
        "ld_type string, ld_headline string, ld_author string, ld_date string, "
        "ld_word_count int"
    )
    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=schema)
        .orderBy("doc_id")
    )


def extract_links(payload: bytes, header_charset: str | None = None):
    """Collect the page's outgoing anchors in document order: returns
    (base_href, [href, ...]) where base_href is the first <base href>
    (HTML's base-URL override, None if absent) and the list holds each
    <a href> attribute value, entity-decoded, raw (unresolved —
    urlops.resolve_reference turns them absolute against the effective
    base). Same decode ladder and reject-whole contract as the text
    extractor; raw-text elements (script/style) are skipped whole so a
    '<a href' inside JavaScript never counts."""
    text = _decode_page(payload, header_charset)
    if text is None:
        return None
    n = len(text)
    pos = 0
    base: str | None = None
    hrefs: list[str] = []
    while pos < n:
        lt = text.find("<", pos)
        if lt == -1:
            break
        pos = lt
        if text.startswith("<!--", pos):
            end = text.find("-->", pos + 4)
            if end == -1:
                return None
            pos = end + 3
            continue
        if text.startswith("<!", pos) or text.startswith("<?", pos):
            end = text.find(">", pos + 2)
            if end == -1:
                return None
            pos = end + 1
            continue
        tag = _scan_tag(text, pos)
        if tag is None:
            return None
        name, is_close, self_closing, attrs, pos = tag
        if name in _RAWTEXT and not is_close and not self_closing:
            m = re.compile(rf"</{name}\s*>", re.IGNORECASE).search(text, pos)
            if not m:
                return None
            pos = m.end()
            continue
        if is_close:
            continue
        if name == "base" and base is None and "href" in attrs:
            base = _decode_entities(attrs["href"])
        elif name == "a" and "href" in attrs:
            hrefs.append(_decode_entities(attrs["href"]))
    return base, hrefs
