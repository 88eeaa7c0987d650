"""Office-document text extraction: OOXML (.docx) and OpenDocument
(.odt) — the fourth big text-bearing corpus class after HTML, PDF and
plain text in a real crawl.

Both formats are ZIP packages of XML parts (ECMA-376 part 2 / OASIS
ODF 1.2 part 3), so this module composes two certified pieces of the
repo instead of growing new parsers:

  - the validating ZIP walker (multimodal/archive.py `_zip_members`:
    EOCD-anchored central-directory walk, every member decompressed
    and CRC-32 + size verified) — a truncated or bit-flipped package
    rejects WHOLE, never half-extracts;
  - the quote-aware XML tag scanner shared with the HTML/sitemap
    extractors (multimodal/htmltext.py `_scan_tag` — `_NAME_RE`
    accepts namespaced names like `w:p`) plus `_decode_entities`.

Format routing is spec-first:

  - ODF requires the FIRST member to be an uncompressed `mimetype`
    whose bytes are the package media type (ODF 1.2 §3.3); we route
    on exactly that, then read `content.xml` (body text) and
    `meta.xml` (dc:title / dc:creator).
  - OOXML is recognized by `[Content_Types].xml` + the main document
    part `word/document.xml`; metadata lives in `docProps/core.xml`.

Text model (ECMA-376 §17.3 / ODF 1.2 §6):

  - docx: one paragraph per `w:p`; runs (`w:r`) flatten; `w:t`
    character data is trimmed unless `xml:space="preserve"`;
    `w:tab` → TAB, `w:br`/`w:cr` → newline; run properties
    (`w:rPr`, bold etc.) and markers (`w:proofErr`, bookmarks) are
    transparent.
  - odt: one paragraph per `text:p` / `text:h`; `text:span` is
    transparent; `text:tab` → TAB, `text:line-break` → newline,
    `text:s text:c="n"` → n spaces (ODF whitespace-collapse rule:
    literal runs of spaces are single, counted spaces are explicit).

Reject-whole contract as everywhere in the repo: any structural
violation (bad ZIP, CRC mismatch, malformed XML tag, unterminated
element) yields None for the whole document, never partial text.

Reference anchor: the reference ingests extracted text only (no
office parser exists there — ingest/filters.py builds tf/tf-idf from
already-plain text); this module is part of the mandated
training-data-pipeline extension surface.
"""

from __future__ import annotations

import re
from typing import Optional


from danae_spark.multimodal.archive import _zip_build, _zip_members
from danae_spark.multimodal.htmltext import _decode_entities, _scan_tag

__all__ = [
    "parse_office",
    "synth_office",
    "synth_docx",
    "synth_odt",
    "office_text_frame",
    "office_text_roundtrip",
    "OFFICE_TEXT_ORACLE",
]

ODT_MIME = b"application/vnd.oasis.opendocument.text"


# ------------------------------------------------------------ XML walks


def _skip_markup(text: str, pos: int) -> Optional[int]:
    """Skip a comment / declaration / PI starting at `pos` ('<');
    return the position after it, or None if it is a normal tag (the
    caller should _scan_tag) or malformed (reject)."""
    if text.startswith("<!--", pos):
        end = text.find("-->", pos + 4)
        return None if end == -1 else end + 3
    if text.startswith("<?", pos) or text.startswith("<!", pos):
        end = text.find(">", pos + 2)
        return None if end == -1 else end + 1
    return -1  # a normal tag


def _element_text(text: str, pos: int, name: str) -> Optional[tuple[str, int]]:
    """Character data of an element whose open tag just ended at
    `pos`, up to its close tag. The schema guarantees text-only
    content for the elements we call this on (w:t, dc:title, ...);
    a child element inside is a structural violation → None."""
    lt = text.find("<", pos)
    if lt == -1:
        return None
    tag = _scan_tag(text, lt)
    if tag is None:
        return None
    tname, is_close, _self, _attrs, end = tag
    if not is_close or tname != name:
        return None
    return _decode_entities(text[pos:lt]), end


def _docx_paragraphs(xml: str) -> Optional[list[str]]:
    """Paragraph list from a WordprocessingML document part."""
    paras: list[str] = []
    parts: list[str] = []
    in_p = False
    pos, n = 0, len(xml)
    while pos < n:
        lt = xml.find("<", pos)
        if lt == -1:
            break
        pos = lt
        skip = _skip_markup(xml, pos)
        if skip is None:
            return None
        if skip != -1:
            pos = skip
            continue
        tag = _scan_tag(xml, pos)
        if tag is None:
            return None
        name, is_close, self_closing, attrs, pos = tag
        if name == "w:p":
            if is_close:
                if not in_p:
                    return None
                paras.append("".join(parts))
                parts, in_p = [], False
            elif self_closing:
                paras.append("")
            else:
                if in_p:
                    return None  # nested paragraphs: structural violation
                in_p, parts = True, []
        elif in_p and name == "w:t" and not is_close:
            if self_closing:
                continue
            got = _element_text(xml, pos, "w:t")
            if got is None:
                return None
            content, pos = got
            if attrs.get("xml:space") != "preserve":
                content = content.strip()
            parts.append(content)
        elif in_p and name == "w:tab" and not is_close:
            parts.append("\t")
        elif in_p and name in ("w:br", "w:cr") and not is_close:
            parts.append("\n")
        # every other element (w:r, w:rPr, w:proofErr, bookmarks,
        # w:sectPr, ...) is transparent for text purposes
    if in_p:
        return None  # unterminated paragraph
    return paras


def _odt_paragraphs(xml: str) -> Optional[list[str]]:
    """Paragraph list from an ODF content.xml. Character data only
    accumulates inside text:p / text:h (styles subtrees are outside
    them); text:span is transparent."""
    paras: list[str] = []
    parts: list[str] = []
    in_p = False
    pos, n = 0, len(xml)
    while pos < n:
        lt = xml.find("<", pos)
        if lt == -1:
            break
        if in_p and lt > pos:
            parts.append(_decode_entities(xml[pos:lt]))
        pos = lt
        skip = _skip_markup(xml, pos)
        if skip is None:
            return None
        if skip != -1:
            pos = skip
            continue
        tag = _scan_tag(xml, pos)
        if tag is None:
            return None
        name, is_close, self_closing, attrs, pos = tag
        if name in ("text:p", "text:h"):
            if is_close:
                if not in_p:
                    return None
                paras.append("".join(parts))
                parts, in_p = [], False
            elif self_closing:
                paras.append("")
            else:
                if in_p:
                    return None
                in_p, parts = True, []
        elif in_p and name == "text:tab" and not is_close:
            parts.append("\t")
        elif in_p and name == "text:line-break" and not is_close:
            parts.append("\n")
        elif in_p and name == "text:s" and not is_close:
            try:
                count = int(attrs.get("text:c", "1"))
            except ValueError:
                return None
            if count < 0:
                return None
            parts.append(" " * count)
        # text:span and anything else: transparent
    if in_p:
        return None
    return paras


def _meta_fields(xml: str, tags: tuple[str, ...]) -> Optional[dict]:
    """First occurrence of each metadata element's character data."""
    out: dict[str, Optional[str]] = {t: None for t in tags}
    pos, n = 0, len(xml)
    while pos < n:
        lt = xml.find("<", pos)
        if lt == -1:
            break
        pos = lt
        skip = _skip_markup(xml, pos)
        if skip is None:
            return None
        if skip != -1:
            pos = skip
            continue
        tag = _scan_tag(xml, pos)
        if tag is None:
            return None
        name, is_close, self_closing, _attrs, pos = tag
        if name in tags and not is_close and not self_closing and out[name] is None:
            got = _element_text(xml, pos, name)
            if got is None:
                return None
            out[name], pos = got
    return out


# ------------------------------------------------------------- parsing


def _decode_xml_part(data: bytes) -> Optional[str]:
    """Office parts are UTF-8 XML (both specs default to it)."""
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        return None


def parse_office(payload: bytes) -> Optional[dict]:
    """Route a ZIP package to the docx or odt extractor and return
    {format, title, creator, n_paragraphs, text, n_chars, n_words},
    or None on any structural violation (reject-whole)."""
    members = _zip_members(payload)
    if not members:
        return None
    by_name = {name: data for name, is_dir, _u, _c, data in members if not is_dir}

    fmt: Optional[str] = None
    first = members[0]
    if first[0] == "mimetype" and first[4] == ODT_MIME:
        fmt = "odt"
    elif "[Content_Types].xml" in by_name and "word/document.xml" in by_name:
        fmt = "docx"
    if fmt is None:
        return None

    if fmt == "docx":
        doc = _decode_xml_part(by_name["word/document.xml"])
        if doc is None:
            return None
        paras = _docx_paragraphs(doc)
        meta_part = by_name.get("docProps/core.xml")
    else:
        content = by_name.get("content.xml")
        if content is None:
            return None
        doc = _decode_xml_part(content)
        if doc is None:
            return None
        paras = _odt_paragraphs(doc)
        meta_part = by_name.get("meta.xml")
    if paras is None:
        return None

    title = creator = None
    if meta_part is not None:
        meta_xml = _decode_xml_part(meta_part)
        if meta_xml is None:
            return None
        meta = _meta_fields(meta_xml, ("dc:title", "dc:creator"))
        if meta is None:
            return None
        title, creator = meta["dc:title"], meta["dc:creator"]

    text = "\n".join(paras)
    return {
        "format": fmt,
        "title": title,
        "creator": creator,
        "n_paragraphs": len(paras),
        "text": text,
        "n_chars": len(text),
        "n_words": len(text.split()),
    }


# ----------------------------------------------------------- synthesis
#
# Doc-deterministic fixtures whose extracted text is pure doc_id
# arithmetic (restated in OFFICE_TEXT_ORACLE):
#   n_paras(d)      = 2 + d % 4
#   words(d, i)     = 3 + (d + i) % 3 words; word j = 'w' || (d*11+i*7+j*5)%97
#   separator after word 0 of para i:
#       TAB        if i % 4 == 1   (docx w:tab / odt text:tab)
#       two spaces if i % 4 == 3   (docx xml:space-preserved / odt text:s c=2)
#       one space  otherwise
#   para suffix ' & o!' when i % 3 == 0 (via &amp; and &#33; entities)
#   title 'Doc {d} t{d%10}', creator 'author a{d%5}'
#   format: docx when d % 2 == 0 else odt; d % 17 == 0 → truncated
#   package (reject leg; every output column NULL)


def _para_words(d: int, i: int) -> list[str]:
    return [f"w{(d * 11 + i * 7 + j * 5) % 97}" for j in range(3 + (d + i) % 3)]


def _n_paras(d: int) -> int:
    return 2 + d % 4


_DOCX_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" '
    'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    '<Override PartName="/docProps/core.xml" ContentType="application/vnd.'
    'openxmlformats-package.core-properties+xml"/></Types>'
)

_DOCX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/><Relationship Id="rId2" Type="http://schemas.'
    'openxmlformats.org/package/2006/relationships/metadata/core-properties" '
    'Target="docProps/core.xml"/></Relationships>'
)


def synth_docx(d: int) -> bytes:
    """Minimal-but-real OOXML package exercising every docx text rule:
    split runs, bold run properties, w:tab, xml:space-preserved
    spaces, entities, ignorable markers, a sectPr."""
    core = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        "<cp:coreProperties "
        'xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/'
        'core-properties" xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f"<dc:title>Doc {d} t{d % 10}</dc:title>"
        f"<dc:creator>author a{d % 5}</dc:creator>"
        "</cp:coreProperties>"
    )
    body = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>',
    ]
    for i in range(_n_paras(d)):
        words = _para_words(d, i)
        rest = " ".join(words[1:])
        runs = ['<w:p><w:proofErr w:type="spellStart"/>']
        if i % 2 == 0:  # bold first run: run properties are transparent
            runs.append(f"<w:r><w:rPr><w:b/></w:rPr><w:t>{words[0]}</w:t></w:r>")
        else:
            runs.append(f"<w:r><w:t>{words[0]}</w:t></w:r>")
        if i % 4 == 1:
            runs.append(f"<w:r><w:tab/><w:t>{rest}</w:t></w:r>")
        elif i % 4 == 3:
            runs.append(f'<w:r><w:t xml:space="preserve">  {rest}</w:t></w:r>')
        else:
            runs.append(f'<w:r><w:t xml:space="preserve"> {rest}</w:t></w:r>')
        if i % 3 == 0:
            runs.append('<w:r><w:t xml:space="preserve"> &amp; o&#33;</w:t></w:r>')
        runs.append("</w:p>")
        body.append("".join(runs))
    body.append('<w:sectPr><w:pgSz w:w="11906" w:h="16838"/></w:sectPr>')
    body.append("</w:body></w:document>")
    entries = [
        ("[Content_Types].xml", _DOCX_CT.encode(), 8),
        ("_rels/.rels", _DOCX_RELS.encode(), 8),
        ("docProps/core.xml", core.encode(), 8),
        ("word/document.xml", "\n".join(body).encode(), 8),
    ]
    return _zip_build(entries)


_ODT_MANIFEST = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:'
    'xmlns:manifest:1.0" manifest:version="1.2">'
    '<manifest:file-entry manifest:full-path="/" manifest:media-type='
    '"application/vnd.oasis.opendocument.text"/>'
    '<manifest:file-entry manifest:full-path="content.xml" '
    'manifest:media-type="text/xml"/>'
    '<manifest:file-entry manifest:full-path="meta.xml" '
    'manifest:media-type="text/xml"/></manifest:manifest>'
)


def synth_odt(d: int) -> bytes:
    """Minimal-but-real ODF text package: stored-first mimetype
    member (ODF 1.2 §3.3 — the route key), manifest, meta.xml, and a
    content.xml exercising text:span flattening, text:tab, counted
    spaces, entities and an ignorable automatic-styles subtree."""
    meta = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<office:document-meta "
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/" office:version="1.2">'
        f"<office:meta><dc:title>Doc {d} t{d % 10}</dc:title>"
        f"<dc:creator>author a{d % 5}</dc:creator></office:meta>"
        "</office:document-meta>"
    )
    body = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        "<office:document-content "
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
        'xmlns:style="urn:oasis:names:tc:opendocument:xmlns:style:1.0" '
        'office:version="1.2">',
        "<office:automatic-styles>"
        '<style:style style:name="P1" style:family="paragraph"/>'
        "</office:automatic-styles>",
        "<office:body><office:text>",
        "<!-- deterministic fixture -->",
    ]
    for i in range(_n_paras(d)):
        words = _para_words(d, i)
        shown = list(words)
        if i % 2 == 0:  # spans are transparent
            shown[1] = f'<text:span text:style-name="T1">{words[1]}</text:span>'
        rest = " ".join(shown[1:])
        if i % 4 == 1:
            line = f"{shown[0]}<text:tab/>{rest}"
        elif i % 4 == 3:
            line = f'{shown[0]}<text:s text:c="2"/>{rest}'
        else:
            line = f"{shown[0]} {rest}"
        if i % 3 == 0:
            line += " &amp; o&#33;"
        body.append(f'<text:p text:style-name="P1">{line}</text:p>')
    body.append("</office:text></office:body></office:document-content>")
    entries = [
        ("mimetype", ODT_MIME, 0),  # stored + first, per spec
        ("META-INF/manifest.xml", _ODT_MANIFEST.encode(), 8),
        ("meta.xml", meta.encode(), 8),
        ("content.xml", "\n".join(body).encode(), 8),
    ]
    return _zip_build(entries)


def synth_office(d: int) -> bytes:
    """Format cycles docx (even) / odt (odd); d % 17 == 0 emits a
    truncated package — the reject leg the oracle NULLs."""
    raw = synth_docx(d) if d % 2 == 0 else synth_odt(d)
    if d % 17 == 0:
        return raw[:-7]
    return raw


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, format string, title string, creator string, "
    "n_paragraphs int, text string, n_chars int, n_words int"
)
_COLS = ["format", "title", "creator", "n_paragraphs", "text", "n_chars", "n_words"]


def office_text_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Office text extraction over any (id, binary) frame: one
    Arrow-batched narrow map, no shuffle — the scale path for a
    100 TB lake of .docx/.odt blobs is simply partition parallelism."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_office, _COLS, _SCHEMA, id_col, payload_col)


def office_text_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real docx/odt package is
    built byte-for-byte (ZIP CRCs, central directory, stored-first
    odt mimetype), walked by the validating ZIP reader, its XML parts
    parsed by the shared tag scanner, and every output column
    restated as doc_id arithmetic in OFFICE_TEXT_ORACLE."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_office, parse_office, _COLS, _SCHEMA)


def office_text_sql(docs_cte: str) -> str:
    """The extraction arithmetic as SQL over a `d0(doc_id, d)` CTE
    (d = the synth parameter), shared between OFFICE_TEXT_ORACLE
    (d = doc_id) and the text_harvest oracle so the unit entry and
    the dispatcher composition certify the SAME restated rules.
    Emits (doc_id, d, format, title, creator, text, n_paras,
    n_tokens) for every doc in the CTE — the caller applies its own
    reject legs."""
    return f"""
WITH d0 AS ({docs_cte}),
words AS (
  SELECT doc_id, d, c.i AS para, j.j AS wi,
         'w' || CAST((d * 11 + c.i * 7 + j.j * 5) % 97 AS VARCHAR) AS word
  FROM d0, generate_series(0, 5) c(i), generate_series(0, 4) j(j)
  WHERE c.i < 2 + d % 4 AND j.j < 3 + (d + c.i) % 3
),
para_lines AS (
  SELECT doc_id, d, para,
         max(CASE WHEN wi = 0 THEN word END)
           || CASE WHEN para % 4 = 1 THEN chr(9)
                   WHEN para % 4 = 3 THEN '  ' ELSE ' ' END
           || string_agg(CASE WHEN wi > 0 THEN word END, ' ' ORDER BY wi)
           || CASE WHEN para % 3 = 0 THEN ' & o!' ELSE '' END AS line,
         count(*) + CASE WHEN para % 3 = 0 THEN 2 ELSE 0 END AS n_tokens
  FROM words GROUP BY doc_id, d, para
)
SELECT doc_id, d,
       CASE WHEN d % 2 = 0 THEN 'docx' ELSE 'odt' END AS format,
       'Doc ' || CAST(d AS VARCHAR) || ' t' || CAST(d % 10 AS VARCHAR) AS title,
       'author a' || CAST(d % 5 AS VARCHAR) AS creator,
       string_agg(line, chr(10) ORDER BY para) AS text,
       CAST(count(*) AS INT) AS n_paras,
       CAST(sum(n_tokens) AS INT) AS n_tokens
FROM para_lines GROUP BY doc_id, d
"""


OFFICE_TEXT_ORACLE = f"""
WITH office AS ({office_text_sql("SELECT doc_id, doc_id AS d FROM documents")})
SELECT doc_id,
       CASE WHEN d % 17 = 0 THEN NULL ELSE format END AS format,
       CASE WHEN d % 17 = 0 THEN NULL ELSE title END AS title,
       CASE WHEN d % 17 = 0 THEN NULL ELSE creator END AS creator,
       CASE WHEN d % 17 = 0 THEN NULL ELSE n_paras END AS n_paragraphs,
       CASE WHEN d % 17 = 0 THEN NULL ELSE text END AS text,
       CASE WHEN d % 17 = 0 THEN NULL
            ELSE CAST(length(text) AS INT) END AS n_chars,
       CASE WHEN d % 17 = 0 THEN NULL ELSE n_tokens END AS n_words
FROM office ORDER BY doc_id
"""


# ------------------------------------------------- xlsx (SpreadsheetML)
#
# The tabular OOXML sibling (ECMA-376 §18): a workbook part naming the
# sheets, a shared-strings table, and per-sheet cell grids with
# A1-style refs. Declared boundaries: single sheet, single-letter
# columns (<= 26), plain <t> or run (<r><t>) shared strings, cached
# formula values (<f> is skipped, <v> taken) — everything outside
# rejects whole.


def _col_index(ref: str) -> Optional[int]:
    """'C7' -> 2. Single-letter columns only (declared boundary)."""
    if not ref or not ref[0].isalpha():
        return None
    if len(ref) > 1 and ref[1].isalpha():
        return None  # multi-letter column: outside the certified subset
    return ord(ref[0].upper()) - ord("A")


def _shared_strings(xml: str) -> Optional[list[str]]:
    """<si> entries in order; plain <t> or rich-text runs <r><t>."""
    out: list[str] = []
    parts: list[str] = []
    in_si = False
    pos, n = 0, len(xml)
    while pos < n:
        lt = xml.find("<", pos)
        if lt == -1:
            break
        pos = lt
        skip = _skip_markup(xml, pos)
        if skip is None:
            return None
        if skip != -1:
            pos = skip
            continue
        tag = _scan_tag(xml, pos)
        if tag is None:
            return None
        name, is_close, self_closing, _attrs, pos = tag
        if name == "si":
            if is_close:
                if not in_si:
                    return None
                out.append("".join(parts))
                parts, in_si = [], False
            elif self_closing:
                out.append("")
            else:
                if in_si:
                    return None
                in_si, parts = True, []
        elif in_si and name == "t" and not is_close and not self_closing:
            got = _element_text(xml, pos, "t")
            if got is None:
                return None
            content, pos = got
            parts.append(content)
    if in_si:
        return None
    return out


def _sheet_rows(xml: str, shared: list[str]) -> Optional[tuple[list[list[str]], int]]:
    """Cell grid from a worksheet part: list of rows (each a list of
    cell strings, ''-filled at ref gaps) + the count of value-bearing
    cells. Cached formula values are taken; <f> bodies are skipped."""
    rows: list[list[str]] = []
    cells: list[str] = []
    n_values = 0
    in_row = False
    cell_t: Optional[str] = None
    cell_col = -1
    pending: Optional[str] = None  # raw value of the open cell
    pos, n = 0, len(xml)

    def close_cell() -> bool:
        nonlocal pending, n_values
        if cell_col < len(cells):
            return False  # refs must be strictly increasing
        cells.extend([""] * (cell_col - len(cells)))
        if pending is None:
            cells.append("")
            return True
        t = cell_t or "n"
        if t == "s":
            if not pending.isdigit() or int(pending) >= len(shared):
                return False
            cells.append(shared[int(pending)])
        elif t == "b":
            if pending not in ("0", "1"):
                return False
            cells.append("TRUE" if pending == "1" else "FALSE")
        elif t in ("n", "str", "inlineStr"):
            cells.append(pending)
        else:
            return False  # unknown cell type (e.g. 'e'): reject whole
        n_values += 1
        pending = None
        return True

    in_cell = False
    while pos < n:
        lt = xml.find("<", pos)
        if lt == -1:
            break
        pos = lt
        skip = _skip_markup(xml, pos)
        if skip is None:
            return None
        if skip != -1:
            pos = skip
            continue
        tag = _scan_tag(xml, pos)
        if tag is None:
            return None
        name, is_close, self_closing, attrs, pos = tag
        if name == "row":
            if is_close:
                if not in_row:
                    return None
                rows.append(cells)
                cells, in_row = [], False
            elif self_closing:
                rows.append([])
            else:
                if in_row:
                    return None
                in_row, cells = True, []
        elif in_row and name == "c":
            if is_close:
                if not in_cell or not close_cell():
                    return None
                in_cell, cell_t, cell_col = False, None, -1
            else:
                if in_cell:
                    return None
                col = _col_index(attrs.get("r", ""))
                if col is None:
                    return None
                in_cell, cell_t, cell_col, pending = True, attrs.get("t"), col, None
                if self_closing:
                    if not close_cell():
                        return None
                    in_cell, cell_t, cell_col = False, None, -1
        elif in_cell and name == "v" and not is_close and not self_closing:
            got = _element_text(xml, pos, "v")
            if got is None:
                return None
            pending, pos = got
        elif in_cell and name == "t" and not is_close and not self_closing:
            # inlineStr body: <is><t>...</t></is>
            got = _element_text(xml, pos, "t")
            if got is None:
                return None
            pending, pos = got
        elif in_cell and name == "f" and not is_close and not self_closing:
            # formula body: skip, the cached <v> is the value
            end = xml.find("</f>", pos)
            if end == -1:
                return None
            pos = end + 4
    if in_row or in_cell:
        return None
    return rows, n_values


def parse_xlsx(payload: bytes) -> Optional[dict]:
    """SpreadsheetML workbook -> {sheet_name, n_rows, n_cells,
    n_shared, text} with text as a TSV grid (cells joined by TAB,
    rows by newline); None on any structural violation."""
    members = _zip_members(payload)
    if not members:
        return None
    by_name = {name: data for name, is_dir, _u, _c, data in members if not is_dir}
    if "[Content_Types].xml" not in by_name or "xl/workbook.xml" not in by_name:
        return None
    wb = _decode_xml_part(by_name["xl/workbook.xml"])
    if wb is None:
        return None
    meta = _meta_fields(wb, ())  # structural XML validation only
    if meta is None:
        return None
    # first <sheet name="..."/>
    m = re.search(r"<sheet\s[^>]*\bname=\"([^\"]*)\"", wb)
    if not m:
        return None
    sheet_name = _decode_entities(m.group(1))

    shared: list[str] = []
    if "xl/sharedStrings.xml" in by_name:
        sst = _decode_xml_part(by_name["xl/sharedStrings.xml"])
        if sst is None:
            return None
        got = _shared_strings(sst)
        if got is None:
            return None
        shared = got

    ws = by_name.get("xl/worksheets/sheet1.xml")
    if ws is None:
        return None
    ws_xml = _decode_xml_part(ws)
    if ws_xml is None:
        return None
    grid = _sheet_rows(ws_xml, shared)
    if grid is None:
        return None
    rows, n_values = grid
    text = "\n".join("\t".join(r) for r in rows)
    return {
        "sheet_name": sheet_name,
        "n_rows": len(rows),
        "n_cells": n_values,
        "n_shared": len(shared),
        "text": text,
    }


# ------------------------------------------------------ xlsx synthesis
#
# Cell arithmetic (restated in XLSX_TABLE_ORACLE):
#   n_data_rows(d) = 2 + d % 3 ; n_cols(d) = 2 + d % 2
#   header cell c        = 'h' || (d + c) % 5           (shared string)
#   data cell (r, c), r in 1..n_data_rows:
#     gap when (d + r + c) % 7 == 3 -> ''  (omitted element mid-row,
#                                           explicit empty <c> at the
#                                           last column)
#     else kind = (d + r + c) % 4:
#       0 -> number (d*13 + r*7 + c*3) % 1000   (cached-formula cell
#                                                when r == 1)
#       1 -> shared 's' || (d + r + c) % 6
#       2 -> inline 'i' || (d + r*2 + c) % 9
#       3 -> boolean: TRUE iff (r + c) % 2 == 1
#   sheet name 'data d' || d % 10; sst = h0..h4, s0..s5 (11 entries);
#   d % 19 == 0 -> truncated package (reject leg)

_XLSX_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" '
    'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>'
)

_XLSX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/></Relationships>'
)

_XLSX_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
    'Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://'
    'schemas.openxmlformats.org/officeDocument/2006/relationships/'
    'sharedStrings" Target="sharedStrings.xml"/></Relationships>'
)


def _xlsx_cell(d: int, r: int, c: int) -> tuple[str, str] | None:
    """(kind, rendered value) for data cell (r, c); None = gap."""
    if (d + r + c) % 7 == 3:
        return None
    kind = (d + r + c) % 4
    if kind == 0:
        return "n", str((d * 13 + r * 7 + c * 3) % 1000)
    if kind == 1:
        return "s", f"s{(d + r + c) % 6}"
    if kind == 2:
        return "i", f"i{(d + r * 2 + c) % 9}"
    return "b", "TRUE" if (r + c) % 2 == 1 else "FALSE"


def xlsx_n_data_rows(d: int) -> int:
    return 2 + d % 3


def xlsx_n_cols(d: int) -> int:
    return 2 + d % 2


def synth_xlsx(d: int) -> bytes:
    """Minimal-but-real SpreadsheetML package exercising shared
    strings (incl. a rich-text run), inline strings, booleans, cached
    formulas, ref-gap positioning, and explicit empty cells."""
    sst_items = []
    for k in range(5):
        if k == 2:
            # rich-text run form: parser must concatenate <r><t> parts
            sst_items.append(f"<si><r><t>h</t></r><r><t>{k}</t></r></si>")
        else:
            sst_items.append(f"<si><t>h{k}</t></si>")
    sst_items += [f"<si><t>s{k}</t></si>" for k in range(6)]
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        f'count="11" uniqueCount="11">{"".join(sst_items)}</sst>'
    )
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        '2006/main"><sheets>'
        f'<sheet name="data d{d % 10}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    n_cols = xlsx_n_cols(d)
    body = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>']
    body.append(
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        '2006/main"><sheetData>'
    )
    # header row: shared-string refs
    hdr = "".join(
        f'<c r="{chr(65 + c)}1" t="s"><v>{(d + c) % 5}</v></c>'
        for c in range(n_cols)
    )
    body.append(f'<row r="1">{hdr}</row>')
    for r in range(1, xlsx_n_data_rows(d) + 1):
        cells = []
        for c in range(n_cols):
            ref = f"{chr(65 + c)}{r + 1}"
            got = _xlsx_cell(d, r, c)
            if got is None:
                if c == n_cols - 1:
                    cells.append(f'<c r="{ref}"/>')  # explicit empty cell
                # mid-row gap: element omitted, ref positioning must fill
                continue
            kind, val = got
            if kind == "n":
                if r == 1:
                    cells.append(f'<c r="{ref}"><f>1+{val}-1</f><v>{val}</v></c>')
                else:
                    cells.append(f'<c r="{ref}"><v>{val}</v></c>')
            elif kind == "s":
                idx = 5 + (d + r + c) % 6
                cells.append(f'<c r="{ref}" t="s"><v>{idx}</v></c>')
            elif kind == "i":
                cells.append(f'<c r="{ref}" t="inlineStr"><is><t>{val}</t></is></c>')
            else:
                v = "1" if val == "TRUE" else "0"
                cells.append(f'<c r="{ref}" t="b"><v>{v}</v></c>')
        body.append(f'<row r="{r + 1}">{"".join(cells)}</row>')
    body.append("</sheetData></worksheet>")
    entries = [
        ("[Content_Types].xml", _XLSX_CT.encode(), 8),
        ("_rels/.rels", _XLSX_RELS.encode(), 8),
        ("xl/workbook.xml", wb.encode(), 8),
        ("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS.encode(), 8),
        ("xl/sharedStrings.xml", sst.encode(), 8),
        ("xl/worksheets/sheet1.xml", "\n".join(body).encode(), 8),
    ]
    raw = _zip_build(entries)
    if d % 19 == 0:
        return raw[:-7]
    return raw


_XLSX_SCHEMA = (
    "doc_id bigint, sheet_name string, n_rows int, n_cells int, "
    "n_shared int, text string"
)
_XLSX_COLS = ["sheet_name", "n_rows", "n_cells", "n_shared", "text"]


def xlsx_table_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """xlsx table extraction over any (id, binary) frame: one
    Arrow-batched narrow map, no shuffle."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_xlsx, _XLSX_COLS, _XLSX_SCHEMA, id_col, payload_col)


def xlsx_table_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real SpreadsheetML
    package is built byte-for-byte, walked by the validating ZIP
    reader, the shared-strings and cell grid parsed by the shared tag
    scanner, and every output column restated as doc_id arithmetic in
    XLSX_TABLE_ORACLE."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_xlsx, parse_xlsx, _XLSX_COLS, _XLSX_SCHEMA)


XLSX_TABLE_ORACLE = """
WITH d0 AS (SELECT doc_id, doc_id AS d FROM documents),
cells AS (
  SELECT doc_id, d, r.r, c.c,
         CASE
           WHEN r.r = 0 THEN 'h' || CAST((d + c.c) % 5 AS VARCHAR)
           WHEN (d + r.r + c.c) % 7 = 3 THEN ''
           WHEN (d + r.r + c.c) % 4 = 0
             THEN CAST((d * 13 + r.r * 7 + c.c * 3) % 1000 AS VARCHAR)
           WHEN (d + r.r + c.c) % 4 = 1
             THEN 's' || CAST((d + r.r + c.c) % 6 AS VARCHAR)
           WHEN (d + r.r + c.c) % 4 = 2
             THEN 'i' || CAST((d + r.r * 2 + c.c) % 9 AS VARCHAR)
           WHEN (r.r + c.c) % 2 = 1 THEN 'TRUE' ELSE 'FALSE'
         END AS val
  FROM d0, generate_series(0, 4) r(r), generate_series(0, 2) c(c)
  WHERE r.r <= 2 + d % 3 AND c.c < 2 + d % 2
),
lines AS (
  SELECT doc_id, d, r,
         string_agg(val, chr(9) ORDER BY c) AS line,
         CAST(count(*) FILTER (WHERE val <> '' OR r = 0) AS INT) AS n_vals
  FROM cells GROUP BY doc_id, d, r
),
grid AS (
  SELECT doc_id, d,
         string_agg(line, chr(10) ORDER BY r) AS text,
         CAST(count(*) AS INT) AS n_rows,
         CAST(sum(n_vals) AS INT) AS n_cells
  FROM lines GROUP BY doc_id, d
)
SELECT doc_id,
       CASE WHEN d % 19 = 0 THEN NULL
            ELSE 'data d' || CAST(d % 10 AS VARCHAR) END AS sheet_name,
       CASE WHEN d % 19 = 0 THEN NULL ELSE n_rows END AS n_rows,
       CASE WHEN d % 19 = 0 THEN NULL ELSE n_cells END AS n_cells,
       CASE WHEN d % 19 = 0 THEN NULL ELSE 11 END AS n_shared,
       CASE WHEN d % 19 = 0 THEN NULL ELSE text END AS text
FROM grid ORDER BY doc_id
"""
