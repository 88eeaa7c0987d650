"""EPUB e-book text extraction — a ZIP (OCF, like ODT: stored-first
`mimetype` member) wrapping XHTML chapters named by an OPF package
document. Composes three certified pieces:

  - the validating ZIP walker (archive._zip_members — full CRC
    verification, reject-whole);
  - the OCF/OPF XML layer parsed with the shared quote-aware tag
    scanner (htmltext._scan_tag);
  - the chapter bodies extracted by the SAME parse_html_text as the
    crawl surface, so the epub oracle restates chapter text through
    the SAME html_text_sql fragment as the html/warc/harvest entries.

Spec anchors: EPUB OCF 3.3 §3 (mimetype first, stored), OCF
container.xml rootfile, OPF package §3 (manifest item href,
spine itemref order). Reject-whole on any structural violation:
bad ZIP, wrong mimetype, missing container/OPF/chapter, a chapter
parse_html_text cannot walk.
"""

from __future__ import annotations

import re
from typing import Optional


from danae_spark.multimodal.archive import _zip_build, _zip_members
from danae_spark.multimodal.htmltext import (
    _decode_entities,
    _scan_tag,
    html_text_sql,
    parse_html_text,
    synth_html,
)
from danae_spark.multimodal.office import _meta_fields, _skip_markup

__all__ = [
    "parse_epub",
    "synth_epub",
    "epub_text_frame",
    "epub_text_roundtrip",
    "EPUB_TEXT_ORACLE",
]

EPUB_MIME = b"application/epub+zip"


def _opf_spine(xml: str) -> Optional[list[str]]:
    """Spine hrefs in reading order: manifest item id->href, then
    itemref idrefs resolved through it. Unknown idref → reject."""
    items: dict[str, str] = {}
    order: list[str] = []
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
        name, is_close, _self, attrs, pos = tag
        if name == "item" and not is_close:
            iid, href = attrs.get("id"), attrs.get("href")
            if iid and href:
                items[iid] = _decode_entities(href)
        elif name == "itemref" and not is_close:
            idref = attrs.get("idref")
            if not idref:
                return None
            order.append(idref)
    hrefs = []
    for idref in order:
        href = items.get(idref)
        if href is None:
            return None
        hrefs.append(href)
    return hrefs


def parse_epub(payload: bytes) -> Optional[dict]:
    """{title, creator, n_chapters, text, n_chars, n_words} or None
    (reject-whole)."""
    members = _zip_members(payload)
    if not members:
        return None
    first = members[0]
    if first[0] != "mimetype" or first[4] != EPUB_MIME:
        return None
    by_name = {name: data for name, is_dir, _u, _c, data in members if not is_dir}

    container = by_name.get("META-INF/container.xml")
    if container is None:
        return None
    try:
        cxml = container.decode("utf-8")
    except UnicodeDecodeError:
        return None
    m = re.search(r"<rootfile\s[^>]*\bfull-path=\"([^\"]*)\"", cxml)
    if not m:
        return None
    opf_path = _decode_entities(m.group(1))
    opf_part = by_name.get(opf_path)
    if opf_part is None:
        return None
    try:
        opf = opf_part.decode("utf-8")
    except UnicodeDecodeError:
        return None

    meta = _meta_fields(opf, ("dc:title", "dc:creator"))
    if meta is None:
        return None
    spine = _opf_spine(opf)
    if spine is None or not spine:
        return None

    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    chapters = []
    for href in spine:
        body = by_name.get(base + href)
        if body is None:
            return None
        ext = parse_html_text(body)
        if ext is None:
            return None  # a chapter that cannot be walked rejects the book
        chapters.append(ext["text"])
    text = "\n".join(chapters)
    return {
        "title": meta["dc:title"],
        "creator": meta["dc:creator"],
        "n_chapters": len(spine),
        "text": text,
        "n_chars": len(text),
        "n_words": len(text.split()),
    }


# ----------------------------------------------------------- synthesis
#
# Chapters reuse synth_html at e = d*5 + k (k in 0..n_chapters-1,
# n_chapters = 1 + d % 3), so the oracle restates chapter text through
# the SAME html_text_sql fragment the html/warc entries certify.
# OPF title 'Book {d} t{d%8}', creator 'author a{d%5}';
# d % 23 == 0 -> truncated package (reject leg).


def epub_n_chapters(d: int) -> int:
    return 1 + d % 3


def synth_epub(d: int) -> bytes:
    container = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:'
        'xmlns:container"><rootfiles>'
        '<rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/>'
        "</rootfiles></container>"
    )
    n_chap = epub_n_chapters(d)
    manifest = "".join(
        f'<item id="c{k}" href="ch{k}.xhtml" media-type="application/xhtml+xml"/>'
        for k in range(n_chap)
    )
    spine = "".join(f'<itemref idref="c{k}"/>' for k in range(n_chap))
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f"<dc:title>Book {d} t{d % 8}</dc:title>"
        f"<dc:creator>author a{d % 5}</dc:creator>"
        "</metadata>"
        f"<manifest>{manifest}</manifest>"
        f"<spine>{spine}</spine></package>"
    )
    entries = [
        ("mimetype", EPUB_MIME, 0),  # stored + first, per OCF
        ("META-INF/container.xml", container.encode(), 8),
        ("OEBPS/content.opf", opf.encode(), 8),
    ]
    for k in range(n_chap):
        entries.append((f"OEBPS/ch{k}.xhtml", synth_html(d * 5 + k), 8))
    raw = _zip_build(entries)
    if d % 23 == 0:
        return raw[:-7]
    return raw


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, title string, creator string, n_chapters int, "
    "text string, n_chars int, n_words int"
)
_COLS = ["title", "creator", "n_chapters", "text", "n_chars", "n_words"]


def epub_text_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """EPUB text extraction over any (id, binary) frame: one
    Arrow-batched narrow map, no shuffle."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_epub, _COLS, _SCHEMA, id_col, payload_col)


def epub_text_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real EPUB (OCF stored
    mimetype, container.xml, OPF manifest+spine, XHTML chapters) is
    built byte-for-byte, walked by the validating ZIP reader, the
    chapters extracted by the certified HTML extractor in spine
    order, and everything restated via the shared html_text_sql
    fragment in EPUB_TEXT_ORACLE."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_epub, parse_epub, _COLS, _SCHEMA)


_CHAPTERS_CTE = """
SELECT d.doc_id, d.doc_id * 5 + k.k AS e
FROM documents d, generate_series(0, 2) k(k)
WHERE k.k < 1 + d.doc_id % 3 AND d.doc_id % 23 <> 0
"""

EPUB_TEXT_ORACLE = f"""
WITH chap AS ({html_text_sql(_CHAPTERS_CTE)}),
agg AS (
  SELECT doc_id,
         string_agg(text, chr(10) ORDER BY e) AS text,
         CAST(count(*) AS INT) AS n_chapters,
         CAST(sum(n_words) AS INT) AS n_words
  FROM chap GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN d.doc_id % 23 = 0 THEN NULL
            ELSE 'Book ' || CAST(d.doc_id AS VARCHAR) || ' t'
                 || CAST(d.doc_id % 8 AS VARCHAR) END AS title,
       CASE WHEN d.doc_id % 23 = 0 THEN NULL
            ELSE 'author a' || CAST(d.doc_id % 5 AS VARCHAR) END AS creator,
       a.n_chapters, a.text,
       CAST(length(a.text) AS INT) AS n_chars,
       a.n_words
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""
