"""Text harvest — the one-pass "what text is IN this blob" dispatcher
for document-class payloads, the counterpart of media triage
(multimodal/triage.py) for the text side of a crawl.

A crawl's binary column mixes PDFs, HTML pages, WARC captures,
archives, subtitle sidecars, and plain text. harvest_text classifies
each payload and routes it to the right validated extractor, emitting
one (doc_class, format, title, text) row — the single entry point a
curation pipeline runs to turn a heterogeneous blob column into a
text column:

  - %PDF magic        -> classic-PDF reader (multimodal/pdf.py)
  - WARC/ or .warc.gz -> WARC walk; every HTTP-200 text/html response
                         body (chunked/gzip wires decoded) routed
                         through the HTML extractor, page texts joined
                         by newlines; a conversion-record-only WARC is
                         a WET sidecar — its pre-extracted page texts
                         join directly (format 'wet'/'wet.gz')
                         (warc.py, htmltext.py)
  - zip / tar / tar.gz-> archive walk with full data verification;
                         subtitle members' transcripts extracted and
                         joined, other members skipped (archive.py,
                         subtitles.py)
  - SRT / WebVTT      -> cue parser transcript (subtitles.py)
  - markup            -> HTML -> text extraction (htmltext.py)
  - plain UTF-8       -> the text itself (no '<' anywhere: nothing to
                         strip; whitespace preserved verbatim)

Dispatch order is magic-first (PDF/gzip/zip/tar/WARC are
byte-unambiguous), then strict-grammar subtitles, then HTML/plain
split on the presence of '<'. Corrupt or unrecognized payloads yield
None — the extractors' reject-whole contracts propagate.

Reference parity note: the reference (smartdatalake/danae) has no
document ingestion; this is mandated LLM-pipeline extension surface
(the capstone dispatcher over the r10 crawl-ingestion formats).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

__all__ = [
    "harvest_text",
    "synth_doc",
    "text_harvest_frame",
    "text_harvest_roundtrip",
    "TEXT_HARVEST_ORACLE",
]


def harvest_text(
    payload: bytes, _depth: int = 0, drop_boilerplate: bool = False
) -> dict | None:
    """Classify one payload and extract its training text:
    {'doc_class', 'format', 'title', 'text'} or None.

    Archive members route back through this dispatcher (one level
    deep: an archive inside an archive does not recurse), so a zip of
    HTML pages / PDFs / subtitles harvests all of them; plain-text
    members contribute only under a text extension (.txt/.md) — an
    unnamed binary blob that HAPPENS to decode must not leak control
    characters into a corpus. Non-UTF-8 HTML decodes per WHATWG
    precedence — HTTP-header charset (WARC route) > meta declaration >
    guarded windows-1252 fallback (htmltext._decode_page); binary
    payloads reject via the control-character sniff.
    `drop_boilerplate=True` (r12) applies the per-block boilerplate
    rule (htmltext.is_boilerplate_block) to every HTML leg — direct
    pages, WARC captures, and archive members — so a crawl harvest can
    ship prose-only text."""
    from danae_spark.multimodal.archive import iter_archive_members, parse_archive
    from danae_spark.multimodal.htmltext import parse_html_text
    from danae_spark.multimodal.pdf import parse_pdf
    from danae_spark.multimodal.subtitles import parse_subtitles
    from danae_spark.multimodal.warc import (
        content_type_charset,
        iter_warc_responses,
        iter_wet_texts,
        parse_warc,
    )

    p = bytes(payload) if payload is not None else b""
    if not p:
        return None

    if p.startswith(b"%PDF-"):
        r = parse_pdf(p)
        if r is None:
            return None
        return {
            "doc_class": "pdf",
            "format": "pdf",
            "title": r["title"],
            "text": r["text"],
        }

    if p[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        # CFB identity rule (r17): the compound-file signature claims
        # the OLE2 grammar — legacy .doc text / .xls SST strings, or
        # reject whole (fast-saved docs and non-document CFBs must not
        # leak bytes into the corpus)
        from danae_spark.multimodal.cfb import parse_cfb_office

        cfb = parse_cfb_office(p)
        if cfb is None or cfb["text"] is None:
            return None
        return {
            "doc_class": cfb["kind"],
            "format": "cfb-" + cfb["kind"],
            "title": None,
            "text": cfb["text"],
        }

    def _warc(fmt: str) -> dict | None:
        pages = []
        for _uri, status, ctype, body in iter_warc_responses(p):
            if status == 200 and (ctype or "").startswith("text/html"):
                ext = parse_html_text(
                    body, content_type_charset(ctype),
                    drop_boilerplate=drop_boilerplate,
                )
                if ext is None:
                    return None  # a 200 html body that cannot be walked
                pages.append(ext["text"])
        if not pages:
            # a WET sidecar: conversion records carrying the already-
            # extracted page text (Common Crawl's .wet convention)
            pages = [t for _uri, t in iter_wet_texts(p)]
            if pages:
                return {
                    "doc_class": "warc",
                    "format": "wet" if fmt == "warc" else "wet.gz",
                    "title": None,
                    "text": "\n".join(pages),
                }
            return None
        return {
            "doc_class": "warc",
            "format": fmt,
            "title": None,
            "text": "\n".join(pages),
        }

    if p.startswith(b"WARC/"):
        return _warc("warc") if parse_warc(p) is not None else None

    def _archive(census: dict) -> dict | None:
        if _depth >= 1:
            return None  # archive-in-archive: declared no-recurse
        texts = []
        for name, is_dir, data in iter_archive_members(p):
            if is_dir:
                continue
            h = harvest_text(data, _depth + 1, drop_boilerplate=drop_boilerplate)
            if h is None:
                continue  # non-text member (media, unknown): skipped
            if h["doc_class"] == "text" and not name.lower().endswith(
                (".txt", ".md")
            ):
                continue  # decodable binary without a text extension
            texts.append(h["text"])
        if not texts:
            return None  # no text-bearing members
        return {
            "doc_class": "archive",
            "format": census["format"],
            "title": None,
            "text": "\n".join(texts),
        }

    if p[:2] == b"\x1f\x8b":
        # gzip: a .warc.gz (member-per-record) or a .tar.gz (single member)
        if parse_warc(p) is not None:
            return _warc("warc.gz")
        census = parse_archive(p)
        return _archive(census) if census is not None else None

    if p[:4] in (b"PK\x03\x04", b"PK\x05\x06") or (
        len(p) >= 512 and p[257:265] in (b"ustar\x0000", b"ustar  \x00")
    ):
        # office / e-book packages are ZIPs: route by package identity
        # first (stored-first odt/epub mimetype member, or
        # [Content_Types].xml + the main document part) — otherwise an
        # EPUB would "harvest" its OPF/container markup as archive
        # members; plain archives fall through to the member walk
        from danae_spark.multimodal.epub import parse_epub
        from danae_spark.multimodal.office import parse_office

        book = parse_epub(p)
        if book is not None:
            return {
                "doc_class": "epub",
                "format": "epub",
                "title": book["title"],
                "text": book["text"],
            }
        office = parse_office(p)
        if office is not None:
            return {
                "doc_class": "office",
                "format": office["format"],
                "title": office["title"],
                "text": office["text"],
            }
        census = parse_archive(p)
        return _archive(census) if census is not None else None

    if p[:6] == b"\xfd7zXZ\x00" or p[:3] == b"BZh" or p[:6] == b"7z\xbc\xaf\x27\x1c":
        # r17: the remaining archive magics (.tar.xz / .tar.bz2 / .7z)
        # reach the same member walk as zip/tar/tar.gz
        census = parse_archive(p)
        return _archive(census) if census is not None else None

    if p.startswith(b"{\\rtf"):
        # without this route an RTF file decodes as UTF-8 with no '<'
        # and ships as class "text" — control words leaking into the
        # corpus; reject-whole applies like everywhere else
        from danae_spark.multimodal.rtf import parse_rtf

        rtf = parse_rtf(p)
        if rtf is None:
            return None
        return {
            "doc_class": "rtf",
            "format": "rtf",
            "title": rtf["title"],
            "text": rtf["text"],
        }

    if p.lstrip()[:1] == b"{" and b'"nbformat"' in p:
        # notebook identity rule (r16): a payload carrying the
        # nbformat signature either parses as a notebook or rejects
        # whole — it must never fall through and ship its JSON
        # scaffolding as class "text"
        from danae_spark.multimodal.notebook import parse_notebook

        nb = parse_notebook(p)
        if nb is None:
            return None
        return {
            "doc_class": "notebook",
            "format": "ipynb",
            "title": nb["title"],
            "text": nb["text"],
        }

    if b"\\documentclass" in p[:65536] or b"\\begin{document}" in p[:65536]:
        # TeX identity rule (r16): a payload carrying the documentclass
        # / document-environment signature parses as LaTeX or rejects
        # whole — macros must not leak into the corpus as class "text"
        from danae_spark.multimodal.latex import parse_latex

        tex = parse_latex(p)
        if tex is None:
            return None
        return {
            "doc_class": "latex",
            "format": "tex",
            "title": tex["title"],
            "text": tex["text"],
        }

    from danae_spark.multimodal.eml import looks_like_mail, parse_mail

    if looks_like_mail(p):
        # mail identity rule (r16): the mbox `From ` magic or the
        # header-shape signature claims the RFC 5322/MIME grammar —
        # parse or reject whole (raw headers/base64 must not ship as
        # class "text")
        mail = parse_mail(p)
        if mail is None:
            return None
        return {
            "doc_class": "email",
            "format": mail["variant"],
            "title": mail["subject"],
            "text": mail["text"],
        }

    sub = parse_subtitles(p)
    if sub is not None:
        return {
            "doc_class": "subtitle",
            "format": sub["format"],
            "title": None,
            "text": sub["text"],
        }

    from danae_spark.operators.feeds import parse_feed

    feed = parse_feed(p)
    if feed is not None:
        return {
            "doc_class": "feed",
            "format": feed["kind"],
            "title": feed["feed_title"],
            "text": feed["text"],
        }

    from danae_spark.multimodal.svg import looks_like_svg, parse_svg

    if looks_like_svg(p):
        # SVG identity rule (r17): a payload whose FIRST element is
        # <svg> claims the SVG grammar — parse or reject whole (path
        # data and script bodies must not ship as class "text"/"html")
        sv = parse_svg(p)
        if sv is None:
            return None
        return {
            "doc_class": "svg",
            "format": "svg",
            "title": sv["title"],
            "text": sv["text"],
        }

    from danae_spark.multimodal.wikitext import (
        looks_like_wiki_dump,
        parse_wiki_dump,
    )

    if looks_like_wiki_dump(p):
        # MediaWiki identity rule (r17): a payload whose first element
        # is <mediawiki> claims the export grammar — article prose via
        # the wikitext stripper, or reject whole (markup and
        # non-article namespaces must not ship as class "html"/"text")
        wk = parse_wiki_dump(p)
        if wk is None:
            return None
        return {
            "doc_class": "wiki",
            "format": "mediawiki",
            "title": wk["title"],
            "text": wk["text"],
        }

    from danae_spark.multimodal.stackexchange import (
        looks_like_se_dump,
        parse_se_dump,
    )

    if looks_like_se_dump(p):
        # Stack Exchange identity rule (r17): a Posts.xml export claims
        # the dump grammar — Q&A prose via the row walk, or reject
        # whole (escaped HTML attributes must not ship as class "html")
        se = parse_se_dump(p)
        if se is None:
            return None
        return {
            "doc_class": "stackexchange",
            "format": "posts.xml",
            "title": se["title"],
            "text": se["text"],
        }

    from danae_spark.multimodal.htmltext import _decode_page, _looks_binary

    if _looks_binary(p):
        return None  # NULs / control density: binary, not a document
    try:
        raw = p.decode("utf-8")
    except UnicodeDecodeError:
        # not UTF-8: WHATWG ladder (meta charset, then the guarded
        # windows-1252 fallback); the class split below still applies,
        # so legacy PLAIN TEXT stays class "text" and the archive
        # text-extension guard keeps filtering it
        raw = _decode_page(p)
        if raw is None:
            return None
    if "<" not in raw:
        return {"doc_class": "text", "format": "txt", "title": None, "text": raw}
    ext = parse_html_text(p, drop_boilerplate=drop_boilerplate)
    if ext is None:
        return None
    return {
        "doc_class": "html",
        "format": "html",
        "title": ext["title"],
        "text": ext["text"],
    }


# ------------------------------------------------------------- synthesis


def synth_doc(doc_id: int) -> bytes:
    """Doc-deterministic MIXED document payload: doc_id % 10 selects
    the class (html / pdf / subtitle / plain text / warc / zip-of-
    subtitles / office docx-or-odt / rtf / epub / notebook); every
    payload is a byte-for-byte real file from the per-format
    synthesizers. The office / rtf / epub / notebook legs reuse their
    synths verbatim, INCLUDING the truncated/corrupt reject legs
    (d % 17, d % 13, d % 23, and the notebook trio) — a corrupt blob
    must yield a NULL harvest row, never partial text."""
    from danae_spark.multimodal.archive import _zip_build
    from danae_spark.multimodal.epub import synth_epub
    from danae_spark.multimodal.htmltext import synth_html
    from danae_spark.multimodal.notebook import synth_notebook
    from danae_spark.multimodal.office import synth_office
    from danae_spark.multimodal.pdf import synth_pdf
    from danae_spark.multimodal.rtf import synth_rtf
    from danae_spark.multimodal.subtitles import synth_subtitles
    from danae_spark.multimodal.warc import synth_warc

    d = doc_id
    cls = d % 10
    if cls == 9:
        return synth_notebook(d)
    if cls == 0:
        return synth_html(d)
    if cls == 1:
        return synth_pdf(d)
    if cls == 2:
        return synth_subtitles(d)
    if cls == 3:
        words = " ".join(f"t{(d * 3 + j) % 50}" for j in range(5 + d % 5))
        return words.encode("utf-8")
    if cls == 4:
        return synth_warc(d)
    if cls == 5:
        return _zip_build(
            [(f"cues{k}.srt", synth_subtitles(d * 4 + k), k % 2 * 8) for k in range(2)]
        )
    if cls == 6:
        return synth_office(d)
    if cls == 7:
        return synth_rtf(d)
    return synth_epub(d)


# ----------------------------------------------------- Spark entry points

_COLS = ["doc_class", "format", "title", "text", "n_chars", "n_words"]

_SCHEMA = (
    "doc_id bigint, doc_class string, format string, title string, "
    "text string, n_chars int, n_words int"
)


def text_harvest_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Text harvest over any (id, binary) frame: one row per payload
    with its class and extracted text (plus char/word counts); nulls
    for unrecognized or corrupt payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = harvest_text(bytes(payload)) if payload is not None else None
                row = {id_col: rid}
                if c is None:
                    row.update({k: None for k in _COLS})
                else:
                    row.update(c)
                    row["n_chars"] = len(c["text"])
                    row["n_words"] = len(c["text"].split())
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + _COLS)

    return df.mapInPandas(batches, schema=_SCHEMA.replace("doc_id", id_col, 1))


def text_harvest_roundtrip(spark, sf_dir: str):
    """Oracle-checkable harvest: per doc a real mixed-class document
    payload is synthesized (doc_id % 10 cycles html/pdf/subtitle/plain/
    warc/zip-of-subtitles/office/rtf/epub/notebook), dispatched by the real
    magic-first router to the real extractors, and the (doc_class,
    format, title, text) row restated in SQL — each class's text
    arithmetic reuses the SAME parameterized fragment as its unit
    entry (html_text_sql, pdf_text_sql, subtitle_text_sql,
    office_text_sql, rtf_text_sql), so the dispatcher and the unit
    entries can never drift apart."""
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
                c = harvest_text(synth_doc(d))
                row = {"doc_id": d}
                if c is None:
                    row.update({k: None for k in _COLS})
                else:
                    row.update(c)
                    row["n_chars"] = len(c["text"])
                    row["n_words"] = len(c["text"].split())
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + _COLS)

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_SCHEMA)
        .orderBy("doc_id")
    )


def _harvest_oracle() -> str:
    from danae_spark.multimodal.htmltext import html_text_sql
    from danae_spark.multimodal.office import office_text_sql
    from danae_spark.multimodal.pdf import pdf_text_sql
    from danae_spark.multimodal.rtf import rtf_text_sql
    from danae_spark.multimodal.subtitles import subtitle_text_sql

    html_unit = html_text_sql(
        "SELECT doc_id, doc_id AS e FROM documents WHERE doc_id % 10 = 0"
    )
    pdf_unit = pdf_text_sql(
        "SELECT doc_id, doc_id AS e FROM documents WHERE doc_id % 10 = 1"
    )
    sub_unit = subtitle_text_sql(
        "SELECT doc_id, doc_id AS e FROM documents WHERE doc_id % 10 = 2"
    )
    # WARC pages: e = doc_id*4 + p for the HTTP-200 pages (same
    # parameterization as the crawl_html_extract oracle)
    warc_pages = html_text_sql("""
SELECT d.doc_id, d.doc_id * 4 + p.p AS e
FROM documents d, generate_series(0, 2) p(p)
WHERE d.doc_id % 10 = 4 AND p.p < 1 + d.doc_id % 3
  AND (d.doc_id + p.p) % 5 <> 4
""")
    # zip members: subtitle transcripts at e = doc_id*4 + k, k in (0, 1)
    zip_subs = subtitle_text_sql("""
SELECT d.doc_id, d.doc_id * 4 + k.k AS e
FROM documents d, generate_series(0, 1) k(k)
WHERE d.doc_id % 10 = 5
""")
    # office docs (d = doc_id): the synth reject leg (d % 17 == 0,
    # truncated package) is EXCLUDED here and emitted as NULL rows —
    # harvest must reject a corrupt package whole. Office text carries
    # TABs and double spaces, so its token count comes from the shared
    # fragment's arithmetic, not the space-counting formula.
    office_unit = office_text_sql(
        "SELECT doc_id, doc_id AS d FROM documents "
        "WHERE doc_id % 10 = 6 AND doc_id % 17 <> 0"
    )
    # rtf docs: same pattern (reject leg d % 13 == 0); rtf text carries
    # TABs and escape-derived tokens, so n_words comes from the
    # fragment too
    rtf_unit = rtf_text_sql(
        "SELECT doc_id, doc_id AS d FROM documents "
        "WHERE doc_id % 10 = 7 AND doc_id % 13 <> 0"
    )
    # epub chapters: the SAME html fragment at e = d*5 + k in spine
    # order (reject leg d % 23 == 0)
    epub_chaps = html_text_sql("""
SELECT d.doc_id, d.doc_id * 5 + k.k AS e
FROM documents d, generate_series(0, 2) k(k)
WHERE d.doc_id % 10 = 8 AND d.doc_id % 23 <> 0 AND k.k < 1 + d.doc_id % 3
""")
    # notebooks (r16): the SAME parameterized fragment as the
    # notebook_text_extract unit entry; its three reject legs excluded
    # here and emitted as NULL rows below. Notebook text carries
    # consecutive newlines, so n_words comes from cell arithmetic
    # (3 title tokens + 6 per code cell + 10 per extra markdown cell),
    # not the space-counting default.
    from danae_spark.multimodal.notebook import notebook_text_sql

    nb_unit = notebook_text_sql(
        "SELECT doc_id, doc_id AS d FROM documents "
        "WHERE doc_id % 10 = 9 AND doc_id % 17 <> 3 "
        "AND doc_id % 19 <> 6 AND doc_id % 23 <> 11"
    )
    return f"""
WITH html_u AS ({html_unit}),
pdf_u AS ({pdf_unit}),
sub_u AS ({sub_unit}),
warc_p AS ({warc_pages}),
warc_u AS (
  SELECT doc_id, string_agg(text, chr(10) ORDER BY e) AS text
  FROM warc_p GROUP BY doc_id
),
zip_p AS ({zip_subs}),
zip_u AS (
  SELECT doc_id, string_agg(text, chr(10) ORDER BY e) AS text
  FROM zip_p GROUP BY doc_id
),
office_u AS ({office_unit}),
rtf_u AS ({rtf_unit}),
epub_p AS ({epub_chaps}),
epub_u AS (
  SELECT doc_id, string_agg(text, chr(10) ORDER BY e) AS text
  FROM epub_p GROUP BY doc_id
),
nb_u AS ({nb_unit}),
plain_u AS (
  SELECT d.doc_id, string_agg('t' || CAST((d.doc_id * 3 + j.j) % 50 AS VARCHAR),
                              ' ' ORDER BY j.j) AS text
  FROM documents d, generate_series(0, 9) j(j)
  WHERE d.doc_id % 10 = 3 AND j.j < 5 + d.doc_id % 5
  GROUP BY d.doc_id
),
unified AS (
  SELECT doc_id, 'html' AS doc_class, 'html' AS format, title, text,
         CAST(NULL AS INT) AS n_words_override
  FROM html_u
  UNION ALL
  SELECT doc_id, 'pdf', 'pdf', title, text, NULL FROM pdf_u
  UNION ALL
  SELECT doc_id, 'subtitle', format, NULL, text, NULL FROM sub_u
  UNION ALL
  SELECT doc_id, 'text', 'txt', NULL, text, NULL FROM plain_u
  UNION ALL
  -- synth_warc emits plain WARC for even ids, gzip member-per-record
  -- for odd ids
  SELECT doc_id, 'warc',
         CASE WHEN doc_id % 2 = 0 THEN 'warc' ELSE 'warc.gz' END,
         NULL, text, NULL
  FROM warc_u
  UNION ALL
  SELECT doc_id, 'archive', 'zip', NULL, text, NULL FROM zip_u
  UNION ALL
  SELECT doc_id, 'office', format, title, text, n_tokens FROM office_u
  UNION ALL
  SELECT doc_id, 'rtf', 'rtf', title, text, n_tokens FROM rtf_u
  UNION ALL
  SELECT e.doc_id, 'epub', 'epub',
         'Book ' || CAST(e.doc_id AS VARCHAR) || ' t'
           || CAST(e.doc_id % 8 AS VARCHAR),
         e.text, NULL
  FROM epub_u e
  UNION ALL
  SELECT n.doc_id, 'notebook', 'ipynb', n.title, n.text,
         CAST(3 + 6 * (1 + n.doc_id % 4) + 10 * (n.doc_id % 3) AS INT)
  FROM nb_u n
  UNION ALL
  -- reject legs -> NULL rows: truncated office / rtf / epub packages
  -- + the notebook trio (truncated JSON / nbformat 3 / bad cells)
  SELECT doc_id, NULL, NULL, NULL, NULL, NULL FROM documents
  WHERE (doc_id % 10 = 6 AND doc_id % 17 = 0)
     OR (doc_id % 10 = 7 AND doc_id % 13 = 0)
     OR (doc_id % 10 = 8 AND doc_id % 23 = 0)
     OR (doc_id % 10 = 9 AND (doc_id % 17 = 3 OR doc_id % 19 = 6
                              OR doc_id % 23 = 11))
  UNION ALL
  -- a WARC whose only captures are the excluded (d+p) % 5 = 4 pages:
  -- no text-bearing records -> the dispatcher yields a NULL row
  SELECT doc_id, NULL, NULL, NULL, NULL, NULL FROM documents
  WHERE doc_id % 10 = 4 AND doc_id % 5 = 4 AND doc_id % 3 = 0
)
SELECT doc_id, doc_class, format, title, text,
       CAST(length(text) AS INT) AS n_chars,
       COALESCE(n_words_override,
                CAST(length(text)
                     - length(replace(replace(text, chr(10), ' '), ' ', ''))
                     + 1 AS INT)) AS n_words
FROM unified
ORDER BY doc_id
"""


TEXT_HARVEST_ORACLE = _harvest_oracle()


def corpus_format_census(spark, sf_dir: str):
    """What's in my lake: per (doc_class, format) counts and text
    volume over the harvest output, rejects surfacing as the NULL
    class instead of vanishing. One map-side-combined aggregate on
    top of the certified dispatch plan."""
    import pyspark.sql.functions as F

    h = text_harvest_roundtrip(spark, sf_dir)
    return (
        h.groupBy("doc_class", "format")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_words").cast("bigint").alias("total_words"),
        )
        .orderBy("doc_class", "format")
    )


CORPUS_FORMAT_CENSUS_ORACLE = f"""
WITH h AS ({{harvest}})
SELECT doc_class, format,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_words) AS BIGINT) AS total_words
FROM h GROUP BY doc_class, format
ORDER BY doc_class, format
""".format(harvest=_harvest_oracle())
