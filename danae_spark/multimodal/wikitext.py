"""MediaWiki dump extraction — the Wikipedia corpus class.

Wikipedia (and every MediaWiki wiki) ships as an XML export: a
`<mediawiki>` root, `<siteinfo>`, then `<page>` elements whose
`<text>` payload is wikitext — the single most curated prose corpus
in any pretraining mix. The extractor walks the export once:

  - page routing: ns != 0 pages (Template:, Talk:, ...) are COUNTED
    and excluded from text; #REDIRECT pages are counted and excluded
    (a redirect is plumbing, not prose); articles extract in page
    order;
  - wikitext stripping, block-structured like the source: comments
    `<!-- -->` removed; templates `{{..}}` removed with nesting
    (counted — an infobox is layout, not prose); tables `{| .. |}`
    removed whole; `<ref>..</ref>` / `<ref/>` removed (counted: a
    citation marker is not prose); headings `== H ==` become their
    own paragraphs (counted); `[[target|label]]` keeps the label
    (counted), `[[File:..]]` / `[[Image:..]]` / `[[Category:..]]`
    drop whole; `[url label]` keeps the label; bold/italic quote runs
    strip; `*`/`#` list items become `- ` paragraphs, `:`/`;`
    indentation strips; simple inline HTML (b/i/span/sup/...) strips
    to its content, `<br>` breaks the line;
  - reject-whole (identity-first, the repo rule): unterminated
    comment/ref, unbalanced template braces or link brackets,
    an UNKNOWN html-like tag (`<math>`, `<gallery>`, ... — the
    documented subset boundary: a payload using grammar we do not
    certify must not ship partial text), or a torn XML tree;
  - normalization: blocks collapse inner whitespace, join with one
    blank line; each article contributes its title + body blocks.

Reference parity note: the reference engine (SURVEY §1) has no
document extraction; extension surface like multimodal/latex.py.
"""

from __future__ import annotations

import re
from typing import Optional

__all__ = [
    "looks_like_wiki_dump",
    "parse_wiki_dump",
    "synth_wiki_dump",
    "wiki_text_sql",
    "wiki_extract_frame",
    "wiki_extract_roundtrip",
    "WIKI_EXTRACT_ORACLE",
]

_MAX_BYTES = 64 * 1024 * 1024


class _Bad(Exception):
    pass


_ENTITIES = {"lt": "<", "gt": ">", "amp": "&", "quot": '"', "apos": "'"}
# common HTML references wikitext uses beyond XML's five; anything
# else stays literal in tolerant mode ("R&D; work" is prose, not markup)
_HTML_ENTITIES = {**_ENTITIES, "nbsp": " ", "ndash": "–",
                  "mdash": "—", "hellip": "…"}


def _unescape(s: str, strict: bool = True) -> str:
    table = _ENTITIES if strict else _HTML_ENTITIES

    def sub(m: re.Match) -> str:
        name = m.group(1)
        try:
            if name.startswith(("#x", "#X")):
                return chr(int(name[2:], 16))
            if name.startswith("#"):
                return chr(int(name[1:]))
        except (ValueError, OverflowError):
            if strict:
                raise _Bad
            return m.group(0)
        if name in table:
            return table[name]
        if strict:
            raise _Bad  # an entity XML itself would not produce
        return m.group(0)

    return re.sub(r"&(#?[0-9a-zA-Z]+);", sub, s)


def _tag_text(src: str, tag: str, start: int, end: int) -> Optional[str]:
    """First <tag ...>content</tag> inside src[start:end], entity-decoded."""
    o = src.find(f"<{tag}", start, end)
    if o < 0:
        return None
    gt = src.find(">", o, end)
    if gt < 0:
        raise _Bad
    if src[gt - 1] == "/":  # self-closing
        return ""
    c = src.find(f"</{tag}>", gt, end)
    if c < 0:
        raise _Bad
    return _unescape(src[gt + 1 : c])


def looks_like_wiki_dump(payload: bytes) -> bool:
    """Identity sniff for the harvest router: True iff the FIRST
    normal element of the payload is <mediawiki> — a page that merely
    MENTIONS the export format stays whatever class it is."""
    from danae_spark.multimodal.svg import _skip_markup

    head = bytes(payload[:4096]).decode("utf-8", "ignore")
    pos = 0
    while pos < len(head):
        while pos < len(head) and head[pos] in " \t\r\n﻿":
            pos += 1
        if pos >= len(head) or head[pos] != "<":
            return False
        skip = _skip_markup(head, pos)
        if skip is None:
            return False
        if skip != -1:
            pos = skip
            continue
        return head.startswith("<mediawiki", pos) and (
            len(head) > pos + 10 and head[pos + 10] in " \t\r\n>"
        )
    return False


# ------------------------------------------------------ wikitext stripper

_INLINE_TAGS = (
    "b|i|u|s|em|strong|sup|sub|small|big|span|div|center|tt|code|var|abbr"
)
_INLINE_TAG_RE = re.compile(rf"</?(?:{_INLINE_TAGS})(?:\s[^>]*)?>")
_BR_RE = re.compile(r"<br\s*/?>", re.I)
_HEADING_RE = re.compile(r"^(={2,6})\s*(.*?)\s*\1\s*$")
_MAGIC_RE = re.compile(r"__[A-Z]+__")
_EXT_LINK_RE = re.compile(r"\[(\w+://[^\s\]]+)(?:\s+([^\]]*))?\]")


def _strip_comments(src: str, counts: dict) -> str:
    out = []
    i = 0
    while True:
        o = src.find("<!--", i)
        if o < 0:
            out.append(src[i:])
            return "".join(out)
        c = src.find("-->", o + 4)
        if c < 0:
            raise _Bad  # unterminated comment
        out.append(src[i:o])
        counts["n_comments"] = counts.get("n_comments", 0) + 1
        i = c + 3


def _strip_refs(src: str, counts: dict) -> str:
    out = []
    i = 0
    while True:
        o = src.find("<ref", i)
        if o < 0:
            out.append(src[i:])
            return "".join(out)
        gt = src.find(">", o)
        if gt < 0:
            raise _Bad
        out.append(src[i:o])
        counts["n_refs"] += 1
        if src[gt - 1] == "/":  # <ref name=x/>
            i = gt + 1
            continue
        c = src.find("</ref>", gt)
        if c < 0:
            raise _Bad  # unterminated ref
        i = c + 6


def _strip_templates(src: str, counts: dict) -> str:
    """Remove {{..}} with nesting; {{{..}}} parameters reject (they
    only occur inside template DEFINITIONS, which are ns=10 pages)."""
    out = []
    i, n = 0, len(src)
    depth = 0
    while i < n:
        if src.startswith("{{{", i):
            raise _Bad
        if src.startswith("{{", i):
            if depth == 0:
                counts["n_templates"] += 1
            depth += 1
            i += 2
            continue
        if src.startswith("}}", i) and depth:
            depth -= 1
            i += 2
            continue
        if depth == 0:
            out.append(src[i])
        i += 1
    if depth:
        raise _Bad  # unbalanced template braces
    return "".join(out)


def _strip_tables(src: str, counts: dict) -> str:
    """Remove block tables: lines from `{|` through `|}` inclusive."""
    kept = []
    depth = 0
    for line in src.split("\n"):
        s = line.lstrip()
        if s.startswith("{|"):
            if depth == 0:
                counts["n_tables"] += 1
                kept.append("")  # a table is a block: break the paragraph
            depth += 1
            continue
        if depth and s.startswith("|}"):
            depth -= 1
            continue
        if depth == 0:
            kept.append(line)
    if depth:
        raise _Bad  # unterminated table
    return "\n".join(kept)


def _strip_links(src: str, counts: dict) -> str:
    out = []
    i, n = 0, len(src)
    while i < n:
        if src.startswith("[[", i):
            j = i + 2
            depth = 1
            while j < n and depth:
                if src.startswith("[[", j):
                    depth += 1
                    j += 2
                elif src.startswith("]]", j):
                    depth -= 1
                    j += 2
                else:
                    j += 1
            if depth:
                raise _Bad  # unbalanced link brackets
            inner = src[i + 2 : j - 2]
            head = inner.split("|", 1)[0].strip().lower()
            if head.split(":", 1)[0] in ("file", "image", "category"):
                counts["n_media_cat"] += 1
            else:
                counts["n_links"] += 1
                out.append(inner.rsplit("|", 1)[-1])
            i = j
            continue
        out.append(src[i])
        i += 1
    return "".join(out)


def _strip_inline(src: str, counts: dict) -> str:
    src = _strip_links(src, counts)

    def ext(m: re.Match) -> str:
        counts["n_extlinks"] += 1
        return m.group(2) or ""

    src = _EXT_LINK_RE.sub(ext, src)
    for q in ("'''''", "'''", "''"):
        src = src.replace(q, "")
    src = _BR_RE.sub(" ", src)
    src = _INLINE_TAG_RE.sub("", src)
    src = _MAGIC_RE.sub("", src)
    # an html-like tag we did not certify (math, gallery, nowiki, a
    # torn ref, ...) must reject whole, never leak markup as prose
    if re.search(r"<[a-zA-Z/]", src):
        raise _Bad
    # character references decode LAST — &lt;ref&gt; is the author
    # writing a literal "<ref>", prose by construction, never markup
    return _unescape(src, strict=False)


def _strip_wikitext(src: str, counts: dict) -> str:
    """Full stripper: returns blank-line-joined blocks."""
    src = _strip_comments(src, counts)
    src = _strip_refs(src, counts)
    src = _strip_templates(src, counts)
    src = _strip_tables(src, counts)
    blocks: list[str] = []
    para: list[str] = []

    def flush() -> None:
        if para:
            text = re.sub(r"\s+", " ", " ".join(para)).strip()
            if text:
                blocks.append(text)
            para.clear()

    for line in src.split("\n"):
        line = line.strip()
        if not line:
            flush()
            continue
        m = _HEADING_RE.match(line)
        if m:
            flush()
            counts["n_headings"] += 1
            h = re.sub(r"\s+", " ", _strip_inline(m.group(2), counts)).strip()
            if h:
                blocks.append(h)
            continue
        if line[0] in "*#":
            flush()
            item = _strip_inline(line.lstrip("*#").strip(), counts)
            item = re.sub(r"\s+", " ", item).strip()
            if item:
                blocks.append("- " + item)
            continue
        if line[0] in ":;":
            # definition-list term/definition: each its own block
            flush()
            item = _strip_inline(line.lstrip(":;").strip(), counts)
            item = re.sub(r"\s+", " ", item).strip()
            if item:
                blocks.append(item)
            continue
        para.append(_strip_inline(line, counts))
    flush()
    return "\n\n".join(blocks)


# ------------------------------------------------------------ dump parser


def parse_wiki_dump(payload: bytes) -> Optional[dict]:
    try:
        return _parse(payload)
    except (_Bad, ValueError, UnicodeDecodeError, IndexError):
        return None


def _parse(payload: bytes) -> Optional[dict]:
    p = bytes(payload) if payload is not None else b""
    if not p or len(p) > _MAX_BYTES:
        return None
    src = p.decode("utf-8")
    if "<mediawiki" not in src.split(">", 1)[0]:
        return None  # not claiming the grammar
    if "</mediawiki>" not in src:
        raise _Bad  # torn tree
    site = None
    si = src.find("<siteinfo>")
    if si >= 0:
        se = src.find("</siteinfo>", si)
        if se < 0:
            raise _Bad
        site = _tag_text(src, "sitename", si, se)
    counts = {
        "n_pages": 0, "n_articles": 0, "n_redirects": 0, "n_skipped_ns": 0,
        "n_templates": 0, "n_links": 0, "n_refs": 0, "n_headings": 0,
        "n_tables": 0, "n_media_cat": 0, "n_extlinks": 0, "n_comments": 0,
    }
    parts: list[str] = []
    first_title = None
    i = 0
    while True:
        o = src.find("<page>", i)
        if o < 0:
            break
        c = src.find("</page>", o)
        if c < 0:
            raise _Bad
        counts["n_pages"] += 1
        title = _tag_text(src, "title", o, c)
        ns_s = _tag_text(src, "ns", o, c)
        if title is None or ns_s is None:
            raise _Bad
        body = _tag_text(src, "text", o, c)
        if body is None:
            raise _Bad
        i = c + 7
        if int(ns_s) != 0:
            counts["n_skipped_ns"] += 1
            continue
        if (
            "<redirect" in src[o:c]
            or body.lstrip().lower().startswith("#redirect")
        ):
            counts["n_redirects"] += 1
            continue
        counts["n_articles"] += 1
        if first_title is None:
            first_title = title
        text = _strip_wikitext(body, counts)
        parts.append(title + ("\n\n" + text if text else ""))
    if counts["n_pages"] == 0:
        raise _Bad  # an export with no pages is a torn or foreign file
    return {
        "site": site,
        "n_pages": counts["n_pages"],
        "n_articles": counts["n_articles"],
        "n_redirects": counts["n_redirects"],
        "n_templates": counts["n_templates"],
        "n_links": counts["n_links"],
        "n_refs": counts["n_refs"],
        "n_headings": counts["n_headings"],
        "title": first_title,
        "text": "\n\n".join(parts),
    }


# ------------------------------------------------------------- synthesis
#
# Grid (restated in wiki_text_sql / WIKI_EXTRACT_ORACLE):
#   site        'Wiki {d%5}'
#   articles    A = 1 + d%3, titles 'Article {d} {p}'; each body has a
#               bold lede with a <ref>, an {{Infobox}} template line,
#               an '== History ==' heading, a paragraph with two
#               internal links and a comment, two '*' list items, an
#               external-link sentence (plus a {{cn}} template when
#               (d+p)%2 == 1), and a [[Category:..]] line
#   redirect    d%4 == 1 adds one #REDIRECT page (counted, no text)
#   template ns d%5 == 2 adds one ns=10 Template: page (counted,
#               excluded — its {{{1}}} parameter never reaches the
#               stripper)
#   rejects     d%13 == 5 unbalanced template braces; d%19 == 2
#               unterminated comment; d%29 == 17 truncated XML


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _page(title: str, ns: int, body: str, redirect: str | None = None) -> str:
    r = f'    <redirect title="{_esc(redirect)}" />\n' if redirect else ""
    return (
        "  <page>\n"
        f"    <title>{_esc(title)}</title>\n"
        f"    <ns>{ns}</ns>\n{r}"
        "    <revision>\n"
        f'      <text bytes="{len(body.encode())}">{_esc(body)}</text>\n'
        "    </revision>\n"
        "  </page>\n"
    )


def synth_wiki_dump(d: int) -> bytes:
    na = 1 + d % 3
    pages = []
    for p in range(na):
        body_lines = [
            f"'''Article {d} {p}''' is about topic {d % 50}."
            f"<ref>src {d}</ref>",
            f"{{{{Infobox topic|value={d % 23}}}}}",
            "== History ==",
            f"It links to [[Other {d}|other {p}]] and [[Plain {d % 7}]]."
            f"<!-- hidden {d} -->",
            f"* first fact {d}",
            f"* second fact {p}",
            f"The [http://ex.org/{d} site {d}] confirms."
            + (f"{{{{cn|date={d}}}}}" if (d + p) % 2 == 1 else ""),
            f"[[Category:Cat {d % 11}]]",
        ]
        if d % 13 == 5 and p == na - 1:
            body_lines.append("{{broken template never closes")
        if d % 19 == 2 and p == na - 1:
            body_lines.append("<!-- never closed")
        pages.append(_page(f"Article {d} {p}", 0, "\n".join(body_lines)))
    if d % 4 == 1:
        pages.append(
            _page(
                f"Redirect {d}", 0, f"#REDIRECT [[Article {d} 0]]",
                redirect=f"Article {d} 0",
            )
        )
    if d % 5 == 2:
        pages.append(
            _page(f"Template:Tp {d}", 10, "{{{1}}} boilerplate")
        )
    xml = (
        '<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.11/" '
        'version="0.11" xml:lang="en">\n'
        "  <siteinfo>\n"
        f"    <sitename>Wiki {d % 5}</sitename>\n"
        "  </siteinfo>\n" + "".join(pages) + "</mediawiki>\n"
    )
    raw = xml.encode("utf-8")
    if d % 29 == 17:
        raw = raw[:-40]  # torn tree
    return raw


def wiki_text_sql(docs_cte: str) -> str:
    """Parameterized (doc_id, title, text) fragment over a CTE with
    (doc_id, d); excludes the reject legs (callers filter)."""
    return f"""
WITH wk AS ({docs_cte}),
arts AS (
  SELECT wk.doc_id,
         string_agg(
           'Article ' || wk.d || ' ' || a.p
           || chr(10) || chr(10)
           || 'Article ' || wk.d || ' ' || a.p || ' is about topic '
           || (wk.d % 50) || '.'
           || chr(10) || chr(10) || 'History'
           || chr(10) || chr(10) || 'It links to other ' || a.p
           || ' and Plain ' || (wk.d % 7) || '.'
           || chr(10) || chr(10) || '- first fact ' || wk.d
           || chr(10) || chr(10) || '- second fact ' || a.p
           || chr(10) || chr(10) || 'The site ' || wk.d || ' confirms.',
           chr(10) || chr(10) ORDER BY a.p) AS text
  FROM wk JOIN generate_series(0, 2) a(p) ON a.p < 1 + wk.d % 3
  GROUP BY wk.doc_id
)
SELECT wk.doc_id,
       'Article ' || CAST(wk.d AS VARCHAR) || ' 0' AS title,
       arts.text
FROM wk JOIN arts USING (doc_id)
"""


# ----------------------------------------------------- Spark entry points

_COLS = [
    "site", "n_pages", "n_articles", "n_redirects", "n_templates",
    "n_links", "n_refs", "n_headings", "title", "text",
]
_SCHEMA = (
    "doc_id bigint, site string, n_pages int, n_articles int, "
    "n_redirects int, n_templates int, n_links int, n_refs int, "
    "n_headings int, title string, text string"
)


def wiki_extract_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """parse_wiki_dump over any (id, binary) frame — one narrow Arrow
    map, NULL rows for rejects."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_wiki_dump, _COLS, _SCHEMA,
                              id_col, payload_col)


def wiki_extract_roundtrip(spark, sf_dir: str):
    """Oracle roundtrip: per doc a real MediaWiki export (articles
    with templates/refs/links/lists/headings/categories, a redirect
    leg, a Template-namespace leg, three reject legs) is synthesized,
    extracted by the real stripper, every column restated as doc_id
    arithmetic."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_wiki_dump, parse_wiki_dump,
                           _COLS, _SCHEMA)


_OK = "doc_id % 13 <> 5 AND doc_id % 19 <> 2 AND doc_id % 29 <> 17"

_TEXT_FRAGMENT = wiki_text_sql(
    f"SELECT doc_id, doc_id AS d FROM documents WHERE {_OK}"
)

WIKI_EXTRACT_ORACLE = f"""
WITH ok AS (
  SELECT doc_id, doc_id AS d FROM documents WHERE {_OK}
),
txt AS ({_TEXT_FRAGMENT}),
tpl AS (
  SELECT ok.doc_id,
         CAST(sum(1 + (ok.d + a.p) % 2) AS INT) AS n_templates
  FROM ok JOIN generate_series(0, 2) a(p) ON a.p < 1 + ok.d % 3
  GROUP BY ok.doc_id
)
SELECT d.doc_id,
       CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE 'Wiki ' || CAST(d.doc_id % 5 AS VARCHAR) END AS site,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE 1 + d.doc_id % 3
                 + CASE WHEN d.doc_id % 4 = 1 THEN 1 ELSE 0 END
                 + CASE WHEN d.doc_id % 5 = 2 THEN 1 ELSE 0 END
            END AS INT) AS n_pages,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE 1 + d.doc_id % 3 END AS INT) AS n_articles,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            WHEN d.doc_id % 4 = 1 THEN 1 ELSE 0 END AS INT) AS n_redirects,
       tpl.n_templates,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE 2 * (1 + d.doc_id % 3) END AS INT) AS n_links,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE 1 + d.doc_id % 3 END AS INT) AS n_refs,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE 1 + d.doc_id % 3 END AS INT) AS n_headings,
       txt.title,
       txt.text
FROM documents d
LEFT JOIN ok USING (doc_id)
LEFT JOIN txt USING (doc_id)
LEFT JOIN tpl USING (doc_id)
ORDER BY d.doc_id
"""
