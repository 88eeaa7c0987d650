"""SVG census + text extraction — the last common web image format
with no route (it is XML, not a raster codec).

Reuses the repo's quote-aware XML machinery (htmltext._scan_tag /
_decode_entities, office._skip_markup) with one addition: explicit
`<![CDATA[ ... ]]>` handling, because script payloads legally contain
'>' (the generic `<!` skip would desynchronize on them).

Census: root dimensions (width/height with an optional px suffix —
other units reject: a census must not guess unit conversions),
viewBox extents, element / shape / text / script / anchor counts,
first <title>, and the extracted text — character data inside
<text>/<tspan>/<textPath> subtrees plus <title>/<desc>, entities
decoded, whitespace-normalized. Script and foreignObject content is
COUNTED, never executed and never extracted (a crawl extractor that
leaks script bodies into training text is poisoning itself).

Entity safety by construction: custom `<!ENTITY>` declarations are
skipped as markup and NEVER expanded — `_decode_entities` resolves
only the named HTML set and numeric references, so a billion-laughs
payload costs O(bytes) and expands nothing (pinned in tests).

Reject-whole: malformed/unterminated tags, unbalanced nesting,
unterminated CDATA/comment, a non-svg root.
"""

from __future__ import annotations

from typing import Optional

from danae_spark.multimodal.htmltext import _decode_entities, _scan_tag
from danae_spark.multimodal.office import _skip_markup

__all__ = [
    "parse_svg",
    "looks_like_svg",
    "synth_svg",
    "svg_census_frame",
    "svg_census_roundtrip",
    "SVG_CENSUS_ORACLE",
]


def looks_like_svg(payload: bytes) -> bool:
    """Identity sniff for the harvest router: True iff the FIRST
    normal element of the (prefix-decoded) payload is <svg> — an HTML
    page embedding inline SVG stays HTML."""
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
        return head.startswith("<svg", pos) and (
            len(head) > pos + 4 and head[pos + 4] in " \t\r\n>/"
        )
    return False

_SHAPES = ("path", "rect", "circle", "ellipse", "line", "polyline", "polygon")
_TEXT_CONTAINERS = ("text", "tspan", "textpath")
# raster-decoder elements whose char data is never text
_OPAQUE = ("script", "style", "foreignobject")


def _num(s: Optional[str]) -> Optional[float]:
    """A dimension attribute: plain number or number + 'px'. Any other
    unit (em, %, pt...) → None (the caller rejects: don't guess DPI)."""
    if s is None:
        return None
    t = s.strip()
    if t.endswith("px"):
        t = t[:-2].strip()
    try:
        return float(t)
    except ValueError:
        return None


def parse_svg(payload: bytes) -> Optional[dict]:
    try:
        text = bytes(payload).decode("utf-8")
    except (UnicodeDecodeError, TypeError):
        return None
    if text[:1] == "﻿":
        text = text[1:]

    pos, n = 0, len(text)
    root_attrs: Optional[dict] = None
    stack: list[str] = []
    counts: dict[str, int] = {}
    n_elements = 0
    title_parts: list[str] = []
    text_parts: list[str] = []
    in_title = in_desc = False
    text_depth = 0  # nesting inside <text> subtrees
    opaque_depth = 0  # nesting inside script/style/foreignObject

    while pos < n:
        lt = text.find("<", pos)
        if lt == -1:
            if stack:
                return None  # unbalanced at EOF
            break
        # character data before the tag
        chunk = text[pos:lt]
        if chunk.strip():
            if root_attrs is None:
                return None  # text before the root element
            if opaque_depth == 0:
                if in_title:
                    title_parts.append(_decode_entities(chunk))
                elif in_desc or text_depth > 0:
                    text_parts.append(_decode_entities(chunk))
        pos = lt
        if text.startswith("<![CDATA[", pos):
            end = text.find("]]>", pos + 9)
            if end == -1:
                return None
            # CDATA inside a text container is literal character data
            if opaque_depth == 0 and (text_depth > 0 or in_title or in_desc):
                (title_parts if in_title else text_parts).append(
                    text[pos + 9 : end]
                )
            pos = end + 3
            continue
        skip = _skip_markup(text, pos)
        if skip is None:
            return None
        if skip != -1:
            pos = skip
            continue
        tag = _scan_tag(text, pos)
        if tag is None:
            return None
        name, is_close, self_closing, attrs, pos = tag
        if root_attrs is None:
            if is_close or name != "svg":
                return None  # identity: the first element must be <svg>
            root_attrs = attrs
        if is_close:
            if not stack or stack[-1] != name:
                return None  # mismatched close
            stack.pop()
            if name == "title":
                in_title = False
            elif name == "desc":
                in_desc = False
            if name in _TEXT_CONTAINERS:
                text_depth -= 1
            if name in _OPAQUE:
                opaque_depth -= 1
            continue
        n_elements += 1
        counts[name] = counts.get(name, 0) + 1
        if not self_closing:
            stack.append(name)
            if name == "title" and not title_parts:
                in_title = True
            elif name == "desc":
                in_desc = True
            if name in _TEXT_CONTAINERS:
                text_depth += 1
            if name in _OPAQUE:
                opaque_depth += 1
    if stack or root_attrs is None:
        return None

    width = _num(root_attrs.get("width"))
    height = _num(root_attrs.get("height"))
    if ("width" in root_attrs and width is None) or (
        "height" in root_attrs and height is None
    ):
        return None  # a unit we will not guess
    vb_w = vb_h = None
    vb = root_attrs.get("viewbox")
    if vb is not None:
        parts = vb.replace(",", " ").split()
        if len(parts) != 4:
            return None
        try:
            vb_w, vb_h = float(parts[2]), float(parts[3])
        except ValueError:
            return None

    return {
        "width": width,
        "height": height,
        "vb_w": vb_w,
        "vb_h": vb_h,
        "n_elements": n_elements,
        "n_shapes": sum(counts.get(s, 0) for s in _SHAPES),
        "n_text": counts.get("text", 0),
        "n_script": counts.get("script", 0),
        "n_links": counts.get("a", 0),
        "title": " ".join(" ".join(title_parts).split()) or None,
        "text": " ".join(" ".join(text_parts).split()) or None,
    }


# ----------------------------------------------------------- synthesis
#
# Doc-arithmetic grid (restated verbatim in SVG_CENSUS_ORACLE):
#   width = 100 + d % 50 ; height = 80 + d % 40 ('px' suffix on d%4==1)
#   viewBox "0 0 width height" present unless d % 3 == 1
#   shapes: rects = 1 + d % 3, circles = 1 + (d // 2) % 2,
#           paths = 1 + (d // 3) % 3
#   text elements = 1 + d % 2, each with one tspan; element i's text is
#     'word<d%7> t<i> s<(d+i)%5>' (+ ' & x!' via entities when d%3==0)
#   script (CDATA with raw '>') when d % 4 == 0; anchor when d % 2 == 1
#   title 'icon t<d%9>' unless d % 5 == 2
#   n_elements = 1(svg) + title? + 2·n_text + shapes + script? + a?
#   d % 11 == 3: a close tag is dropped (unbalanced → reject)
#   d % 29 == 13: truncated mid-tag (reject)


def synth_svg(d: int) -> bytes:
    w, h = 100 + d % 50, 80 + d % 40
    unit = "px" if d % 4 == 1 else ""
    parts = ["<?xml version=\"1.0\" encoding=\"UTF-8\"?>",
             "<!-- synthesized -->"]
    attrs = [f'xmlns="http://www.w3.org/2000/svg"',
             f'width="{w}{unit}"', f'height="{h}{unit}"']
    if d % 3 != 1:
        attrs.append(f'viewBox="0 0 {w} {h}"')
    parts.append(f"<svg {' '.join(attrs)}>")
    if d % 5 != 2:
        parts.append(f"  <title>icon t{d % 9}</title>")
    for i in range(1 + d % 3):
        parts.append(f'  <rect x="{i}" y="0" width="10" height="10"/>')
    for i in range(1 + (d // 2) % 2):
        parts.append(f'  <circle cx="{5 + i}" cy="5" r="4"/>')
    for i in range(1 + (d // 3) % 3):
        parts.append(f'  <path d="M0 0 L{10 + i} {10 + i}"/>')
    for i in range(1 + d % 2):
        suffix = " &amp; x&#33;" if d % 3 == 0 else ""
        parts.append(
            f'  <text x="0" y="{10 * i}">word{d % 7} t{i}'
            f"<tspan> s{(d + i) % 5}{suffix}</tspan></text>"
        )
    if d % 4 == 0:
        parts.append(
            "  <script><![CDATA[if (1 > 0) { notText(); }]]></script>"
        )
    if d % 2 == 1:
        parts.append('  <a href="https://example.com/x"><rect width="2" height="2"/></a>')
    parts.append("</svg>")
    out = "\n".join(parts)
    if d % 11 == 3:
        out = out.replace("</text>", "", 1)  # unbalanced nesting
    if d % 29 == 13:
        out = out[: len(out) - 7]  # truncated mid close tag
    return out.encode("utf-8")


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, width double, height double, vb_w double, vb_h double, "
    "n_elements int, n_shapes int, n_text int, n_script int, n_links int, "
    "title string, text string"
)
_COLS = ["width", "height", "vb_w", "vb_h", "n_elements", "n_shapes",
         "n_text", "n_script", "n_links", "title", "text"]


def svg_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """SVG census over any (id, binary) frame: one Arrow-batched
    narrow map, no shuffle (multimodal/docframes.py)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_svg, _COLS, _SCHEMA, id_col, payload_col)


def svg_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real SVG (xml decl,
    comment, px-suffixed dims, optional viewBox, shape grid, nested
    text/tspan with entities, a CDATA script whose '>' must not
    desynchronize the walk, an anchor) is parsed by the census walk
    and every column restated as doc_id arithmetic; d%11==3 drops a
    close tag and d%29==13 truncates mid-tag — both reject whole."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_svg, parse_svg, _COLS, _SCHEMA)


SVG_CENSUS_ORACLE = """
WITH d0 AS (
  SELECT doc_id, doc_id AS d,
         CASE WHEN doc_id % 11 = 3 OR doc_id % 29 = 13 THEN 1 ELSE 0 END AS rej,
         100 + doc_id % 50 AS w, 80 + doc_id % 40 AS h,
         1 + doc_id % 3 AS rects, 1 + (doc_id // 2) % 2 AS circles,
         1 + (doc_id // 3) % 3 AS paths,
         1 + doc_id % 2 AS texts,
         CASE WHEN doc_id % 5 <> 2 THEN 1 ELSE 0 END AS has_title,
         CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS has_script,
         CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END AS has_a
  FROM documents
),
txt AS (
  SELECT d0.doc_id,
         string_agg(
           'word' || CAST(d0.d % 7 AS VARCHAR) || ' t' || CAST(i.i AS VARCHAR)
           || ' s' || CAST((d0.d + i.i) % 5 AS VARCHAR)
           || CASE WHEN d0.d % 3 = 0 THEN ' & x!' ELSE '' END,
           ' ' ORDER BY i.i) AS text
  FROM d0 JOIN generate_series(0, 1) i(i) ON i.i < d0.texts
  WHERE d0.rej = 0
  GROUP BY d0.doc_id
)
SELECT d0.doc_id,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(w AS DOUBLE) END AS width,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(h AS DOUBLE) END AS height,
       CASE WHEN rej = 1 OR d % 3 = 1 THEN NULL
            ELSE CAST(w AS DOUBLE) END AS vb_w,
       CASE WHEN rej = 1 OR d % 3 = 1 THEN NULL
            ELSE CAST(h AS DOUBLE) END AS vb_h,
       CASE WHEN rej = 1 THEN NULL
            ELSE CAST(1 + has_title + 2 * texts + rects + circles + paths
                      + has_script + has_a * 2 AS INT) END AS n_elements,
       CASE WHEN rej = 1 THEN NULL
            ELSE CAST(rects + circles + paths + has_a AS INT) END AS n_shapes,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(texts AS INT) END AS n_text,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(has_script AS INT) END AS n_script,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(has_a AS INT) END AS n_links,
       CASE WHEN rej = 1 OR has_title = 0 THEN NULL
            ELSE 'icon t' || CAST(d % 9 AS VARCHAR) END AS title,
       txt.text
FROM d0 LEFT JOIN txt USING (doc_id) ORDER BY d0.doc_id
"""
