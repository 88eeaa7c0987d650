"""Stack Exchange dump extraction — the Q&A corpus class.

The Stack Exchange data dumps (Posts.xml per site) are a staple of
instruction-tuning mixes: a `<posts>` root of self-closing `<row/>`
elements whose Body attribute is XML-escaped HTML. The extractor:

  - parses rows attribute-wise (double-quoted XML attributes, strict
    entity decode — an unknown entity or an unterminated quote rejects
    whole: a torn dump must not ship partial Q&A pairs);
  - routes every Body through the REAL html extractor
    (htmltext.parse_html_text — the same rules as the crawl side, so
    code blocks, inline markup and entities behave identically across
    corpus classes);
  - questions (PostTypeId 1) contribute their Title as a heading
    paragraph and their Tags census; answers (PostTypeId 2) follow in
    document order; other post types (wiki, moderator rows) are
    COUNTED and excluded from text;
  - text joins question/answer blocks with blank lines, the same
    normalization as every other extractor.

Reference parity note: the reference engine (SURVEY §1) has no
document ingestion; extension surface like multimodal/wikitext.py.
"""

from __future__ import annotations

import re
from typing import Optional

__all__ = [
    "looks_like_se_dump",
    "parse_se_dump",
    "synth_se_dump",
    "se_body_sql",
    "se_census_frame",
    "se_census_roundtrip",
    "SE_EXTRACT_ORACLE",
]

_MAX_BYTES = 64 * 1024 * 1024

_ENTITIES = {"lt": "<", "gt": ">", "amp": "&", "quot": '"', "apos": "'"}
_ROW_RE = re.compile(r"<row\b([^>]*)/>")
_ATTR_RE = re.compile(r'([A-Za-z][A-Za-z0-9]*)="([^"]*)"')
_TAG_RE = re.compile(r"<([^<>]+)>")


class _Bad(Exception):
    pass


def _unescape(s: str) -> str:
    def sub(m: re.Match) -> str:
        name = m.group(1)
        try:
            if name.startswith(("#x", "#X")):
                return chr(int(name[2:], 16))
            if name.startswith("#"):
                return chr(int(name[1:]))
        except (ValueError, OverflowError):
            raise _Bad
        if name in _ENTITIES:
            return _ENTITIES[name]
        raise _Bad  # an entity the XML writer would not produce

    return re.sub(r"&(#?[0-9a-zA-Z]+);", sub, s)


def looks_like_se_dump(payload: bytes) -> bool:
    """Identity sniff for the harvest router: True iff the FIRST
    normal element of the payload is <posts> — an XHTML page that
    merely mentions the dump format stays HTML."""
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
        return head.startswith("<posts", pos) and (
            len(head) > pos + 6 and head[pos + 6] in " \t\r\n>"
        )
    return False


def parse_se_dump(payload: bytes) -> Optional[dict]:
    try:
        return _parse(payload)
    except (_Bad, ValueError, UnicodeDecodeError):
        return None


def _parse(payload: bytes) -> Optional[dict]:
    from danae_spark.multimodal.htmltext import parse_html_text

    p = bytes(payload) if payload is not None else b""
    if not p or len(p) > _MAX_BYTES:
        return None
    src = p.decode("utf-8")
    head = src.split(">", 1)[0]
    if "<posts" not in head and not head.startswith("<?xml"):
        return None  # not claiming the grammar
    if "<posts" not in src:
        return None
    if "</posts>" not in src:
        raise _Bad  # torn dump
    n_q = n_a = n_other = 0
    total_score = 0
    n_tags = 0
    title = None
    parts: list[str] = []
    for m in _ROW_RE.finditer(src):
        raw = m.group(1)
        attrs = {}
        i, n = 0, len(raw)
        while i < n:
            if raw[i].isspace():
                i += 1
                continue
            am = _ATTR_RE.match(raw, i)
            if am is None:
                # attribute soup the grammar does not cover (an
                # unterminated quote, a bare token): reject whole
                raise _Bad
            attrs[am.group(1)] = _unescape(am.group(2))
            i = am.end()
        ptype = attrs.get("PostTypeId")
        if ptype is None or "Id" not in attrs:
            raise _Bad
        total_score += int(attrs.get("Score", "0"))
        if ptype == "1":
            n_q += 1
            q_title = attrs.get("Title", "")
            if title is None and q_title:
                title = q_title
            n_tags += len(_TAG_RE.findall(attrs.get("Tags", "")))
            block = [q_title] if q_title else []
        elif ptype == "2":
            n_a += 1
            block = []
        else:
            n_other += 1
            continue
        body = attrs.get("Body", "")
        if body:
            ext = parse_html_text(body.encode("utf-8"))
            if ext is None:
                raise _Bad  # a body the html grammar rejects poisons the dump
            if ext["text"]:
                block.append(ext["text"])
        if block:
            parts.append("\n\n".join(block))
    if n_q + n_a + n_other == 0:
        raise _Bad  # an empty posts file is a torn or foreign dump
    return {
        "n_posts": n_q + n_a + n_other,
        "n_questions": n_q,
        "n_answers": n_a,
        "n_other": n_other,
        "total_score": total_score,
        "n_tags": n_tags,
        "title": title,
        "text": "\n\n".join(parts),
    }


# ------------------------------------------------------------- synthesis
#
# Grid (restated in SE_EXTRACT_ORACLE):
#   posts   P = 2 + d % 3: post 0 a question (Title 'Question {d}',
#           Tags <t{d%5}><t{d%7}> -> 2 tags, Score d % 10), posts
#           j >= 1 answers (Score (d + j) % 5); d % 7 == 4 adds a
#           tag-wiki row (PostTypeId 4: counted, no text)
#   body    '<p>post {d} {j} says w{(d+j)%9} &amp; w{(d*3+j)%9}.</p>'
#           -> 'post {d} {j} says w{(d+j)%9} & w{(d*3+j)%9}.'
#   rejects d % 19 == 4 torn dump (truncation); d % 13 == 2 unknown
#           entity in a Body (strict decode)


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;")
        .replace(">", "&gt;").replace('"', "&quot;")
    )


def se_body(d: int, j: int) -> str:
    return (
        f"<p>post {d} {j} says w{(d + j) % 9} &amp; w{(d * 3 + j) % 9}.</p>"
    )


def synth_se_dump(d: int) -> bytes:
    rows = []
    np = 2 + d % 3
    for j in range(np):
        body = se_body(d, j)
        attrs = [f'Id="{d * 10 + j}"']
        if j == 0:
            attrs += [
                'PostTypeId="1"',
                f'Title="Question {d}"',
                f'Tags="{_esc(f"<t{d % 5}><t{d % 7}>")}"',
                f'Score="{d % 10}"',
                f'AcceptedAnswerId="{d * 10 + 1}"',
            ]
        else:
            attrs += [
                'PostTypeId="2"',
                f'ParentId="{d * 10}"',
                f'Score="{(d + j) % 5}"',
            ]
        attrs.append(f'Body="{_esc(body)}"')
        attrs.append('CreationDate="2020-01-01T00:00:00.000"')
        row = "  <row " + " ".join(attrs) + " />"
        if d % 13 == 2 and j == np - 1:
            # an entity the XML writer would not produce, in the RAW
            # wire bytes (strict decode rejects whole)
            row = row.replace("&amp;", "&nope;", 1)
        rows.append(row)
    if d % 7 == 4:
        rows.append(
            f'  <row Id="{d * 10 + 9}" PostTypeId="4" Score="0" '
            'Body="" />'
        )
    xml = (
        '<?xml version="1.0" encoding="utf-8"?>\n<posts>\n'
        + "\n".join(rows)
        + "\n</posts>\n"
    )
    raw = xml.encode("utf-8")
    if d % 19 == 4:
        raw = raw[:-12]  # tears off </posts>
    return raw


def se_body_sql(posts_cte: str) -> str:
    """The per-post body text as SQL over a CTE with (doc_id, d, j)."""
    return f"""
SELECT doc_id, d, j,
       'post ' || d || ' ' || j || ' says w' || ((d + j) % 9)
         || ' & w' || ((d * 3 + j) % 9) || '.' AS body
FROM ({posts_cte})
"""


# ----------------------------------------------------- Spark entry points

_COLS = ["n_posts", "n_questions", "n_answers", "n_other",
         "total_score", "n_tags", "title", "text"]
_SCHEMA = (
    "doc_id bigint, n_posts int, n_questions int, n_answers int, "
    "n_other int, total_score bigint, n_tags int, title string, text string"
)


def se_census_frame(df, id_col="doc_id", payload_col="payload"):
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_se_dump, _COLS, _SCHEMA,
                              id_col, payload_col)


def se_census_roundtrip(spark, sf_dir: str):
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_se_dump, parse_se_dump,
                           _COLS, _SCHEMA)


_OK = "doc_id % 19 <> 4 AND doc_id % 13 <> 2"

_BODIES = se_body_sql(
    f"""SELECT d.doc_id, d.doc_id AS d, j.j AS j
FROM documents d JOIN generate_series(0, 4) j(j)
     ON j.j < 2 + d.doc_id % 3
WHERE {_OK}"""
)

SE_EXTRACT_ORACLE = f"""
WITH ok AS (
  SELECT doc_id, doc_id AS d FROM documents WHERE {_OK}
),
bodies AS ({_BODIES}),
txt AS (
  SELECT doc_id,
         string_agg(
           CASE WHEN j = 0
                THEN 'Question ' || d || chr(10) || chr(10) || body
                ELSE body END,
           chr(10) || chr(10) ORDER BY j) AS text
  FROM bodies GROUP BY doc_id
),
score AS (
  SELECT ok.doc_id,
         CAST(ok.d % 10
              + sum(CASE WHEN j.j >= 1 THEN (ok.d + j.j) % 5 ELSE 0 END)
              AS BIGINT) AS total_score
  FROM ok JOIN generate_series(0, 4) j(j) ON j.j < 2 + ok.d % 3
  GROUP BY ok.doc_id, ok.d
)
SELECT d.doc_id,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE 2 + d.doc_id % 3
                 + CASE WHEN d.doc_id % 7 = 4 THEN 1 ELSE 0 END
            END AS INT) AS n_posts,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL ELSE 1 END AS INT)
         AS n_questions,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE 1 + d.doc_id % 3 END AS INT) AS n_answers,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            WHEN d.doc_id % 7 = 4 THEN 1 ELSE 0 END AS INT) AS n_other,
       score.total_score,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL ELSE 2 END AS INT)
         AS n_tags,
       CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE 'Question ' || CAST(d.doc_id AS VARCHAR) END AS title,
       txt.text
FROM documents d
LEFT JOIN ok USING (doc_id)
LEFT JOIN txt USING (doc_id)
LEFT JOIN score USING (doc_id)
ORDER BY d.doc_id
"""
