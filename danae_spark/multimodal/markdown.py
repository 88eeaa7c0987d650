"""Markdown → training-text extraction (CommonMark-core subset).

Markdown is the lingua franca of code-adjacent corpora (READMEs,
docs, forum dumps); shipping it raw leaves `**`/`[]()`/fence noise in
the training text, and shipping it through an HTML pipeline loses the
fact that it never was HTML. This extractor is a line pass + a fixed
set of inline rewrites:

  - ATX headings (`# ...` .. `###### ...`): markers stripped, first
    heading becomes the title, all counted;
  - fenced code blocks (``` ... ```): fence lines dropped, the code
    kept VERBATIM (no inline rewrites inside a fence — `*` in code is
    code), blocks counted;
  - list items (`-`/`*`/`+`/`1.` + space): markers stripped, counted;
  - blockquote `>` prefixes stripped;
  - inline (outside fences): images `![alt](url)` → alt, links
    `[text](url)` → text (counted), bold `**x**`/`__x__` → x,
    emphasis `*x*`/`_x_` → x, inline code `` `x` `` → x;
  - blank lines dropped from the output text.

Reject-whole: payloads that are not valid UTF-8 or that fail the
binary sniff (NUL/control density — a .bin that happens to decode)
yield None; an unclosed fence also rejects (a truncated file must not
ship half a code block as prose).
"""

from __future__ import annotations

import re
from typing import Optional


__all__ = [
    "parse_markdown",
    "synth_markdown",
    "markdown_text_frame",
    "markdown_text_roundtrip",
    "MARKDOWN_TEXT_ORACLE",
]

_IMG_RE = re.compile(r"!\[([^\]]*)\]\(([^)]*)\)")
_LINK_RE = re.compile(r"\[([^\]]*)\]\(([^)]*)\)")
_BOLD_RE = re.compile(r"\*\*([^*]+)\*\*|__([^_]+)__")
_EMPH_RE = re.compile(r"\*([^*]+)\*|_([^_]+)_")
_CODE_RE = re.compile(r"`([^`]+)`")
_HEAD_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_LIST_RE = re.compile(r"^(?:[-*+]|\d+\.)\s+")
_QUOTE_RE = re.compile(r"^>\s?")


def _inline(line: str) -> tuple[str, int]:
    """Apply inline rewrites; returns (text, n_links)."""
    line = _IMG_RE.sub(lambda m: m.group(1), line)
    n_links = len(_LINK_RE.findall(line))
    line = _LINK_RE.sub(lambda m: m.group(1), line)
    line = _BOLD_RE.sub(lambda m: m.group(1) or m.group(2), line)
    line = _EMPH_RE.sub(lambda m: m.group(1) or m.group(2), line)
    line = _CODE_RE.sub(lambda m: m.group(1), line)
    return line, n_links


def parse_markdown(payload: bytes) -> Optional[dict]:
    """{title, n_headings, n_list_items, n_links, n_code_blocks,
    text, n_chars, n_words} or None (reject-whole)."""
    from danae_spark.multimodal.htmltext import _looks_binary

    if not payload or _looks_binary(payload):
        return None
    try:
        raw = payload.decode("utf-8")
    except UnicodeDecodeError:
        return None

    out: list[str] = []
    title: Optional[str] = None
    n_headings = n_list_items = n_links = n_code_blocks = 0
    in_fence = False
    for line in raw.split("\n"):
        stripped = line.rstrip("\r")
        if stripped.lstrip().startswith("```"):
            if in_fence:
                in_fence = False
                n_code_blocks += 1
            else:
                in_fence = True
            continue
        if in_fence:
            out.append(stripped)  # code verbatim, no inline rewrites
            continue
        m = _HEAD_RE.match(stripped)
        if m:
            text, links = _inline(m.group(2).strip())
            n_links += links
            n_headings += 1
            if title is None:
                title = text
            if text:
                out.append(text)
            continue
        body = _QUOTE_RE.sub("", stripped)
        if _LIST_RE.match(body):
            body = _LIST_RE.sub("", body)
            n_list_items += 1
        text, links = _inline(body)
        n_links += links
        if text.strip():
            out.append(text)
    if in_fence:
        return None  # unclosed fence: truncated file
    text = "\n".join(out)
    return {
        "title": title,
        "n_headings": n_headings,
        "n_list_items": n_list_items,
        "n_links": n_links,
        "n_code_blocks": n_code_blocks,
        "text": text,
        "n_chars": len(text),
        "n_words": len(text.split()),
    }


# ----------------------------------------------------------- synthesis
#
# Pure doc_id arithmetic (restated in MARKDOWN_TEXT_ORACLE):
#   title '# Doc {d} t{d%10}'
#   blocks i in 0..(2 + d % 4)-1, words(d,i) = 3 + (d+i) % 3 words,
#   word j = 'm' || (d*9 + i*7 + j*3) % 93; block kind = i % 4:
#     0 -> paragraph, word 1 link-wrapped -> text unchanged, +1 link
#     1 -> two list items: 'item' words w0/w1 on separate '- ' lines:
#          line k (k in 0..1) = word_k ++ ' x' ++ (d+i+k)%7
#     2 -> paragraph with **word0** and `word2`-style wrapping ->
#          markers strip to the plain words
#     3 -> fenced code block, one line 'code_{d}_{i} = {(d*i) % 50};'
#          kept verbatim
#   d % 11 == 0 -> invalid UTF-8 tail (reject leg)


def _words(d: int, i: int) -> list[str]:
    return [f"m{(d * 9 + i * 7 + j * 3) % 93}" for j in range(3 + (d + i) % 3)]


def md_n_blocks(d: int) -> int:
    return 2 + d % 4


def synth_markdown(d: int) -> bytes:
    lines = [f"# Doc {d} t{d % 10}", ""]
    for i in range(md_n_blocks(d)):
        w = _words(d, i)
        kind = i % 4
        if kind == 0:
            shown = list(w)
            shown[1] = f"[{w[1]}](https://ex.test/{d}/{i})"
            lines.append(" ".join(shown))
        elif kind == 1:
            for k in range(2):
                lines.append(f"- {w[k]} x{(d + i + k) % 7}")
        elif kind == 2:
            shown = list(w)
            shown[0] = f"**{w[0]}**"
            shown[-1] = f"`{w[-1]}`"
            lines.append(" ".join(shown))
        else:
            lines.append("```python")
            lines.append(f"code_{d}_{i} = {(d * i) % 50};")
            lines.append("```")
        lines.append("")
    raw = "\n".join(lines).encode("utf-8")
    if d % 11 == 0:
        return raw + b"\xff\xfe\xfd"
    return raw


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, title string, n_headings int, n_list_items int, "
    "n_links int, n_code_blocks int, text string, n_chars int, n_words int"
)
_COLS = [
    "title",
    "n_headings",
    "n_list_items",
    "n_links",
    "n_code_blocks",
    "text",
    "n_chars",
    "n_words",
]


def markdown_text_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Markdown extraction over any (id, binary) frame: one
    Arrow-batched narrow map, no shuffle."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_markdown, _COLS, _SCHEMA, id_col, payload_col)


def markdown_text_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real Markdown file
    (heading, linked/bold/code inline runs, list items, a fenced code
    block) is synthesized, extracted by the real line+inline pass,
    and every output column restated as doc_id arithmetic in
    MARKDOWN_TEXT_ORACLE."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_markdown, parse_markdown, _COLS, _SCHEMA)


MARKDOWN_TEXT_ORACLE = """
WITH d0 AS (SELECT doc_id, doc_id AS d FROM documents),
words AS (
  SELECT doc_id, d, c.i AS blk, j.j AS wi,
         'm' || CAST((d * 9 + c.i * 7 + j.j * 3) % 93 AS VARCHAR) AS word
  FROM d0, generate_series(0, 5) c(i), generate_series(0, 4) j(j)
  WHERE c.i < 2 + d % 4 AND j.j < 3 + (d + c.i) % 3
),
block_lines AS (
  -- kind 0 and 2 render as the plain word join (markers strip away)
  SELECT doc_id, d, blk, 0 AS sub,
         string_agg(word, ' ' ORDER BY wi) AS line
  FROM words WHERE blk % 4 IN (0, 2) GROUP BY doc_id, d, blk
  UNION ALL
  -- kind 1: two list-item lines
  SELECT w.doc_id, w.d, w.blk, k.k,
         max(CASE WHEN wi = k.k THEN word END)
           || ' x' || CAST((w.d + w.blk + k.k) % 7 AS VARCHAR)
  FROM words w, generate_series(0, 1) k(k)
  WHERE w.blk % 4 = 1 GROUP BY w.doc_id, w.d, w.blk, k.k
  UNION ALL
  -- kind 3: the verbatim code line
  SELECT DISTINCT doc_id, d, blk, 0,
         'code_' || CAST(d AS VARCHAR) || '_' || CAST(blk AS VARCHAR)
           || ' = ' || CAST((d * blk) % 50 AS VARCHAR) || ';'
  FROM words WHERE blk % 4 = 3
),
doc_text AS (
  SELECT doc_id, d,
         'Doc ' || CAST(d AS VARCHAR) || ' t' || CAST(d % 10 AS VARCHAR)
           || chr(10) || string_agg(line, chr(10) ORDER BY blk, sub) AS text
  FROM block_lines GROUP BY doc_id, d
),
counts AS (
  -- tokens per block: prose blocks (kind 0/2) render all their words;
  -- list blocks render words 0/1 plus an ' xK' token each (4 total);
  -- code blocks render 'code_d_i = NN;' (3 tokens)
  SELECT doc_id, d,
         CAST(2 * count(*) FILTER (WHERE blk % 4 = 1) AS INT) AS n_list_items,
         CAST(count(*) FILTER (WHERE blk % 4 = 0) AS INT) AS n_links,
         CAST(count(*) FILTER (WHERE blk % 4 = 3) AS INT) AS n_code_blocks,
         CAST(sum(CASE WHEN blk % 4 IN (0, 2) THEN n_wd
                       WHEN blk % 4 = 1 THEN 4 ELSE 3 END) AS INT) AS body_words
  FROM (
    SELECT doc_id, d, blk, count(*) AS n_wd
    FROM words GROUP BY doc_id, d, blk
  ) per_blk GROUP BY doc_id, d
)
SELECT t.doc_id,
       CASE WHEN t.d % 11 = 0 THEN NULL
            ELSE 'Doc ' || CAST(t.d AS VARCHAR) || ' t'
                 || CAST(t.d % 10 AS VARCHAR) END AS title,
       CASE WHEN t.d % 11 = 0 THEN NULL ELSE 1 END AS n_headings,
       CASE WHEN t.d % 11 = 0 THEN NULL ELSE c.n_list_items END AS n_list_items,
       CASE WHEN t.d % 11 = 0 THEN NULL ELSE c.n_links END AS n_links,
       CASE WHEN t.d % 11 = 0 THEN NULL ELSE c.n_code_blocks END AS n_code_blocks,
       CASE WHEN t.d % 11 = 0 THEN NULL ELSE t.text END AS text,
       CASE WHEN t.d % 11 = 0 THEN NULL
            ELSE CAST(length(t.text) AS INT) END AS n_chars,
       CASE WHEN t.d % 11 = 0 THEN NULL
            -- the 'Doc N tK' title renders as 3 tokens
            ELSE CAST(3 + c.body_words AS INT) END AS n_words
FROM doc_text t JOIN counts c USING (doc_id, d)
ORDER BY t.doc_id
"""
