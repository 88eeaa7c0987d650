"""RTF text extraction — written from the public RTF 1.9.1 spec.

The format is a brace-grouped control-word stream over 7-bit text:
groups inherit state, destinations (font/color tables, info block,
pictures) divert or hide text, and non-ASCII arrives as \\'hh code
-page escapes or \\uN? unicode words with a \\ucN fallback-skip
convention. The extractor is a single linear scan with an explicit
group stack — no backtracking, O(bytes).

Supported (and exercised by the synth + oracle):
  - groups `{}` with state inheritance; balanced-brace validation
  - control words with signed numeric parameters and the
    one-optional-space delimiter rule
  - \\par / \\line -> newline, \\tab -> TAB, \\~ -> space,
    \\{ \\} \\\\ literals, \\_ -> hyphen
  - \\'hh decoded through windows-1252 (the declared \\ansicpg)
  - \\uN with the \\ucN skip convention (the fallback char after a
    unicode word is consumed, not emitted)
  - skipped destinations: fonttbl, colortbl, stylesheet, pict,
    themedata, and every {\\*\\...} ignorable destination
  - {\\info{\\title ...}{\\author ...}} captured as title / creator
  - formatting words (\\b, \\i, \\f0, \\fs24, ...) are transparent

Reject-whole: unbalanced braces, a malformed \\'h escape, truncation
inside a control word, or trailing non-whitespace after the final
closing brace all yield None — control words must never leak into a
training corpus as text.
"""

from __future__ import annotations

from typing import Optional


__all__ = [
    "parse_rtf",
    "synth_rtf",
    "rtf_text_frame",
    "rtf_text_roundtrip",
    "RTF_TEXT_ORACLE",
]

# destinations whose text must not reach the body
_SKIP_DESTS = {
    "fonttbl",
    "colortbl",
    "stylesheet",
    "pict",
    "themedata",
    "listtable",
    "listoverridetable",
    "generator",
    "xmlnstbl",
}

_SPECIAL = {
    "par": "\n",
    "line": "\n",
    "tab": "\t",
    "emdash": "—",
    "endash": "–",
    "lquote": "‘",
    "rquote": "’",
    "ldblquote": "“",
    "rdblquote": "”",
    "bullet": "•",
}


def parse_rtf(payload: bytes) -> Optional[dict]:
    """{title, creator, n_paragraphs, text, n_chars, n_words} or None
    (reject-whole)."""
    if not payload.startswith(b"{\\rtf"):
        return None
    try:
        s = payload.decode("latin-1")  # byte-preserving; \\'hh re-decoded below
    except UnicodeDecodeError:  # pragma: no cover - latin-1 never fails
        return None

    body: list[str] = []
    title: list[str] = []
    creator: list[str] = []
    n_pars = 0
    # group state: (dest, uc); dest in {body, skip, info, title, author}
    stack: list[tuple[str, int]] = []
    dest, uc = "body", 1
    pending_skip = 0  # chars to swallow after a \uN word
    i, n = 0, len(s)
    closed = False  # the root group has been closed

    def emit(ch: str) -> None:
        nonlocal pending_skip
        if pending_skip > 0:
            pending_skip -= 1
            return
        if dest == "body":
            body.append(ch)
        elif dest == "title":
            title.append(ch)
        elif dest == "author":
            creator.append(ch)
        # skip / info: dropped

    while i < n:
        c = s[i]
        if closed:
            if c in " \r\n\t\x00":
                i += 1
                continue
            return None  # trailing garbage after the root group
        if c == "{":
            stack.append((dest, uc))
            i += 1
            continue
        if c == "}":
            if not stack:
                return None
            dest, uc = stack.pop()
            if not stack:
                closed = True
            i += 1
            continue
        if c == "\\":
            if i + 1 >= n:
                return None
            nxt = s[i + 1]
            if nxt in "{}\\":
                emit(nxt)
                i += 2
                continue
            if nxt == "~":
                emit(" ")
                i += 2
                continue
            if nxt == "_":
                emit("-")
                i += 2
                continue
            if nxt == "-":
                i += 2  # optional hyphen: nothing in plain text
                continue
            if nxt == "*":
                # ignorable destination: this whole group is skippable
                if dest != "title" and dest != "author":
                    dest = "skip"
                i += 2
                continue
            if nxt == "'":
                h = s[i + 2 : i + 4]
                if len(h) != 2:
                    return None
                try:
                    b = bytes([int(h, 16)])
                except ValueError:
                    return None
                try:
                    ch = b.decode("cp1252")
                except UnicodeDecodeError:
                    ch = "�"
                emit(ch)
                i += 4
                continue
            # control word: letters then optional signed integer
            j = i + 1
            while j < n and "a" <= s[j] <= "z":
                j += 1
            if j == i + 1:
                return None  # lone backslash before a non-symbol
            word = s[i + 1 : j]
            num = None
            k = j
            if k < n and (s[k] == "-" or "0" <= s[k] <= "9"):
                k2 = k + 1 if s[k] == "-" else k
                while k2 < n and "0" <= s[k2] <= "9":
                    k2 += 1
                if k2 == k or (s[k] == "-" and k2 == k + 1):
                    return None
                num = int(s[k:k2])
                k = k2
            if k < n and s[k] == " ":
                k += 1  # the one-space delimiter belongs to the word
            i = k

            if word == "u":
                if num is None:
                    return None
                cp = num if num >= 0 else num + 65536
                emit(chr(cp) if 0 < cp <= 0x10FFFF else "�")
                pending_skip += max(uc, 0)
                continue
            if word == "uc":
                if num is None:
                    return None
                uc = num
                continue
            if word in _SPECIAL:
                if word == "par" and dest == "body":
                    n_pars += 1
                emit(_SPECIAL[word])
                continue
            if word in _SKIP_DESTS:
                if dest not in ("title", "author"):
                    dest = "skip"
                continue
            if word == "info" and dest == "body":
                dest = "info"
                continue
            if word == "title" and dest == "info":
                dest = "title"
                continue
            if word == "author" and dest == "info":
                dest = "author"
                continue
            # every other control word (formatting, charset decls,
            # rtf version) is transparent
            continue
        if c in "\r\n":
            i += 1  # raw newlines in the file are not text
            continue
        emit(c)
        i += 1

    if stack or not closed:
        return None  # unbalanced: truncated file
    text = "".join(body).rstrip("\n")
    t = "".join(title)
    a = "".join(creator)
    return {
        "title": t if t else None,
        "creator": a if a else None,
        "n_paragraphs": n_pars,
        "text": text,
        "n_chars": len(text),
        "n_words": len(text.split()),
    }


# ----------------------------------------------------------- synthesis
#
# Pure doc_id arithmetic (restated in RTF_TEXT_ORACLE):
#   n_paras(d) = 2 + d % 4; words(d, i) = 3 + (d + i) % 3 words;
#   word j = 'r' || (d*7 + i*5 + j*11) % 89
#   i % 2 == 0: first word bold-grouped ({\b ...}: transparent)
#   i % 4 == 1: TAB between word 0 and the rest (else one space)
#   i % 3 == 0: suffix ' f\'e9e'    -> ' f' || chr(233) || 'e'
#   i % 4 == 3: suffix ' 舑?-'  -> ' ' || chr(8211) || '-'
#   title 'Doc {d} t{d%10}', creator 'author a{d%5}' via {\info}
#   d % 13 == 0 -> final brace dropped (reject leg)


def _para_words(d: int, i: int) -> list[str]:
    return [f"r{(d * 7 + i * 5 + j * 11) % 89}" for j in range(3 + (d + i) % 3)]


def rtf_n_paras(d: int) -> int:
    return 2 + d % 4


def synth_rtf(d: int) -> bytes:
    out = [
        r"{\rtf1\ansi\ansicpg1252\deff0",
        r"{\fonttbl{\f0\froman Times New Roman;}}",
        r"{\colortbl;\red255\green0\blue0;}",
        r"{\*\generator danae synth 1.0;}",
        rf"{{\info{{\title Doc {d} t{d % 10}}}{{\author author a{d % 5}}}}}",
        r"\uc1\f0\fs24 ",
    ]
    for i in range(rtf_n_paras(d)):
        words = _para_words(d, i)
        first = rf"{{\b {words[0]}}}" if i % 2 == 0 else words[0]
        sep = r"\tab " if i % 4 == 1 else " "
        line = first + sep + " ".join(words[1:])
        if i % 3 == 0:
            line += r" f\'e9e"
        if i % 4 == 3:
            line += " \\u8211?-"
        out.append(line + r"\par")
        out.append("\n")  # raw newline: ignored by the tokenizer
    out.append("}")
    raw = "".join(out).encode("latin-1")
    if d % 13 == 0:
        return raw[:-1]
    return raw


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, title string, creator string, n_paragraphs int, "
    "text string, n_chars int, n_words int"
)
_COLS = ["title", "creator", "n_paragraphs", "text", "n_chars", "n_words"]


def rtf_text_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """RTF text extraction over any (id, binary) frame: one
    Arrow-batched narrow map, no shuffle (multimodal/docframes.py)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_rtf, _COLS, _SCHEMA, id_col, payload_col)


def rtf_text_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real RTF file (group
    nesting, skipped tables, an ignorable destination, the info
    block, cp1252 and unicode escapes with the uc skip rule) is
    synthesized, extracted by the real tokenizer, and every output
    column restated as doc_id arithmetic in RTF_TEXT_ORACLE."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_rtf, parse_rtf, _COLS, _SCHEMA)


def rtf_text_sql(docs_cte: str) -> str:
    """The extraction arithmetic as SQL over a `d0(doc_id, d)` CTE,
    shared between RTF_TEXT_ORACLE (d = doc_id) and the text_harvest
    oracle. Emits (doc_id, d, title, creator, text, n_paras,
    n_tokens) for every doc in the CTE — callers apply their own
    reject legs."""
    return f"""
WITH d0 AS ({docs_cte}),
words AS (
  SELECT doc_id, d, c.i AS para, j.j AS wi,
         'r' || CAST((d * 7 + c.i * 5 + j.j * 11) % 89 AS VARCHAR) AS word
  FROM d0, generate_series(0, 5) c(i), generate_series(0, 4) j(j)
  WHERE c.i < 2 + d % 4 AND j.j < 3 + (d + c.i) % 3
),
para_lines AS (
  SELECT doc_id, d, para,
         max(CASE WHEN wi = 0 THEN word END)
           || CASE WHEN para % 4 = 1 THEN chr(9) ELSE ' ' END
           || string_agg(CASE WHEN wi > 0 THEN word END, ' ' ORDER BY wi)
           || CASE WHEN para % 3 = 0 THEN ' f' || chr(233) || 'e' ELSE '' END
           || CASE WHEN para % 4 = 3 THEN ' ' || chr(8211) || '-' ELSE '' END
           AS line,
         count(*) + CASE WHEN para % 3 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN para % 4 = 3 THEN 1 ELSE 0 END AS n_tokens
  FROM words GROUP BY doc_id, d, para
)
SELECT doc_id, d,
       'Doc ' || CAST(d AS VARCHAR) || ' t' || CAST(d % 10 AS VARCHAR) AS title,
       'author a' || CAST(d % 5 AS VARCHAR) AS creator,
       string_agg(line, chr(10) ORDER BY para) AS text,
       CAST(count(*) AS INT) AS n_paras,
       CAST(sum(n_tokens) AS INT) AS n_tokens
FROM para_lines GROUP BY doc_id, d
"""


RTF_TEXT_ORACLE = f"""
WITH rtf AS ({rtf_text_sql("SELECT doc_id, doc_id AS d FROM documents")})
SELECT doc_id,
       CASE WHEN d % 13 = 0 THEN NULL ELSE title END AS title,
       CASE WHEN d % 13 = 0 THEN NULL ELSE creator END AS creator,
       CASE WHEN d % 13 = 0 THEN NULL ELSE n_paras END AS n_paragraphs,
       CASE WHEN d % 13 = 0 THEN NULL ELSE text END AS text,
       CASE WHEN d % 13 = 0 THEN NULL
            ELSE CAST(length(text) AS INT) END AS n_chars,
       CASE WHEN d % 13 = 0 THEN NULL ELSE n_tokens END AS n_words
FROM rtf ORDER BY doc_id
"""
