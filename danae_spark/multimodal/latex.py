"""LaTeX (.tex) text extraction — the arXiv corpus class.

arXiv-scale sources are TeX: prose wrapped in macros, math, comments
and environments. The extractor walks the source once and emits
normalized paragraphs:

  - comments stripped (unescaped `%` to end of line, counted);
  - math is a COUNTED BOUNDARY, dropped from text (the documented
    choice: formula tokens are layout encoding, not prose — a corpus
    wanting math keeps the .tex member verbatim instead): `$..$` /
    `\\(..\\)` inline, `$$..$$` / `\\[..\\]` / equation-class
    environments display;
  - \\title / \\section / \\subsection / \\subsubsection / \\paragraph
    arguments become their own paragraphs (title captured, sections
    counted); wrapper macros (\\emph, \\textbf, ...) unwrap to their
    argument; reference/plumbing macros (\\cite, \\ref, \\label,
    \\includegraphics, \\usepackage, \\newcommand, ...) drop with
    their adjacent arguments (citations counted); \\url keeps the URL;
    unknown macros drop their name + [options] and keep any braced
    prose (most one-off macros wrap text);
  - itemize/enumerate \\item entries become `- ` paragraphs; verbatim
    environments copy through untouched; escapes (\\% \\& \\_ \\$ \\#
    \\{ \\}) become their literal characters, `~` a space, `\\\\` a
    paragraph break;
  - when a `document` environment exists only its body is extracted
    (preamble is plumbing); a bare fragment (an \\input'd section
    file) extracts whole;
  - reject-whole: unbalanced braces, an unterminated math span, or a
    mismatched/unterminated environment — a source the grammar cannot
    finish must not ship partial text;
  - normalization: paragraphs split on blank lines, inner whitespace
    collapsed to single spaces, joined with one blank line.

Routed in text_harvest via the \\documentclass / \\begin{document}
signature (identity-first: a payload claiming TeX parses or rejects
whole) — which also covers .tex members inside archives, since
archive members route back through the dispatcher.

Reference parity note: the reference engine (SURVEY §1) has no
document extraction; extension surface like multimodal/office.py.
"""

from __future__ import annotations

from typing import Optional

__all__ = [
    "parse_latex",
    "synth_latex",
    "latex_text_sql",
    "latex_extract_frame",
    "latex_extract_roundtrip",
    "LATEX_EXTRACT_ORACLE",
]

_MAX_BYTES = 64 * 1024 * 1024


class _Bad(Exception):
    pass


_MATH_ENVS = frozenset(
    e + s
    for e in ("equation", "align", "eqnarray", "displaymath", "gather",
              "multline", "math")
    for s in ("", "*")
)
_LIST_ENVS = frozenset(("itemize", "enumerate", "description"))
_HEADINGS = {
    "title": True, "section": True, "subsection": True,
    "subsubsection": True, "paragraph": True, "chapter": True,
}
_KEEP_ARG = frozenset((
    "emph", "textbf", "textit", "texttt", "textsc", "textrm", "textsf",
    "underline", "mbox", "text", "caption", "footnote",
))
# plumbing macros: drop the macro AND its adjacent {args}/[opts]
_DROP_ARG = frozenset((
    "cite", "citep", "citet", "ref", "eqref", "pageref", "label",
    "includegraphics", "bibliography", "bibliographystyle",
    "usepackage", "documentclass", "input", "include", "vspace",
    "hspace", "newcommand", "renewcommand", "def", "author", "date",
    "maketitle", "setlength", "pagestyle", "thispagestyle",
))
_CITES = frozenset(("cite", "citep", "citet"))


def parse_latex(payload: bytes) -> Optional[dict]:
    try:
        return _parse(payload)
    except (_Bad, ValueError, UnicodeDecodeError, RecursionError, IndexError):
        return None


def _parse(payload: bytes) -> Optional[dict]:
    p = bytes(payload) if payload is not None else b""
    if not p or len(p) > _MAX_BYTES:
        return None
    try:
        src = p.decode("utf-8")
    except UnicodeDecodeError:
        raise _Bad
    state = {
        "title": None, "n_sections": 0, "n_math_inline": 0,
        "n_math_display": 0, "n_comments": 0, "n_cites": 0,
    }
    # document environment: extract its body only (preamble is
    # plumbing); scan the PREAMBLE too so \title{} in it is captured
    begin = src.find(r"\begin{document}")
    if begin >= 0:
        end = src.find(r"\end{document}")
        if end < 0 or end < begin:
            raise _Bad
        _walk(src[:begin], state, emit=False)
        out = _walk(src[begin + len(r"\begin{document}"):end], state, emit=True)
    else:
        out = _walk(src, state, emit=True)
    paras = []
    if state["title"]:
        paras.append(state["title"])
    for block in out.split("\x00"):
        for para in block.split("\n\n"):
            words = para.split()
            if words:
                paras.append(" ".join(words))
    text = "\n\n".join(paras)
    return {
        "title": state["title"],
        "n_sections": state["n_sections"],
        "n_math_inline": state["n_math_inline"],
        "n_math_display": state["n_math_display"],
        "n_comments": state["n_comments"],
        "n_cites": state["n_cites"],
        "text": text,
    }


def _read_group(src: str, i: int) -> tuple[str, int]:
    """src[i] == '{' -> (raw content, index past the matching '}')."""
    if i >= len(src) or src[i] != "{":
        raise _Bad
    depth = 1
    j = i + 1
    while j < len(src):
        c = src[j]
        if c == "\\":
            j += 2
            continue
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return src[i + 1 : j], j + 1
        j += 1
    raise _Bad  # unbalanced group


def _skip_opts(src: str, i: int) -> int:
    if i < len(src) and src[i] == "[":
        j = src.find("]", i)
        if j < 0:
            raise _Bad
        return j + 1
    return i


def _walk(src: str, state: dict, emit: bool) -> str:
    """One pass over a TeX fragment; returns raw extracted text with
    \\x00 as a hard paragraph break (normalized by the caller)."""
    out: list[str] = []
    env_stack: list[str] = []
    depth = 0
    i = 0
    n = len(src)
    while i < n:
        c = src[i]
        if c == "%":
            state["n_comments"] += 1
            j = src.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "$":
            if i + 1 < n and src[i + 1] == "$":
                j = src.find("$$", i + 2)
                if j < 0:
                    raise _Bad
                state["n_math_display"] += 1
                i = j + 2
            else:
                j = src.find("$", i + 1)
                if j < 0:
                    raise _Bad
                state["n_math_inline"] += 1
                i = j + 1
            continue
        if c == "{":
            depth += 1
            i += 1
            continue
        if c == "}":
            depth -= 1
            if depth < 0:
                raise _Bad
            i += 1
            continue
        if c == "~":
            out.append(" ")
            i += 1
            continue
        if c != "\\":
            out.append(c)
            i += 1
            continue
        # a control sequence
        if i + 1 >= n:
            raise _Bad
        nxt = src[i + 1]
        if nxt in "%&_$#{}":
            out.append(nxt)
            i += 2
            continue
        if nxt == "\\":
            out.append("\x00")
            i += 2
            continue
        if nxt == "(":
            j = src.find(r"\)", i + 2)
            if j < 0:
                raise _Bad
            state["n_math_inline"] += 1
            i = j + 2
            continue
        if nxt == "[":
            j = src.find(r"\]", i + 2)
            if j < 0:
                raise _Bad
            state["n_math_display"] += 1
            i = j + 2
            continue
        if not nxt.isalpha():
            i += 2  # \, \; \! and friends: spacing, dropped
            continue
        j = i + 1
        while j < n and src[j].isalpha():
            j += 1
        name = src[i + 1 : j]
        if j < n and src[j] == "*":
            j += 1
        if name == "begin":
            env, j = _read_group(src, j)
            if env in _MATH_ENVS:
                k = src.find("\\end{" + env + "}", j)
                if k < 0:
                    raise _Bad
                state["n_math_display"] += 1
                i = k + len("\\end{" + env + "}")
                continue
            if env == "verbatim":
                k = src.find(r"\end{verbatim}", j)
                if k < 0:
                    raise _Bad
                out.append("\x00" + src[j:k] + "\x00")
                i = k + len(r"\end{verbatim}")
                continue
            env_stack.append(env)
            i = j
            continue
        if name == "end":
            env, j = _read_group(src, j)
            if not env_stack or env_stack.pop() != env:
                raise _Bad  # mismatched environment
            if env in _LIST_ENVS:
                out.append("\x00")
            i = j
            continue
        if name == "item":
            i = _skip_opts(src, j)
            out.append("\x00- ")
            continue
        if name in _HEADINGS:
            arg, j = _read_group(src, _skip_opts(src, j))
            inner = _walk(arg, state, emit)
            heading = " ".join(inner.replace("\x00", " ").split())
            if name == "title":
                state["title"] = heading
            else:
                state["n_sections"] += 1
                if emit:
                    out.append("\x00" + heading + "\x00")
            i = j
            continue
        if name in _KEEP_ARG:
            arg, j = _read_group(src, _skip_opts(src, j))
            out.append(_walk(arg, state, emit))
            i = j
            continue
        if name == "url":
            arg, j = _read_group(src, j)
            out.append(arg)
            i = j
            continue
        if name in _DROP_ARG:
            if name in _CITES:
                state["n_cites"] += 1
            i = _skip_opts(src, j)
            while i < n and src[i] == "{":
                _, i = _read_group(src, i)
                i = _skip_opts(src, i)
            continue
        # unknown macro: drop its name + [opts]; braced prose (if any)
        # continues through the normal walk
        i = _skip_opts(src, j)
    if depth != 0 or env_stack:
        raise _Bad  # unbalanced braces / unterminated environment
    return "".join(out)


# ------------------------------------------------------------- synthesis
#
# Grid (restated in latex_text_sql / LATEX_EXTRACT_ORACLE):
#   title        'Paper {d}'
#   abstract     'We study topic {d%50} with method {d%7}.'
#   sections     1 + d%3; heading 'Section {s} of {d}'; each section's
#                paragraph carries an \emph wrapper, one \cite (dropped,
#                counted), one inline math span (counted), an escaped
#                percent, and reads 'Results for case {d} show {d%97}%
#                gains over baseline {d%13} (see below).'
#   display math one equation env per section when (d+s) % 2 == 1
#   bullets      docs with d%4 == 1 carry a 2-item list:
#                '- first point {d}' / '- second point {d}'
#   comments     1 + n_sections comment lines (stripped, counted)
#   rejects      d%13 == 5 unbalanced brace; d%19 == 2 unterminated
#                equation environment


def synth_latex(d: int) -> bytes:
    ns = 1 + d % 3
    lines = [
        "% synthetic arXiv-style source " + str(d),
        r"\documentclass[11pt]{article}",
        r"\usepackage{amsmath}",
        r"\title{Paper " + str(d) + "}",
        r"\author{A.~Author \and B.~Author}",
        r"\begin{document}",
        r"\maketitle",
        r"\begin{abstract}",
        f"We study topic {d % 50} with method {d % 7}.",
        r"\end{abstract}",
    ]
    for s in range(ns):
        lines.append("% section comment " + str(s) if s < 2 + d % 3 else "%")
        lines.append(r"\section{Section " + f"{s} of {d}" + "}")
        lines.append(
            f"Results for case {d} show " + r"\emph{" + f"{d % 97}" + r"\%"
            + " gains} over baseline " + f"{d % 13}"
            + r" \cite{ref" + str(d) + r"} where $x_{" + str(d)
            + r"} > 0$ (see below)."
        )
        if (d + s) % 2 == 1:
            lines.append(r"\begin{equation}")
            lines.append(f"y = {d} x + {s}")
            lines.append(r"\end{equation}")
    if d % 4 == 1:
        lines.append(r"\begin{itemize}")
        lines.append(r"\item first point " + str(d))
        lines.append(r"\item second point " + str(d))
        lines.append(r"\end{itemize}")
    if d % 13 == 5:
        lines.append(r"broken {group never closes")
    if d % 19 == 2:
        lines.append(r"\begin{equation} e = mc^2")
    lines.append(r"\end{document}")
    return "\n".join(lines).encode("utf-8")


def latex_text_sql(docs_cte: str) -> str:
    """Parameterized (doc_id, title, text) fragment over a CTE with
    (doc_id, d); excludes the reject legs (callers filter)."""
    return f"""
WITH lx AS ({docs_cte}),
secs AS (
  SELECT lx.doc_id,
         string_agg(
           'Section ' || s.s || ' of ' || lx.d
           || chr(10) || chr(10)
           || 'Results for case ' || lx.d || ' show ' || (lx.d % 97)
           || '% gains over baseline ' || (lx.d % 13)
           || ' where (see below).',
           chr(10) || chr(10) ORDER BY s.s) AS body
  FROM lx JOIN generate_series(0, 2) s(s) ON s.s < 1 + lx.d % 3
  GROUP BY lx.doc_id
)
SELECT lx.doc_id,
       'Paper ' || CAST(lx.d AS VARCHAR) AS title,
       'Paper ' || lx.d || chr(10) || chr(10)
         || 'We study topic ' || (lx.d % 50) || ' with method '
         || (lx.d % 7) || '.' || chr(10) || chr(10) || secs.body
         || CASE WHEN lx.d % 4 = 1
                 THEN chr(10) || chr(10) || '- first point ' || lx.d
                      || chr(10) || chr(10) || '- second point ' || lx.d
                 ELSE '' END AS text
FROM lx JOIN secs USING (doc_id)
"""


# ----------------------------------------------------- Spark entry points

_COLS = ["title", "n_sections", "n_math_inline", "n_math_display",
         "n_comments", "n_cites", "text"]
_SCHEMA = (
    "doc_id bigint, title string, n_sections int, n_math_inline int, "
    "n_math_display int, n_comments int, n_cites int, text string"
)


def latex_extract_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """parse_latex over any (id, binary) frame — one narrow Arrow map,
    NULL rows for rejects."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_latex, _COLS, _SCHEMA,
                              id_col, payload_col)


def latex_extract_roundtrip(spark, sf_dir: str):
    """Oracle roundtrip: per doc a real arXiv-style .tex source
    (comments, wrapper/plumbing macros, inline + display math, escaped
    characters, lists, two reject legs) is synthesized, extracted by
    the real walker, every column restated as doc_id arithmetic."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_latex, parse_latex,
                           _COLS, _SCHEMA)


_TEXT_FRAGMENT = latex_text_sql(
    "SELECT doc_id, doc_id AS d FROM documents "
    "WHERE doc_id % 13 <> 5 AND doc_id % 19 <> 2"
)

LATEX_EXTRACT_ORACLE = f"""
WITH ok AS (
  SELECT doc_id, doc_id AS d FROM documents
  WHERE doc_id % 13 <> 5 AND doc_id % 19 <> 2
),
txt AS ({_TEXT_FRAGMENT}),
disp AS (
  SELECT ok.doc_id,
         CAST(sum(CASE WHEN (ok.d + s.s) % 2 = 1 THEN 1 ELSE 0 END) AS INT)
           AS n_display
  FROM ok JOIN generate_series(0, 2) s(s) ON s.s < 1 + ok.d % 3
  GROUP BY ok.doc_id
)
SELECT d.doc_id,
       txt.title,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE 1 + d.doc_id % 3 END AS INT) AS n_sections,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE 1 + d.doc_id % 3 END AS INT) AS n_math_inline,
       disp.n_display AS n_math_display,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE 1 + (1 + d.doc_id % 3) END AS INT) AS n_comments,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE 1 + d.doc_id % 3 END AS INT) AS n_cites,
       txt.text
FROM documents d
LEFT JOIN ok USING (doc_id)
LEFT JOIN txt USING (doc_id)
LEFT JOIN disp USING (doc_id)
ORDER BY d.doc_id
"""
