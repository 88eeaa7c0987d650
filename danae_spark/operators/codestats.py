"""Code-corpus operators — the StarCoder-class curation leg: SPDX
license detection, code-vs-prose classification, and per-language
line/comment/blank stats over a text column.

What a source-code training pipeline asks of every file, from public
conventions only:

  - LICENSE: the machine-readable `SPDX-License-Identifier: <id>` tag
    (the SPDX convention, exact token) wins; otherwise header-text
    heuristics for the big license families (MIT's "Permission is
    hereby granted, free of charge", Apache-2.0's "Licensed under the
    Apache License, Version 2.0", the GNU GPL preamble, BSD's
    "Redistribution and use in source and binary forms") over the
    first 2 KB. No match -> NULL, never a guess.
  - LANGUAGE: content-marker heuristics (shebangs, `#include`,
    `package main`+`func`, `fn main`, `public class`, `function`/
    `const ... ;`, `import`/`def `) — deterministic precedence,
    NULL for unrecognized content.
  - LINE STATS under the DETECTED language's comment syntax: line
    comments (`#` for python, `//` for the C family), block comments
    (`/* .. */`, counted per line, unterminated block rejects whole),
    blank lines, and code lines (non-blank, non-comment; a trailing
    comment on a code line stays code). `#include` is code in C, a
    comment in nothing.
  - CODE-VS-PROSE: the structural-line ratio — lines ending in one of
    `{`/`}`/`;` or carrying an ` = ` binding, over non-blank lines;
    is_code at >= 30%. Independent of language detection (prose with
    a stray `import` still classifies by shape).
  - reject-whole: undecodable/control-character payloads (binary
    blobs are not source files), unterminated block comments.

Reference parity note: the reference engine (SURVEY §1) has no text
analysis; extension surface beside operators/textstats.py.
"""

from __future__ import annotations

from typing import Optional

__all__ = [
    "detect_license",
    "detect_language",
    "parse_code_stats",
    "synth_code_doc",
    "code_stats_frame",
    "code_stats_roundtrip",
    "CODE_STATS_ORACLE",
]

_MAX_BYTES = 64 * 1024 * 1024

_SPDX_TAG = "SPDX-License-Identifier:"
_LICENSE_TEXTS = (
    ("Permission is hereby granted, free of charge", "MIT"),
    ("Licensed under the Apache License, Version 2.0", "Apache-2.0"),
    ("GNU General Public License", "GPL-3.0"),
    ("Redistribution and use in source and binary forms", "BSD-3-Clause"),
)

_LINE_COMMENT = {
    "python": "#", "javascript": "//", "c": "//", "go": "//",
    "rust": "//", "java": "//",
}
_BLOCK_LANGS = frozenset(("javascript", "c", "go", "rust", "java"))


class _Bad(Exception):
    pass


def detect_license(text: str) -> Optional[str]:
    head = text[:2048]
    tag = head.find(_SPDX_TAG)
    if tag >= 0:
        rest = head[tag + len(_SPDX_TAG):].strip()
        token = rest.split()[0] if rest.split() else ""
        token = token.strip("*/").strip()
        if token:
            return token
    for needle, lic in _LICENSE_TEXTS:
        if needle in head:
            return lic
    return None


def detect_language(text: str) -> Optional[str]:
    head = text[:4096]
    first = head.split("\n", 1)[0]
    if first.startswith("#!"):
        if "python" in first:
            return "python"
        if "node" in first:
            return "javascript"
    if "#include" in head:
        return "c"
    if "package main" in head and "func " in head:
        return "go"
    if "fn main(" in head or "let mut " in head:
        return "rust"
    if "public class " in head:
        return "java"
    if "function " in head or ("const " in head and ";" in head):
        return "javascript"
    if "import " in head or "def " in head:
        return "python"
    return None


def _is_structural(line: str) -> bool:
    s = line.rstrip()
    return s.endswith(("{", "}", ";")) or " = " in s


def parse_code_stats(payload: bytes) -> Optional[dict]:
    try:
        return _parse(payload)
    except (_Bad, ValueError, UnicodeDecodeError):
        return None


def _parse(payload: bytes) -> Optional[dict]:
    p = bytes(payload) if payload is not None else b""
    if not p or len(p) > _MAX_BYTES:
        return None
    try:
        text = p.decode("utf-8")
    except UnicodeDecodeError:
        raise _Bad
    if any(ord(c) < 9 or 13 < ord(c) < 32 for c in text[:4096]):
        raise _Bad  # control characters: a binary blob, not source
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    language = detect_language(text)
    line_marker = _LINE_COMMENT.get(language or "", None)
    has_block = language in _BLOCK_LANGS
    n_blank = n_comment = n_code = 0
    in_block = False
    structural = 0
    nonblank = 0
    for line in lines:
        stripped = line.strip()
        if in_block:
            n_comment += 1
            nonblank += 1
            if "*/" in stripped:
                in_block = False
            continue
        if not stripped:
            n_blank += 1
            continue
        nonblank += 1
        if _is_structural(line):
            structural += 1
        if has_block and stripped.startswith("/*"):
            n_comment += 1
            if "*/" not in stripped[2:]:
                in_block = True
            continue
        if line_marker and stripped.startswith(line_marker):
            n_comment += 1
            continue
        n_code += 1
    if in_block:
        raise _Bad  # unterminated block comment
    is_code = nonblank > 0 and structural * 10 >= 3 * nonblank
    return {
        "language": language,
        "license": detect_license(text),
        "n_lines": len(lines),
        "n_blank": n_blank,
        "n_comment": n_comment,
        "n_code": n_code,
        "is_code": is_code,
    }


# ------------------------------------------------------------- synthesis
#
# Polyglot grid (restated in CODE_STATS_ORACLE):
#   reject   d % 13 == 7 -> binary payload (NULL row)
#   prose    d % 7 == 2  -> 3 + d%4 sentences + 1 blank; everything
#            NULL/0/false except the line counts
#   code     lang = [python, javascript, c, go, rust, java][d % 6]
#     license channel c = d % 5:
#       0 SPDX tag  -> id = [MIT, Apache-2.0, GPL-3.0-only,
#                            BSD-3-Clause][d % 4]
#       1 MIT text (2 header lines)   2 Apache text (1)
#       3 GPL text (1)                4 none (0)
#     comments = header + block (2 for the C family, 0 for python)
#                + 1 + d%3 line comments
#     code     = 2 fixed skeleton lines + 4 + d%5 body bindings
#     blanks   = 1 + d%2

_LANGS = ("python", "javascript", "c", "go", "rust", "java")
_SPDX_IDS = ("MIT", "Apache-2.0", "GPL-3.0-only", "BSD-3-Clause")
_MIT_L1 = "Permission is hereby granted, free of charge, to any person"
_MIT_L2 = "obtaining a copy of this software and associated files."
_APACHE_L = 'Licensed under the Apache License, Version 2.0 (the "License").'
_GPL_L = "This file is distributed under the GNU General Public License."

_SKELETONS = {
    "python": ("import os", "def f():", "    x{i} = {i}"),
    "javascript": ("function f() {{", "}}", "  const x{i} = {i};"),
    "c": ("#include <stdio.h>", "int main(void) {{ return 0; }}",
          "int x{i} = {i};"),
    "go": ("package main", "func main() {{}}", "var x{i} = {i}"),
    "rust": ("fn main() {{}}", "static Y: i32 = 1;",
             "static X{i}: i32 = {i};"),
    "java": ("public class D {{", "}}", "  int x{i} = {i};"),
}


def synth_code_doc(d: int) -> bytes:
    if d % 13 == 7:
        return bytes([0, 1, 2, 3, 255, 254]) + b"binary junk" * 4
    if d % 7 == 2:
        sents = [
            f"The quick brown fox jumps over the lazy dog number {d} {j}."
            for j in range(3 + d % 4)
        ]
        return "\n".join([sents[0], ""] + sents[1:]).encode()
    lang = _LANGS[d % 6]
    cm = _LINE_COMMENT[lang]
    c = d % 5
    header: list[str] = []
    if c == 0:
        header.append(f"{cm} {_SPDX_TAG} {_SPDX_IDS[d % 4]}")
    elif c == 1:
        header.append(f"{cm} {_MIT_L1}")
        header.append(f"{cm} {_MIT_L2}")
    elif c == 2:
        header.append(f"{cm} {_APACHE_L}")
    elif c == 3:
        header.append(f"{cm} {_GPL_L}")
    open_l, close_l, body_t = _SKELETONS[lang]
    lines = list(header)
    lines.append(open_l.format())
    if lang in _BLOCK_LANGS:
        lines.append(f"/* block note {d}")
        lines.append("   continues */")
    for j in range(1 + d % 3):
        lines.append(f"{cm} note {j}")
    for i in range(4 + d % 5):
        lines.append(body_t.format(i=i))
    lines.append("")
    if d % 2 == 1:
        lines.append("")
    lines.append(close_l.format())
    return "\n".join(lines).encode()


# ----------------------------------------------------- Spark entry points

_COLS = ["language", "license", "n_lines", "n_blank", "n_comment",
         "n_code", "is_code"]
_SCHEMA = (
    "doc_id bigint, language string, license string, n_lines int, "
    "n_blank int, n_comment int, n_code int, is_code boolean"
)


def code_stats_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """parse_code_stats over any (id, binary) frame — one narrow
    Arrow map, NULL rows for rejects."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_code_stats, _COLS, _SCHEMA,
                              id_col, payload_col)


def code_stats_roundtrip(spark, sf_dir: str):
    """Oracle roundtrip: per doc a real polyglot source file (6
    languages, 5 license channels, block/line comments, prose and
    binary legs) is synthesized, analyzed by the real detector +
    counter, every column restated as doc_id arithmetic."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_code_doc, parse_code_stats,
                           _COLS, _SCHEMA)


CODE_STATS_ORACLE = """
WITH base AS (
  SELECT doc_id, doc_id AS d,
         doc_id % 13 = 7 AS rej,
         doc_id % 13 <> 7 AND doc_id % 7 = 2 AS prose
  FROM documents
),
code AS (
  SELECT *,
         CASE d % 6 WHEN 0 THEN 'python' WHEN 1 THEN 'javascript'
              WHEN 2 THEN 'c' WHEN 3 THEN 'go' WHEN 4 THEN 'rust'
              ELSE 'java' END AS lang,
         CASE d % 5 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 1
              WHEN 3 THEN 1 ELSE 0 END AS n_lic,
         CASE WHEN d % 6 = 0 THEN 0 ELSE 2 END AS n_block
  FROM base WHERE NOT rej AND NOT prose
)
SELECT b.doc_id,
       CASE WHEN b.rej OR b.prose THEN NULL ELSE c.lang END AS language,
       CASE WHEN b.rej OR b.prose THEN NULL
            ELSE (CASE b.d % 5
                  WHEN 0 THEN (CASE b.d % 4 WHEN 0 THEN 'MIT'
                               WHEN 1 THEN 'Apache-2.0'
                               WHEN 2 THEN 'GPL-3.0-only'
                               ELSE 'BSD-3-Clause' END)
                  WHEN 1 THEN 'MIT' WHEN 2 THEN 'Apache-2.0'
                  WHEN 3 THEN 'GPL-3.0' ELSE NULL END) END AS license,
       CAST(CASE WHEN b.rej THEN NULL
            WHEN b.prose THEN (3 + b.d % 4) + 1
            ELSE c.n_lic + c.n_block + (1 + b.d % 3)
                 + 2 + (4 + b.d % 5) + (1 + b.d % 2) END AS INT) AS n_lines,
       CAST(CASE WHEN b.rej THEN NULL
            WHEN b.prose THEN 1
            ELSE 1 + b.d % 2 END AS INT) AS n_blank,
       CAST(CASE WHEN b.rej THEN NULL
            WHEN b.prose THEN 0
            ELSE c.n_lic + c.n_block + (1 + b.d % 3) END AS INT) AS n_comment,
       CAST(CASE WHEN b.rej THEN NULL
            WHEN b.prose THEN 3 + b.d % 4
            ELSE 2 + 4 + b.d % 5 END AS INT) AS n_code,
       CASE WHEN b.rej THEN NULL
            WHEN b.prose THEN FALSE ELSE TRUE END AS is_code
FROM base b
LEFT JOIN code c USING (doc_id)
ORDER BY b.doc_id
"""
