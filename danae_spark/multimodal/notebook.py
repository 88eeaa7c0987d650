"""Jupyter notebook (.ipynb) text extraction — the GitHub-scale
code+prose corpus class.

Notebooks are pure JSON (nbformat 4, the universal on-disk format
since 2015): a `cells` list of markdown / code / raw cells whose
`source` is a string or list of lines, plus kernel metadata. The
extractor is STRICT where the corpus depends on it:

  - nbformat 4 only — v3 `worksheets` containers and any other major
    version reject whole (a half-understood container must not ship
    partial text);
  - cell_type outside {markdown, code, raw}, a non-string source, or
    a code cell whose `outputs` is not a list: reject whole;
  - outputs are STRIPPED (counted, never extracted) — execution
    output is environment noise, not authored text;
  - raw cells are counted but excluded from text (they are
    mime-targeted passthrough, not prose);
  - text = markdown + code sources in cell order, joined with blank
    lines; language from kernelspec.language, else
    language_info.name;
  - title = the first leading-`# ` heading of the first markdown
    cell that has one.

Routed in text_harvest (document side: a notebook is authored text)
AND blob_harvest (container side: identity-first — a payload carrying
the `"nbformat"` signature either parses as a notebook or rejects
whole, it never falls through to the generic JSON grammar).

Reference parity note: the reference engine (SURVEY §1) has no
document extraction; this extends the crawl/corpus surface like
multimodal/office.py (C112).
"""

from __future__ import annotations

import json
from typing import Optional

__all__ = [
    "parse_notebook",
    "synth_notebook",
    "notebook_text_sql",
    "notebook_extract_frame",
    "notebook_extract_roundtrip",
    "NOTEBOOK_EXTRACT_ORACLE",
]

_MAX_BYTES = 256 * 1024 * 1024
_CELL_TYPES = ("markdown", "code", "raw")


class _Bad(Exception):
    pass


def _cell_source(cell: dict) -> str:
    src = cell.get("source")
    if isinstance(src, str):
        return src
    if isinstance(src, list) and all(isinstance(s, str) for s in src):
        return "".join(src)
    raise _Bad


def parse_notebook(payload: bytes) -> Optional[dict]:
    try:
        return _parse(payload)
    except (_Bad, ValueError, UnicodeDecodeError, RecursionError):
        return None


def _parse(payload: bytes) -> Optional[dict]:
    p = bytes(payload) if payload is not None else b""
    if not p or len(p) > _MAX_BYTES or p.lstrip()[:1] != b"{":
        return None
    try:
        nb = json.loads(p.decode("utf-8"))
    except json.JSONDecodeError:
        raise _Bad
    if not isinstance(nb, dict) or nb.get("nbformat") != 4:
        raise _Bad
    cells = nb.get("cells")
    if not isinstance(cells, list):
        raise _Bad
    meta = nb.get("metadata", {})
    if not isinstance(meta, dict):
        raise _Bad
    language = None
    ks = meta.get("kernelspec")
    if isinstance(ks, dict) and isinstance(ks.get("language"), str):
        language = ks["language"]
    if language is None:
        li = meta.get("language_info")
        if isinstance(li, dict) and isinstance(li.get("name"), str):
            language = li["name"]
    n_code = n_md = n_raw = 0
    n_outputs = 0
    parts: list[str] = []
    title = None
    for cell in cells:
        if not isinstance(cell, dict):
            raise _Bad
        ct = cell.get("cell_type")
        if ct not in _CELL_TYPES:
            raise _Bad
        src = _cell_source(cell)
        if ct == "markdown":
            n_md += 1
            if title is None and src.strip():
                first = src.lstrip().splitlines()[0]
                if first.startswith("# "):
                    title = first[2:].strip()
            parts.append(src)
        elif ct == "code":
            outs = cell.get("outputs")
            if not isinstance(outs, list):
                raise _Bad
            n_code += 1
            n_outputs += len(outs)
            parts.append(src)
        else:
            n_raw += 1  # counted, excluded from text
    return {
        "language": language,
        "n_cells": len(cells),
        "n_code": n_code,
        "n_markdown": n_md,
        "n_raw": n_raw,
        "n_outputs": n_outputs,
        "title": title,
        "text": "\n\n".join(parts),
    }


# ------------------------------------------------------------- synthesis
#
# Cell grid (restated in notebook_text_sql / NOTEBOOK_EXTRACT_ORACLE):
#   language  = [python, r, julia, scala][d % 4], carried via
#               language_info when d % 5 == 0 else kernelspec
#   cells     = md#0 (titled), code#0..(d%4), md#1..(d%3 - 1),
#               raw cell when d % 2 == 1
#   md#0      = '# Notebook {d}'
#   md#j>0    = 'Markdown cell {j} of notebook {d}.\nIt has two lines.'
#   code#k    = 'x{k} = {d} + {k}\nprint(x{k})', with (d+k) % 3
#               stream outputs attached (stripped by the extractor)
#   source    = list-of-lines when (d + cell index) % 2 == 0 else one
#               string (both spec-legal channels)
#   rejects   : d % 17 == 3 truncated JSON; d % 19 == 6 nbformat 3;
#               d % 23 == 11 cells-not-a-list
_LANGS = ("python", "r", "julia", "scala")


def _src_channel(text: str, flip: int):
    if flip % 2 == 0:
        return text.splitlines(keepends=True) or [""]
    return text


def synth_notebook(d: int) -> bytes:
    lang = _LANGS[d % 4]
    cells: list[dict] = []
    cells.append(
        {"cell_type": "markdown", "metadata": {},
         "source": _src_channel(f"# Notebook {d}", d)}
    )
    for k in range(1 + d % 4):
        outs = [
            {"output_type": "stream", "name": "stdout", "text": [f"out {o}\n"]}
            for o in range((d + k) % 3)
        ]
        cells.append(
            {"cell_type": "code", "execution_count": k + 1, "metadata": {},
             "outputs": outs,
             "source": _src_channel(f"x{k} = {d} + {k}\nprint(x{k})", d + k + 1)}
        )
    for j in range(1, 1 + d % 3):
        cells.append(
            {"cell_type": "markdown", "metadata": {},
             "source": _src_channel(
                 f"Markdown cell {j} of notebook {d}.\nIt has two lines.",
                 d + j)}
        )
    if d % 2 == 1:
        cells.append({"cell_type": "raw", "metadata": {},
                      "source": f"raw attachment {d}"})
    if d % 5 == 0:
        meta = {"language_info": {"name": lang, "version": "0"}}
    else:
        meta = {"kernelspec": {"name": f"kernel-{lang}", "language": lang,
                               "display_name": lang}}
    if d % 19 == 6:
        nb = {"nbformat": 3, "nbformat_minor": 0,
              "worksheets": [{"cells": cells}], "metadata": meta}
    elif d % 23 == 11:
        nb = {"nbformat": 4, "nbformat_minor": 5, "cells": {"not": "a list"},
              "metadata": meta}
    else:
        nb = {"nbformat": 4, "nbformat_minor": 5, "cells": cells,
              "metadata": meta}
    raw = json.dumps(nb, indent=1 if d % 2 else None).encode("utf-8")
    if d % 17 == 3:
        return raw[: max(2, len(raw) // 2)]  # truncated JSON (reject)
    return raw


def notebook_text_sql(docs_cte: str) -> str:
    """Parameterized (doc_id, title, text) fragment over a CTE with
    (doc_id, d) — reused verbatim by the harvest-composition oracle so
    the unit entry and the dispatcher can never drift. Excludes the
    reject legs; callers filter those."""
    return f"""
WITH nb AS ({docs_cte}),
codes AS (
  SELECT nb.doc_id,
         string_agg('x' || k.k || ' = ' || nb.d || ' + ' || k.k || chr(10)
                    || 'print(x' || k.k || ')',
                    chr(10) || chr(10) ORDER BY k.k) AS code_text
  FROM nb JOIN generate_series(0, 3) k(k) ON k.k < 1 + nb.d % 4
  GROUP BY nb.doc_id
),
mds AS (
  SELECT nb.doc_id,
         string_agg('Markdown cell ' || j.j || ' of notebook ' || nb.d
                    || '.' || chr(10) || 'It has two lines.',
                    chr(10) || chr(10) ORDER BY j.j) AS md_text
  FROM nb JOIN generate_series(1, 2) j(j) ON j.j < 1 + nb.d % 3
  GROUP BY nb.doc_id
)
SELECT nb.doc_id,
       'Notebook ' || CAST(nb.d AS VARCHAR) AS title,
       '# Notebook ' || CAST(nb.d AS VARCHAR)
         || chr(10) || chr(10) || codes.code_text
         || CASE WHEN mds.md_text IS NOT NULL
                 THEN chr(10) || chr(10) || mds.md_text ELSE '' END AS text
FROM nb
JOIN codes USING (doc_id)
LEFT JOIN mds USING (doc_id)
"""


# ----------------------------------------------------- Spark entry points

_COLS = ["language", "n_cells", "n_code", "n_markdown", "n_raw",
         "n_outputs", "title", "text"]
_SCHEMA = (
    "doc_id bigint, language string, n_cells int, n_code int, "
    "n_markdown int, n_raw int, n_outputs int, title string, text string"
)


def notebook_extract_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """parse_notebook over any (id, binary) frame — one narrow Arrow
    map, NULL rows for rejects."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_notebook, _COLS, _SCHEMA,
                              id_col, payload_col)


def notebook_extract_roundtrip(spark, sf_dir: str):
    """Oracle roundtrip: per doc a real .ipynb (both source channels,
    both metadata channels, outputs attached then stripped, three
    reject legs) is synthesized, parsed by the strict extractor, and
    every column restated as doc_id arithmetic."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_notebook, parse_notebook,
                           _COLS, _SCHEMA)


_TEXT_FRAGMENT = notebook_text_sql(
    "SELECT doc_id, doc_id AS d FROM documents "
    "WHERE doc_id % 17 <> 3 AND doc_id % 19 <> 6 AND doc_id % 23 <> 11"
)

NOTEBOOK_EXTRACT_ORACLE = f"""
WITH ok AS (
  SELECT doc_id, doc_id AS d FROM documents
  WHERE doc_id % 17 <> 3 AND doc_id % 19 <> 6 AND doc_id % 23 <> 11
),
txt AS ({_TEXT_FRAGMENT}),
outs AS (
  SELECT ok.doc_id,
         CAST(sum((ok.d + k.k) % 3) AS INT) AS n_outputs
  FROM ok JOIN generate_series(0, 3) k(k) ON k.k < 1 + ok.d % 4
  GROUP BY ok.doc_id
)
SELECT d.doc_id,
       CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE (CASE d.doc_id % 4 WHEN 0 THEN 'python' WHEN 1 THEN 'r'
                  WHEN 2 THEN 'julia' ELSE 'scala' END) END AS language,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE (1 + d.doc_id % 3) + (1 + d.doc_id % 4) + d.doc_id % 2
            END AS INT) AS n_cells,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE 1 + d.doc_id % 4 END AS INT) AS n_code,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE 1 + d.doc_id % 3 END AS INT) AS n_markdown,
       CAST(CASE WHEN ok.doc_id IS NULL THEN NULL
            ELSE d.doc_id % 2 END AS INT) AS n_raw,
       outs.n_outputs,
       txt.title, txt.text
FROM documents d
LEFT JOIN ok USING (doc_id)
LEFT JOIN txt USING (doc_id)
LEFT JOIN outs USING (doc_id)
ORDER BY d.doc_id
"""
