"""Subtitle extraction — SRT and WebVTT cue parsing to training text.

Subtitles are the highest-value text payload attached to crawl video:
a pipeline that censuses WebM/MP4 but drops the .srt/.vtt sidecars
loses exactly the transcript tokens an LLM corpus wants. This module
parses both formats for real:

  - SRT: numbered cue blocks, `HH:MM:SS,mmm --> HH:MM:SS,mmm`
    timestamp lines (comma millisecond separator), multi-line cue
    text, blank-line block separation. Validation: indices must be
    1..n in order, every cue's end must exceed its start, and cue
    starts must be non-decreasing.
  - WebVTT (W3C): the WEBVTT magic line, optional cue identifiers,
    dot-millisecond timestamps with optional cue settings after the
    arrow, NOTE comment blocks (skipped), the same monotonicity
    validation.

Census per file: format, cue count, Σ cue durations, span (last end −
first start), the extracted transcript (cues joined by newlines) and
its char/word counts — the text column feeds the text-curation stack
(quality filters, dedup, token budgets) directly.

Reference parity note: the reference (smartdatalake/danae profiler)
has no subtitle handling; this is mandated multimodal extension
surface (text extraction from media sidecars).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

__all__ = [
    "parse_subtitles",
    "synth_subtitles",
    "subtitle_frame",
    "subtitle_extract_roundtrip",
    "SUBTITLE_ORACLE",
]

_TS_SRT = re.compile(r"^(\d{2}):(\d{2}):(\d{2}),(\d{3})$")
_TS_VTT = re.compile(r"^(\d{2,}):(\d{2}):(\d{2})\.(\d{3})$|^(\d{2}):(\d{2})\.(\d{3})$")


def _srt_ts(tok: str) -> int | None:
    m = _TS_SRT.match(tok)
    if not m:
        return None
    h, mi, s, ms = (int(g) for g in m.groups())
    if mi >= 60 or s >= 60:
        return None
    return ((h * 60 + mi) * 60 + s) * 1000 + ms


def _vtt_ts(tok: str) -> int | None:
    m = _TS_VTT.match(tok)
    if not m:
        return None
    g = m.groups()
    if g[0] is not None:
        h, mi, s, ms = int(g[0]), int(g[1]), int(g[2]), int(g[3])
    else:
        h, mi, s, ms = 0, int(g[4]), int(g[5]), int(g[6])
    if mi >= 60 or s >= 60:
        return None
    return ((h * 60 + mi) * 60 + s) * 1000 + ms


def _blocks(text: str) -> list[list[str]]:
    out = []
    cur: list[str] = []
    for line in text.split("\n"):
        if line.strip() == "":
            if cur:
                out.append(cur)
                cur = []
        else:
            cur.append(line.rstrip("\r"))
    if cur:
        out.append(cur)
    return out


def parse_subtitles(payload: bytes) -> dict | None:
    """Parse an SRT or WebVTT payload into one census row:

      format ('srt' | 'vtt'), n_cues, total_cue_ms (Σ per-cue
      durations), span_ms (last end − first start), text (cue lines
      joined by newlines, cues separated by newlines), n_chars,
      n_words (whitespace tokens)

    Returns None for undecodable bytes, malformed timestamps,
    out-of-order SRT indices, end ≤ start, or non-monotonic cue
    starts — corrupt sidecars must not silently contribute garbage
    transcript text to a corpus."""
    try:
        text = payload.decode("utf-8")
    except (UnicodeDecodeError, AttributeError):
        return None
    text = text.lstrip("﻿")
    blocks = _blocks(text)
    if not blocks:
        return None

    fmt: str
    if blocks[0][0].split(" ")[0] == "WEBVTT":
        fmt = "vtt"
        blocks = blocks[1:]
        ts_of = _vtt_ts
    else:
        fmt = "srt"
        ts_of = _srt_ts

    cues: list[tuple[int, int, str]] = []
    expect_idx = 1
    for blk in blocks:
        if fmt == "vtt" and blk[0].startswith("NOTE"):
            continue
        lines = list(blk)
        if fmt == "srt":
            if not lines or not lines[0].strip().isdigit():
                return None
            if int(lines[0].strip()) != expect_idx:
                return None
            expect_idx += 1
            lines = lines[1:]
        elif "-->" not in lines[0] and len(lines) > 1 and "-->" in lines[1]:
            lines = lines[1:]  # optional VTT cue identifier
        if not lines or "-->" not in lines[0]:
            return None
        parts = lines[0].split()
        try:
            arrow = parts.index("-->")
        except ValueError:
            return None
        if arrow != 1 or len(parts) < 3:
            return None
        start = ts_of(parts[0])
        end = ts_of(parts[2])  # parts[3:] = VTT cue settings, allowed
        if start is None or end is None or end <= start:
            return None
        body = "\n".join(lines[1:])
        if not body:
            return None
        cues.append((start, end, body))

    if not cues:
        return None
    for a, b in zip(cues, cues[1:]):
        if b[0] < a[0]:
            return None  # cue starts must be non-decreasing

    full = "\n".join(c[2] for c in cues)
    return {
        "format": fmt,
        "n_cues": len(cues),
        "total_cue_ms": sum(e - s for s, e, _t in cues),
        "span_ms": cues[-1][1] - cues[0][0],
        "text": full,
        "n_chars": len(full),
        "n_words": len(full.split()),
    }


# ------------------------------------------------------------- synthesis


def _cue_geometry(doc_id: int) -> dict:
    return {
        "fmt": "srt" if doc_id % 2 == 0 else "vtt",
        "n_cues": 3 + (doc_id % 6),
    }


def _cue_start_ms(doc_id: int, i: int) -> int:
    return i * 2000 + (doc_id % 7) * 100


def _cue_dur_ms(doc_id: int, i: int) -> int:
    return 500 + ((doc_id + i) % 5) * 250


def _cue_words(doc_id: int, i: int) -> list[str]:
    n = 2 + (doc_id + i) % 3
    return [f"w{(doc_id * 7 + i * 5 + j * 3) % 100}" for j in range(n)]


def _fmt_ts(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3600_000)
    mi, rem = divmod(rem, 60_000)
    s, ms = divmod(rem, 1000)
    return f"{h:02d}:{mi:02d}:{s:02d}{sep}{ms:03d}"


def synth_subtitles(doc_id: int) -> bytes:
    """Doc-deterministic subtitle file: SRT on even docs, WebVTT on odd
    (with a NOTE block, a cue identifier, and cue settings the parser
    must accept/skip)."""
    g = _cue_geometry(doc_id)
    out: list[str] = []
    if g["fmt"] == "vtt":
        out.append("WEBVTT - danae synth")
        out.append("")
        out.append("NOTE deterministic fixture")
        out.append("")
    for i in range(g["n_cues"]):
        start = _cue_start_ms(doc_id, i)
        end = start + _cue_dur_ms(doc_id, i)
        text = " ".join(_cue_words(doc_id, i))
        if g["fmt"] == "srt":
            out.append(str(i + 1))
            out.append(f"{_fmt_ts(start, ',')} --> {_fmt_ts(end, ',')}")
        else:
            if i == 0:
                out.append(f"cue-{doc_id}-{i}")  # optional identifier
            settings = " align:start position:10%" if i % 2 == 0 else ""
            out.append(f"{_fmt_ts(start, '.')} --> {_fmt_ts(end, '.')}{settings}")
        out.append(text)
        out.append("")
    return "\n".join(out).encode("utf-8")


# ----------------------------------------------------- Spark entry points

_COLS = ["format", "n_cues", "total_cue_ms", "span_ms", "text", "n_chars", "n_words"]

_SCHEMA = (
    "doc_id bigint, format string, n_cues int, total_cue_ms bigint, "
    "span_ms bigint, text string, n_chars int, n_words int"
)


def subtitle_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Subtitle extraction over any (id, binary) frame; nulls for
    undecodable payloads. The `text` column plugs straight into the
    text-curation operators."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = parse_subtitles(bytes(payload)) if payload is not None else None
                row = {id_col: rid}
                row.update({k: (c.get(k) if c else None) for k in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + _COLS)

    return df.mapInPandas(batches, schema=_SCHEMA.replace("doc_id", id_col, 1))


def subtitle_extract_roundtrip(spark, sf_dir: str):
    """Oracle-checkable subtitle extraction: per doc a real SRT or
    WebVTT file is synthesized byte-for-byte (VTT fixtures include
    NOTE blocks, cue ids and cue settings), parsed by the real cue
    parser with monotonicity validation, and EVERYTHING — including
    the extracted transcript string itself — restated in SQL via
    nested ordered string_aggs, so the value hash covers the exact
    text the curation stack would consume."""
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
                c = parse_subtitles(synth_subtitles(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in _COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + _COLS)

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_SCHEMA)
        .orderBy("doc_id")
    )


def subtitle_text_sql(pages_cte: str) -> str:
    """The cue arithmetic as SQL over a `pages(doc_id, e)` CTE (e =
    the synth parameter), shared between SUBTITLE_ORACLE (e = doc_id)
    and the text-harvest oracle, so the dispatcher entry certifies the
    SAME restated rules."""
    return f"""
WITH sub_pages AS ({pages_cte}),
sg AS (
  SELECT doc_id, e,
         CASE WHEN e % 2 = 0 THEN 'srt' ELSE 'vtt' END AS format,
         CAST(3 + e % 6 AS INT) AS n_cues
  FROM sub_pages
),
sw AS (
  SELECT g.doc_id, g.e, c.i AS cue, j.j AS wi,
         'w' || CAST((g.e * 7 + c.i * 5 + j.j * 3) % 100 AS VARCHAR) AS word
  FROM sg g, generate_series(0, 8) c(i), generate_series(0, 4) j(j)
  WHERE c.i < g.n_cues AND j.j < 2 + (g.e + c.i) % 3
),
scue AS (
  SELECT doc_id, e, cue, string_agg(word, ' ' ORDER BY wi) AS line
  FROM sw GROUP BY doc_id, e, cue
),
sdoc AS (
  SELECT doc_id, e, string_agg(line, chr(10) ORDER BY cue) AS text
  FROM scue GROUP BY doc_id, e
),
sdur AS (
  SELECT g.doc_id, g.e,
         CAST(sum(500 + (g.e + c.i) % 5 * 250) AS BIGINT) AS total_cue_ms,
         CAST(max(c.i * 2000 + (g.e % 7) * 100
                  + 500 + (g.e + c.i) % 5 * 250)
              - min(c.i * 2000 + (g.e % 7) * 100) AS BIGINT) AS span_ms
  FROM sg g, generate_series(0, 8) c(i)
  WHERE c.i < g.n_cues
  GROUP BY g.doc_id, g.e
)
SELECT g.doc_id, g.e, g.format, g.n_cues, d.total_cue_ms, d.span_ms, t.text
FROM sg g
JOIN sdur d ON g.doc_id = d.doc_id AND g.e = d.e
JOIN sdoc t ON g.doc_id = t.doc_id AND g.e = t.e
"""


SUBTITLE_ORACLE = f"""
WITH x AS ({subtitle_text_sql("SELECT doc_id, doc_id AS e FROM documents")})
SELECT doc_id, format, n_cues, total_cue_ms, span_ms, text,
       CAST(length(text) AS INT) AS n_chars,
       CAST(length(text) - length(replace(replace(text, chr(10), ''),
            ' ', '')) + 1 AS INT) AS n_words
FROM x ORDER BY doc_id
"""
