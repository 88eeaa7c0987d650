"""Per-blob CSV census — RFC 4180 with the real-world delimiter zoo.

A data lake's "tabular" prefix is mostly CSV blobs of unknown dialect;
before ingesting one as a table you need its delimiter, shape, and
how much of it hides inside quotes (an embedded newline miscounted as
a row separator silently shears every downstream row count). This
module is the census you run first:

  - full RFC 4180 quoting: quoted fields may contain the delimiter,
    CR/LF newlines, and doubled-quote escapes; row counting is
    quote-aware (the whole point — `wc -l` lies on real CSVs);
  - delimiter sniff over {comma, semicolon, tab, pipe}: each
    candidate is parsed COMPLETELY with the quote grammar, and the
    winner is the one yielding a consistent multi-column grid
    (ties break in the candidate order above); the sniff is certified
    by the oracle indirectly — a mis-sniff changes every census
    column;
  - ragged rows reported, not hidden (n_ragged vs the header width);
  - reject-whole: unterminated quote, a bare quote inside an unquoted
    field, text after a closing quote, invalid UTF-8 — a malformed
    blob yields NULLs, never a half-parsed table.

Census row: delimiter name, n_rows (data rows, header excluded),
n_cols (header width), n_quoted (fields that required quoting),
n_ragged, header (fields joined '/'), first_value (data cell [0][0]).
"""

from __future__ import annotations

from typing import Optional

__all__ = [
    "parse_csv_blob",
    "synth_csv",
    "csv_census_frame",
    "csv_census_roundtrip",
    "CSV_CENSUS_ORACLE",
]

_DELIMS = [(",", "comma"), (";", "semicolon"), ("\t", "tab"), ("|", "pipe")]


def _parse_rows(text: str, delim: str) -> Optional[tuple[list[list[str]], int]]:
    """Full RFC 4180 parse with one delimiter: (rows, n_quoted) or
    None on a grammar violation."""
    rows: list[list[str]] = []
    field: list[str] = []
    row: list[str] = []
    n_quoted = 0
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == '"':
            if field:
                return None  # quote opening mid-field: malformed
            n_quoted += 1
            i += 1
            while True:
                j = text.find('"', i)
                if j == -1:
                    return None  # unterminated quote
                if j + 1 < n and text[j + 1] == '"':
                    field.append(text[i:j] + '"')
                    i = j + 2
                    continue
                field.append(text[i:j])
                i = j + 1
                break
            # after the closing quote only delim / newline / EOF
            if i < n and text[i] not in (delim, "\r", "\n"):
                return None
            continue
        if c == delim:
            row.append("".join(field))
            field = []
            i += 1
            continue
        if c in "\r\n":
            if c == "\r" and i + 1 < n and text[i + 1] == "\n":
                i += 1
            row.append("".join(field))
            rows.append(row)
            field, row = [], []
            i += 1
            continue
        if c == '"':  # pragma: no cover - handled above
            return None
        field.append(c)
        i += 1
    if field or row:
        row.append("".join(field))
        rows.append(row)
    return rows, n_quoted


def parse_csv_blob(payload: bytes) -> Optional[dict]:
    """Sniff + census; None on reject (see module docstring)."""
    if not payload:
        return None
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        return None
    if "\x00" in text:
        return None

    best = None
    for delim, name in _DELIMS:
        got = _parse_rows(text, delim)
        if got is None:
            continue
        rows, n_quoted = got
        if len(rows) < 2 or len(rows[0]) < 2:
            continue  # a delimiter that yields a 1-column or 1-row grid
        width = len(rows[0])
        ragged = sum(1 for r in rows[1:] if len(r) != width)
        consistent = ragged == 0
        # prefer the first candidate producing a fully consistent grid;
        # otherwise the first multi-column parse (ragged reported)
        if best is None or (consistent and not best[0]):
            best = (consistent, name, rows, n_quoted, ragged)
            if consistent:
                break
    if best is None:
        # every candidate failed the grammar or produced no grid
        return None
    _consistent, name, rows, n_quoted, ragged = best
    header = rows[0]
    return {
        "delimiter": name,
        "n_rows": len(rows) - 1,
        "n_cols": len(header),
        "n_quoted": n_quoted,
        "n_ragged": ragged,
        "header": "/".join(header),
        "first_value": rows[1][0] if len(rows) > 1 and rows[1] else None,
    }


# ----------------------------------------------------------- synthesis
#
# Pure doc_id arithmetic (restated in CSV_CENSUS_ORACLE):
#   delim = [comma, semicolon, tab, pipe][d % 4]
#   n_cols = 2 + d % 3 ; data rows r in 1..(2 + d % 4)
#   cell (r, c), s = (d*7 + r*5 + c*3) % 50, k = d + r + c — precedence:
#     k % 11 == 7 -> 'He said "x{s}"'   (doubled-quote escape, quoted)
#     k % 7  == 4 -> 'a{s}\nb'          (embedded newline, quoted)
#     k % 5  == 0 -> 'q{s}{delim}x'     (embedded delimiter, quoted)
#     else        -> 'v{s}'             (bare)
#   header 'col0'..'col{n_cols-1}' (never quoted)
#   d % 13 == 6 -> one extra trailing field on the LAST data row
#                  (n_ragged = 1)
#   d % 2 == 1  -> CRLF row terminators (census-invisible)
#   d % 19 == 3 -> unterminated quote appended (reject leg)


def _cell(d: int, r: int, c: int, delim: str) -> tuple[str, bool]:
    s = (d * 7 + r * 5 + c * 3) % 50
    k = d + r + c
    if k % 11 == 7:
        return f'He said "x{s}"', True
    if k % 7 == 4:
        return f"a{s}\nb", True
    if k % 5 == 0:
        return f"q{s}{delim}x", True
    return f"v{s}", False


def csv_n_cols(d: int) -> int:
    return 2 + d % 3


def csv_n_rows(d: int) -> int:
    return 2 + d % 4


def synth_csv(d: int) -> bytes:
    delim = _DELIMS[d % 4][0]
    eol = "\r\n" if d % 2 == 1 else "\n"
    n_cols = csv_n_cols(d)
    lines = [delim.join(f"col{c}" for c in range(n_cols))]
    for r in range(1, csv_n_rows(d) + 1):
        fields = []
        for c in range(n_cols):
            val, quoted = _cell(d, r, c, delim)
            if quoted:
                fields.append('"' + val.replace('"', '""') + '"')
            else:
                fields.append(val)
        if d % 13 == 6 and r == csv_n_rows(d):
            fields.append("extra")
        lines.append(delim.join(fields))
    raw = (eol.join(lines) + eol).encode("utf-8")
    if d % 19 == 3:
        return raw + b'"never closed'
    return raw


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, delimiter string, n_rows int, n_cols int, "
    "n_quoted int, n_ragged int, header string, first_value string"
)
_COLS = [
    "delimiter",
    "n_rows",
    "n_cols",
    "n_quoted",
    "n_ragged",
    "header",
    "first_value",
]


def csv_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """CSV census over any (id, binary) frame: one Arrow-batched
    narrow map, no shuffle (multimodal/docframes.py)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_csv_blob, _COLS, _SCHEMA, id_col, payload_col)


def csv_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real CSV blob (quoted
    embedded delimiters / newlines / doubled quotes, four dialects,
    CRLF on odd docs, a ragged leg and an unterminated-quote reject
    leg) is synthesized, sniffed + parsed by the RFC 4180 grammar,
    and every census column restated as doc_id arithmetic."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_csv, parse_csv_blob, _COLS, _SCHEMA)


CSV_CENSUS_ORACLE = """
WITH d0 AS (SELECT doc_id, doc_id AS d FROM documents),
cells AS (
  SELECT doc_id, d, r.r, c.c,
         (d * 7 + r.r * 5 + c.c * 3) % 50 AS s,
         (d + r.r + c.c) AS k,
         CASE d % 4 WHEN 0 THEN ',' WHEN 1 THEN ';'
                    WHEN 2 THEN chr(9) ELSE '|' END AS delim
  FROM d0, generate_series(1, 5) r(r), generate_series(0, 4) c(c)
  WHERE r.r <= 2 + d % 4 AND c.c < 2 + d % 3
),
vals AS (
  SELECT doc_id, d, r, c,
         CASE WHEN k % 11 = 7 THEN 'He said "x' || CAST(s AS VARCHAR) || '"'
              WHEN k % 7 = 4 THEN 'a' || CAST(s AS VARCHAR) || chr(10) || 'b'
              WHEN k % 5 = 0 THEN 'q' || CAST(s AS VARCHAR) || delim || 'x'
              ELSE 'v' || CAST(s AS VARCHAR) END AS val,
         CAST(k % 11 = 7 OR k % 7 = 4 OR k % 5 = 0 AS INT) AS quoted
  FROM cells
),
agg AS (
  SELECT doc_id, d,
         CAST(sum(quoted) AS INT) AS n_quoted,
         max(CASE WHEN r = 1 AND c = 0 THEN val END) AS first_value
  FROM vals GROUP BY doc_id, d
),
hdr AS (
  SELECT doc_id, d,
         string_agg('col' || CAST(c.c AS VARCHAR), '/' ORDER BY c.c) AS header
  FROM d0, generate_series(0, 4) c(c)
  WHERE c.c < 2 + d % 3
  GROUP BY doc_id, d
)
SELECT a.doc_id,
       CASE WHEN a.d % 19 = 3 THEN NULL
            ELSE CASE a.d % 4 WHEN 0 THEN 'comma' WHEN 1 THEN 'semicolon'
                              WHEN 2 THEN 'tab' ELSE 'pipe' END END AS delimiter,
       CASE WHEN a.d % 19 = 3 THEN NULL
            ELSE CAST(2 + a.d % 4 AS INT) END AS n_rows,
       CASE WHEN a.d % 19 = 3 THEN NULL
            ELSE CAST(2 + a.d % 3 AS INT) END AS n_cols,
       CASE WHEN a.d % 19 = 3 THEN NULL ELSE a.n_quoted END AS n_quoted,
       CASE WHEN a.d % 19 = 3 THEN NULL
            ELSE CAST(CASE WHEN a.d % 13 = 6 THEN 1 ELSE 0 END AS INT)
            END AS n_ragged,
       CASE WHEN a.d % 19 = 3 THEN NULL ELSE h.header END AS header,
       CASE WHEN a.d % 19 = 3 THEN NULL ELSE a.first_value END AS first_value
FROM agg a JOIN hdr h USING (doc_id, d)
ORDER BY a.doc_id
"""
