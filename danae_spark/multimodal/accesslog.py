"""Per-blob web access-log census — Common/Combined Log Format.

Web server logs are a first-class lake source (traffic analytics,
crawl seeding, abuse triage). Each blob is a line stream in CLF
(`host ident user [time] "METHOD path HTTP/x" status bytes`) or the
Combined variant (+ quoted referer and user-agent). The census is
what a triage pass needs: request count, status-class mix, distinct
hosts, byte volume — and the malformed-line count REPORTED (real
logs carry junk lines; silently skipping them would misstate
volume, and rejecting whole would discard gigabytes for one torn
line — unlike the single-document formats, the line-stream contract
is per-line with visible accounting).

Reject-whole only for blob-level corruption: invalid UTF-8 or a
binary payload.
"""

from __future__ import annotations

import re
from typing import Optional

__all__ = [
    "parse_access_log",
    "synth_access_log",
    "access_log_census_frame",
    "access_log_census_roundtrip",
    "ACCESS_LOG_CENSUS_ORACLE",
]

_CLF_RE = re.compile(
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "([A-Z]+) (\S+) HTTP/[0-9.]+" '
    r"(\d{3}) (\d+|-)"
    r'( "([^"]*)" "([^"]*)")?\s*$'
)


def parse_access_log(payload: bytes) -> Optional[dict]:
    from danae_spark.multimodal.htmltext import _looks_binary

    if not payload or _looks_binary(payload):
        return None
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        return None
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if not lines:
        return None
    n_parsed = n_malformed = 0
    classes = {"2": 0, "3": 0, "4": 0, "5": 0}
    hosts = set()
    total_bytes = 0
    first_host = None
    n_combined = 0
    for ln in lines:
        m = _CLF_RE.match(ln)
        if not m:
            n_malformed += 1
            continue
        n_parsed += 1
        host, status, nbytes = m.group(1), m.group(7), m.group(8)
        hosts.add(host)
        if first_host is None:
            first_host = host
        cls = status[0]
        if cls in classes:
            classes[cls] += 1
        if nbytes != "-":
            total_bytes += int(nbytes)
        if m.group(9):
            n_combined += 1
    if n_parsed == 0:
        return None  # not a log at all
    return {
        "n_requests": n_parsed,
        "n_malformed": n_malformed,
        "n_2xx": classes["2"],
        "n_3xx": classes["3"],
        "n_4xx": classes["4"],
        "n_5xx": classes["5"],
        "n_hosts": len(hosts),
        "total_bytes": total_bytes,
        "n_combined": n_combined,
        "first_host": first_host,
    }


# ----------------------------------------------------------- synthesis
#
# Arithmetic shape (restated in ACCESS_LOG_CENSUS_ORACLE):
#   n_lines = 6 + d % 5; line i:
#     malformed junk when (d + i) % 11 == 6
#     else host 'h{(d+i)%7}.ex', method GET (POST when (d+i)%4 == 1),
#          path '/p{(d*3+i)%40}', status [200,200,301,404,500][(d+i)%5],
#          bytes (d*13 + i*7) % 1000; Combined fields on odd d
#   d % 25 == 13 -> invalid UTF-8 (reject leg)

_STATUSES = [200, 200, 301, 404, 500]


def log_n_lines(d: int) -> int:
    return 6 + d % 5


def synth_access_log(d: int) -> bytes:
    lines = []
    for i in range(log_n_lines(d)):
        if (d + i) % 11 == 6:
            lines.append(f"## rotated marker {d}-{i} not a request")
            continue
        host = f"h{(d + i) % 7}.ex"
        method = "POST" if (d + i) % 4 == 1 else "GET"
        path = f"/p{(d * 3 + i) % 40}"
        status = _STATUSES[(d + i) % 5]
        nbytes = (d * 13 + i * 7) % 1000
        base = (
            f'{host} - u{d % 4} [10/Oct/2025:13:55:{i % 60:02d} +0000] '
            f'"{method} {path} HTTP/1.1" {status} {nbytes}'
        )
        if d % 2 == 1:
            base += f' "https://ref.ex/{d}" "bot/{(d + i) % 3}"'
        lines.append(base)
    raw = ("\n".join(lines) + "\n").encode()
    if d % 25 == 13:
        return raw + b"\xff\xfe"
    return raw


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, n_requests int, n_malformed int, n_2xx int, n_3xx int, "
    "n_4xx int, n_5xx int, n_hosts int, total_bytes bigint, n_combined int, "
    "first_host string"
)
_COLS = [
    "n_requests",
    "n_malformed",
    "n_2xx",
    "n_3xx",
    "n_4xx",
    "n_5xx",
    "n_hosts",
    "total_bytes",
    "n_combined",
    "first_host",
]


def access_log_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Access-log census over any (id, binary) frame: one
    Arrow-batched narrow map, no shuffle (multimodal/docframes.py)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(
        df, parse_access_log, _COLS, _SCHEMA, id_col, payload_col
    )


def access_log_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real CLF / Combined log
    (status mix, junk-line accounting, an invalid-UTF-8 reject leg)
    is synthesized, parsed line-wise, and the census restated as
    doc_id arithmetic."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(
        spark, sf_dir, synth_access_log, parse_access_log, _COLS, _SCHEMA
    )


ACCESS_LOG_CENSUS_ORACLE = """
WITH d0 AS (SELECT doc_id, doc_id AS d FROM documents),
lines AS (
  SELECT doc_id, d, i.i,
         CAST((d + i.i) % 11 = 6 AS INT) AS malformed,
         (d + i.i) % 7 AS host_k,
         CASE (d + i.i) % 5 WHEN 0 THEN 200 WHEN 1 THEN 200
              WHEN 2 THEN 301 WHEN 3 THEN 404 ELSE 500 END AS status,
         (d * 13 + i.i * 7) % 1000 AS nbytes
  FROM d0, generate_series(0, 10) i(i)
  WHERE i.i < 6 + d % 5
),
agg AS (
  SELECT doc_id, d,
         CAST(count(*) FILTER (WHERE malformed = 0) AS INT) AS n_requests,
         CAST(count(*) FILTER (WHERE malformed = 1) AS INT) AS n_malformed,
         CAST(count(*) FILTER (WHERE malformed = 0 AND status BETWEEN 200 AND 299) AS INT) AS n_2xx,
         CAST(count(*) FILTER (WHERE malformed = 0 AND status BETWEEN 300 AND 399) AS INT) AS n_3xx,
         CAST(count(*) FILTER (WHERE malformed = 0 AND status BETWEEN 400 AND 499) AS INT) AS n_4xx,
         CAST(count(*) FILTER (WHERE malformed = 0 AND status BETWEEN 500 AND 599) AS INT) AS n_5xx,
         CAST(count(DISTINCT CASE WHEN malformed = 0 THEN host_k END) AS INT) AS n_hosts,
         CAST(sum(CASE WHEN malformed = 0 THEN nbytes ELSE 0 END) AS BIGINT) AS total_bytes,
         min(CASE WHEN malformed = 0 THEN i END) AS first_i
  FROM lines GROUP BY doc_id, d
)
SELECT doc_id,
       CASE WHEN d % 25 = 13 THEN NULL ELSE n_requests END AS n_requests,
       CASE WHEN d % 25 = 13 THEN NULL ELSE n_malformed END AS n_malformed,
       CASE WHEN d % 25 = 13 THEN NULL ELSE n_2xx END AS n_2xx,
       CASE WHEN d % 25 = 13 THEN NULL ELSE n_3xx END AS n_3xx,
       CASE WHEN d % 25 = 13 THEN NULL ELSE n_4xx END AS n_4xx,
       CASE WHEN d % 25 = 13 THEN NULL ELSE n_5xx END AS n_5xx,
       CASE WHEN d % 25 = 13 THEN NULL ELSE n_hosts END AS n_hosts,
       CASE WHEN d % 25 = 13 THEN NULL ELSE total_bytes END AS total_bytes,
       CASE WHEN d % 25 = 13 THEN NULL
            ELSE CAST(CASE WHEN d % 2 = 1 THEN n_requests ELSE 0 END AS INT)
            END AS n_combined,
       CASE WHEN d % 25 = 13 THEN NULL
            ELSE 'h' || CAST((d + first_i) % 7 AS VARCHAR) || '.ex'
            END AS first_host
FROM agg ORDER BY doc_id
"""
