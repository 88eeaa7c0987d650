"""Per-blob SQLite census — the database files a lake accumulates.

Application exports, scraped app data, and telemetry frequently land
as whole SQLite files; before deciding what to extract you want each
blob's schema shape. Parsing uses the stdlib `sqlite3` engine over an
in-memory deserialize (Python 3.11+) — the canonical implementation
of the format — and the census walks `sqlite_master` plus per-table
COUNTs (metadata + O(rows) counting, no content is shipped).

Safety: blobs open read-only in a throwaway in-memory connection with
a statement budget — only `sqlite_master` and COUNT(*) per table are
ever executed, never content queries, and `query_only` is set so a
malicious blob cannot write anywhere.

Reject-whole: anything the engine refuses to deserialize (bad magic,
truncated pages) yields None.
"""

from __future__ import annotations

import sqlite3
from typing import Optional

__all__ = [
    "parse_sqlite_blob",
    "synth_sqlite",
    "sqlite_census_frame",
    "sqlite_census_roundtrip",
    "SQLITE_CENSUS_ORACLE",
]


# Statement budget: one COUNT(*) per table, at most _MAX_TABLES tables
# (reject-whole past that — a million-table blob is hostile, not data),
# and a VM-instruction budget enforced by a progress handler so a
# pathological page layout cannot spin a COUNT forever.
_MAX_TABLES = 4096
_VM_OPS_BUDGET = 50_000_000
_PROGRESS_EVERY = 10_000


def parse_sqlite_blob(payload: bytes) -> Optional[dict]:
    if not payload or not payload.startswith(b"SQLite format 3\x00"):
        return None
    conn = sqlite3.connect(":memory:")
    try:
        conn.deserialize(payload)
        conn.execute("PRAGMA query_only = ON")
        remaining = [_VM_OPS_BUDGET // _PROGRESS_EVERY]

        def _tick() -> int:
            remaining[0] -= 1
            return 1 if remaining[0] < 0 else 0

        conn.set_progress_handler(_tick, _PROGRESS_EVERY)
        tables = [
            r[0]
            for r in conn.execute(
                "SELECT name FROM sqlite_master WHERE type='table' "
                "AND name NOT LIKE 'sqlite_%' ORDER BY name"
            )
        ]
        if len(tables) > _MAX_TABLES:
            return None
        n_indexes = conn.execute(
            "SELECT count(*) FROM sqlite_master WHERE type='index'"
        ).fetchone()[0]
        total_rows = 0
        n_cols_first = None
        for i, t in enumerate(tables):
            total_rows += conn.execute(
                f'SELECT count(*) FROM "{t}"'
            ).fetchone()[0]
            if i == 0:
                n_cols_first = len(
                    conn.execute(f'PRAGMA table_info("{t}")').fetchall()
                )
    except sqlite3.Error:
        return None
    finally:
        conn.close()
    return {
        "n_tables": len(tables),
        "tables": "/".join(tables),
        "n_indexes": n_indexes,
        "total_rows": total_rows,
        "first_table_cols": n_cols_first,
    }


# ----------------------------------------------------------- synthesis
#
# Arithmetic shape (restated in SQLITE_CENSUS_ORACLE):
#   n_tables = 1 + d % 3 (t0, t1, t2); table k has 2 + (d + k) % 2
#   columns and 3 + (d * 5 + k) % 6 rows; one index on t0 when
#   d % 2 == 0; d % 27 == 11 -> header page corrupted (reject leg)


def sq_n_tables(d: int) -> int:
    return 1 + d % 3


def sq_rows(d: int, k: int) -> int:
    return 3 + (d * 5 + k) % 6


def sq_cols(d: int, k: int) -> int:
    return 2 + (d + k) % 2


def synth_sqlite(d: int) -> bytes:
    conn = sqlite3.connect(":memory:")
    for k in range(sq_n_tables(d)):
        cols = ", ".join(f"c{c} INTEGER" for c in range(sq_cols(d, k)))
        conn.execute(f"CREATE TABLE t{k}({cols})")
        for r in range(sq_rows(d, k)):
            vals = ", ".join(
                str((d + k + r + c) % 50) for c in range(sq_cols(d, k))
            )
            conn.execute(f"INSERT INTO t{k} VALUES ({vals})")
    if d % 2 == 0:
        conn.execute("CREATE INDEX ix0 ON t0(c0)")
    conn.commit()
    raw = bytearray(conn.serialize())
    conn.close()
    if d % 27 == 11:
        raw[0] ^= 0xFF  # corrupt the magic
    return bytes(raw)


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, n_tables int, tables string, n_indexes int, "
    "total_rows int, first_table_cols int"
)
_COLS = ["n_tables", "tables", "n_indexes", "total_rows", "first_table_cols"]


def sqlite_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """SQLite census over any (id, binary) frame: one Arrow-batched
    narrow map, no shuffle (multimodal/docframes.py)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(
        df, parse_sqlite_blob, _COLS, _SCHEMA, id_col, payload_col
    )


def sqlite_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real SQLite database
    (1-3 tables of varying width/length, an index leg, a
    corrupted-magic reject leg) is serialized in memory, re-opened
    read-only, and the schema census restated as doc_id arithmetic."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(
        spark, sf_dir, synth_sqlite, parse_sqlite_blob, _COLS, _SCHEMA
    )


SQLITE_CENSUS_ORACLE = """
WITH d0 AS (SELECT doc_id, doc_id AS d FROM documents),
tabs AS (
  SELECT doc_id, d, k.k,
         3 + (d * 5 + k.k) % 6 AS n_rows
  FROM d0, generate_series(0, 2) k(k)
  WHERE k.k < 1 + d % 3
),
agg AS (
  SELECT doc_id, d,
         CAST(count(*) AS INT) AS n_tables,
         string_agg('t' || CAST(k AS VARCHAR), '/' ORDER BY k) AS tables,
         CAST(sum(n_rows) AS INT) AS total_rows
  FROM tabs GROUP BY doc_id, d
)
SELECT doc_id,
       CASE WHEN d % 27 = 11 THEN NULL ELSE n_tables END AS n_tables,
       CASE WHEN d % 27 = 11 THEN NULL ELSE tables END AS tables,
       CASE WHEN d % 27 = 11 THEN NULL
            ELSE CAST(CASE WHEN d % 2 = 0 THEN 1 ELSE 0 END AS INT)
            END AS n_indexes,
       CASE WHEN d % 27 = 11 THEN NULL ELSE total_rows END AS total_rows,
       CASE WHEN d % 27 = 11 THEN NULL
            ELSE CAST(2 + d % 2 AS INT) END AS first_table_cols
FROM agg ORDER BY doc_id
"""
