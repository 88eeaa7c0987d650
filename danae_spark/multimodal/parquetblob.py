"""Per-blob Parquet census — footer metadata without reading data.

A lake manifest lists parquet blobs; the census a compaction or
ingest planner needs (rows, columns, row groups, compression,
per-group row spread) lives entirely in the footer, so the right
plan reads ~KB per file no matter how many GB the data pages are.
Parsing uses pyarrow's ParquetFile over an in-memory buffer — the
canonical implementation of the format (pyarrow ships with Spark's
Python environment); the census is the engine's own walk over its
metadata object.

Reject-whole: a truncated or magic-corrupted footer yields None.
"""

from __future__ import annotations

import io
from typing import Optional

__all__ = [
    "parse_parquet_blob",
    "synth_parquet",
    "parquet_census_frame",
    "parquet_census_roundtrip",
    "PARQUET_CENSUS_ORACLE",
]


def _fmt_stat(v) -> str:
    """Canonical text form for a min/max statistic of any column type —
    ints as decimal, floats as repr (so '0.0' not '0'), strings as-is."""
    if v is None:
        return "NULL"
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, float):
        return repr(v)
    return str(v)


def parse_parquet_blob(payload: bytes) -> Optional[dict]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not payload or len(payload) < 12:
        return None
    try:
        f = pq.ParquetFile(pa.BufferReader(payload))
        md = f.metadata
        n_row_groups = md.num_row_groups
        first_rows = md.row_group(0).num_rows if n_row_groups else 0
        compression = (
            md.row_group(0).column(0).compression if n_row_groups else None
        )
        names = f.schema_arrow.names
        # r16 (widened r17 to ALL columns): per-row-group column
        # statistics from the same footer — the data-skipping
        # selectivity input (the ORC C136 treatment, here through the
        # canonical reader's metadata object): file min/max/null-count
        # per column aggregated over the row groups that carry stats
        n_cols = md.num_columns
        mins: list = [None] * n_cols
        maxs: list = [None] * n_cols
        nulls: list = [None] * n_cols
        stats_groups = 0
        for g in range(n_row_groups):
            rg = md.row_group(g)
            any_stats = False
            for c in range(n_cols):
                st = rg.column(c).statistics
                if st is None or not st.has_min_max:
                    continue
                any_stats = True
                mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
                nulls[c] = (nulls[c] or 0) + (st.null_count or 0)
            stats_groups += 1 if any_stats else 0
    except Exception:
        return None
    return {
        "n_rows": md.num_rows,
        "n_cols": n_cols,
        "n_row_groups": n_row_groups,
        "first_group_rows": first_rows,
        "compression": compression,
        "columns": "/".join(names),
        "c0_min": mins[0] if n_cols else None,
        "c0_max": maxs[0] if n_cols else None,
        "c0_nulls": nulls[0] if n_cols else None,
        "stats_groups": stats_groups,
        "stat_mins": ";".join(
            f"{n}={_fmt_stat(v)}" for n, v in zip(names, mins)
        ),
        "stat_maxs": ";".join(
            f"{n}={_fmt_stat(v)}" for n, v in zip(names, maxs)
        ),
        "stat_nulls": ";".join(
            f"{n}={_fmt_stat(v)}" for n, v in zip(names, nulls)
        ),
    }


# ----------------------------------------------------------- synthesis
#
# Arithmetic shape (restated in PARQUET_CENSUS_ORACLE):
#   n_cols = 2 + d % 2 (c0 int64, c1 string, + c2 double on odd)
#   n_rows = 10 + d % 7 ; row_group_size = 4 + d % 3
#   n_row_groups = ceil(n_rows / rg); first group has rg rows
#   compression = [SNAPPY, GZIP, UNCOMPRESSED][d % 3]
#   d % 21 == 9 -> footer magic corrupted (reject leg)


def pq_n_rows(d: int) -> int:
    return 10 + d % 7


def pq_n_cols(d: int) -> int:
    return 2 + d % 2


def pq_rg(d: int) -> int:
    return 4 + d % 3


def synth_parquet(d: int) -> bytes:
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = pq_n_rows(d)
    cols = {"c0": pa.array([(d * 3 + i) % 100 for i in range(n)], pa.int64())}
    if pq_n_cols(d) >= 2:
        cols["c1"] = pa.array([f"s{(d + i) % 9}" for i in range(n)])
    if pq_n_cols(d) >= 3:
        cols["c2"] = pa.array([float((d + i) % 5) for i in range(n)])
    table = pa.table(cols)
    buf = io.BytesIO()
    codec = ["snappy", "gzip", "none"][d % 3]
    pq.write_table(table, buf, row_group_size=pq_rg(d), compression=codec)
    raw = bytearray(buf.getvalue())
    if d % 21 == 9:
        raw[-1] ^= 0xFF  # corrupt the trailing magic
    return bytes(raw)


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, n_rows int, n_cols int, n_row_groups int, "
    "first_group_rows int, compression string, columns string, "
    "c0_min bigint, c0_max bigint, c0_nulls bigint, stats_groups int, "
    "stat_mins string, stat_maxs string, stat_nulls string"
)
_COLS = [
    "n_rows",
    "n_cols",
    "n_row_groups",
    "first_group_rows",
    "compression",
    "columns",
    "c0_min",
    "c0_max",
    "c0_nulls",
    "stats_groups",
    "stat_mins",
    "stat_maxs",
    "stat_nulls",
]


def parquet_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Parquet footer census over any (id, binary) frame: one
    Arrow-batched narrow map, no shuffle (multimodal/docframes.py)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(
        df, parse_parquet_blob, _COLS, _SCHEMA, id_col, payload_col
    )


def parquet_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real parquet file
    (typed columns, sized row groups, three codecs, a corrupted-magic
    reject leg) is written in memory, its footer walked, and the
    census restated as doc_id arithmetic."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(
        spark, sf_dir, synth_parquet, parse_parquet_blob, _COLS, _SCHEMA
    )


PARQUET_CENSUS_ORACLE = """
WITH d0 AS (SELECT doc_id, doc_id AS d FROM documents),
c0 AS (
  SELECT d0.doc_id,
         CAST(min((3 * d0.d + i.i) % 100) AS BIGINT) AS c0_min,
         CAST(max((3 * d0.d + i.i) % 100) AS BIGINT) AS c0_max
  FROM d0 JOIN generate_series(0, 16) i(i) ON i.i < 10 + d0.d % 7
  WHERE d0.d % 21 <> 9
  GROUP BY d0.doc_id
)
SELECT doc_id,
       CASE WHEN d % 21 = 9 THEN NULL
            ELSE CAST(10 + d % 7 AS INT) END AS n_rows,
       CASE WHEN d % 21 = 9 THEN NULL
            ELSE CAST(2 + d % 2 AS INT) END AS n_cols,
       CASE WHEN d % 21 = 9 THEN NULL
            ELSE CAST((10 + d % 7 + (4 + d % 3) - 1) // (4 + d % 3) AS INT)
            END AS n_row_groups,
       CASE WHEN d % 21 = 9 THEN NULL
            ELSE CAST(4 + d % 3 AS INT) END AS first_group_rows,
       CASE WHEN d % 21 = 9 THEN NULL
            ELSE CASE d % 3 WHEN 0 THEN 'SNAPPY' WHEN 1 THEN 'GZIP'
                 ELSE 'UNCOMPRESSED' END END AS compression,
       CASE WHEN d % 21 = 9 THEN NULL
            WHEN d % 2 = 0 THEN 'c0/c1' ELSE 'c0/c1/c2' END AS columns,
       c0.c0_min, c0.c0_max,
       CAST(CASE WHEN d % 21 = 9 THEN NULL ELSE 0 END AS BIGINT) AS c0_nulls,
       CASE WHEN d % 21 = 9 THEN NULL
            ELSE CAST((10 + d % 7 + (4 + d % 3) - 1) // (4 + d % 3) AS INT)
            END AS stats_groups,
       -- r17: all-column stats (c1 strings cover all of s0..s8 and c2
       -- doubles all of 0.0..4.0 because n_rows >= 10 > both moduli)
       -- c2 min is -0.0, not 0.0: parquet-cpp conservatively widens a
       -- double min of +0.0 to -0.0 under the sign-aware total order
       CASE WHEN d % 21 = 9 THEN NULL
            ELSE 'c0=' || CAST(c0.c0_min AS VARCHAR) || ';c1=s0'
                 || CASE WHEN d % 2 = 1 THEN ';c2=-0.0' ELSE '' END
            END AS stat_mins,
       CASE WHEN d % 21 = 9 THEN NULL
            ELSE 'c0=' || CAST(c0.c0_max AS VARCHAR) || ';c1=s8'
                 || CASE WHEN d % 2 = 1 THEN ';c2=4.0' ELSE '' END
            END AS stat_maxs,
       CASE WHEN d % 21 = 9 THEN NULL
            ELSE 'c0=0;c1=0'
                 || CASE WHEN d % 2 = 1 THEN ';c2=0' ELSE '' END
            END AS stat_nulls
FROM d0 LEFT JOIN c0 USING (doc_id) ORDER BY doc_id
"""
