"""Row-group data-skipping planner over parquet footer statistics.

The r17 all-column censuses (parquetblob / orcblob / deltalog /
iceberg) HARVEST per-column min/max statistics; this module is the
DECISION side: given a range predicate `lo <= col <= hi`, read only
the footer (~KB per file regardless of data size) and decide which
row groups a scan must touch. At lake scale this is the difference
between a 100 TB scan and the small fraction of row groups whose
[min, max] interval intersects the predicate band — the same
arithmetic Spark's parquet reader applies per row group after filter
pushdown, surfaced at MANIFEST time so a compaction / routing planner
can cost the scan before any executor opens a data page.

Semantics (conservative, like every stats-based pruner):
  - a row group with no statistics for the predicate column MUST be
    scanned — absence of evidence is not exclusion;
  - a file that does not carry the column at all must be scanned in
    full (schema evolution: an added column is NULL in old files, and
    NULL never satisfies a range predicate — but that decision
    belongs to the reader, not the pruner; `col_present` reports it);
  - a group is pruned only when max < lo or min > hi;
  - a file whose every group prunes is skipped entirely
    (`file_pruned`).

Reject-whole: a corrupt footer yields NULLs — a planner that cannot
read the manifest must quarantine the file, never guess.

Reference parity: the reference engine has no stats pruner (its
queries scan Elasticsearch indexes); this is part of the mandated
100 TB extension surface, composing C128's footer walk into the
data-skipping story the SURVEY §4 scale design claims.
"""

from __future__ import annotations

from typing import Optional

__all__ = [
    "plan_parquet_skip",
    "parquet_skip_frame",
    "parquet_skipping_plan",
    "PARQUET_SKIPPING_ORACLE",
    "C0_LO",
    "C0_HI",
]

# The roundtrip's fixed predicate band on synth_parquet's c0 column
# (values are (3*doc_id + i) % 100, so a 16-wide band prunes most
# groups of most files while leaving plenty of partial overlaps).
C0_LO = 30
C0_HI = 45


def plan_parquet_skip(
    payload: bytes, column: str, lo, hi
) -> Optional[dict]:
    """Footer-only skip plan for `lo <= column <= hi` over one blob."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not payload or len(payload) < 12 or lo > hi:
        return None
    try:
        f = pq.ParquetFile(pa.BufferReader(payload))
        md = f.metadata
        names = f.schema_arrow.names
        ci = names.index(column) if column in names else None
        n_groups = md.num_row_groups
        rows_total = 0
        rows_scanned = 0
        pruned = 0
        for g in range(n_groups):
            rg = md.row_group(g)
            nr = rg.num_rows
            rows_total += nr
            skip = False
            if ci is not None:
                st = rg.column(ci).statistics
                if st is not None and st.has_min_max:
                    skip = st.max < lo or st.min > hi
            if skip:
                pruned += 1
            else:
                rows_scanned += nr
    except Exception:
        return None
    return {
        "n_row_groups": n_groups,
        "pruned_groups": pruned,
        "scanned_groups": n_groups - pruned,
        "rows_total": rows_total,
        "rows_scanned": rows_scanned,
        "file_pruned": n_groups > 0 and pruned == n_groups,
        "col_present": ci is not None,
    }


# ---------------------------------------------------- Spark entry points

_COLS = [
    "n_row_groups",
    "pruned_groups",
    "scanned_groups",
    "rows_total",
    "rows_scanned",
    "file_pruned",
    "col_present",
]
_SCHEMA = (
    "doc_id bigint, n_row_groups int, pruned_groups int, "
    "scanned_groups int, rows_total bigint, rows_scanned bigint, "
    "file_pruned boolean, col_present boolean"
)


def parquet_skip_frame(
    df,
    column: str,
    lo,
    hi,
    id_col: str = "doc_id",
    payload_col: str = "payload",
):
    """Skip plan over any (id, parquet-binary) frame: one Arrow-batched
    narrow map, no shuffle — manifest-scale planning parallelism."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(
        df,
        lambda p: plan_parquet_skip(p, column, lo, hi),
        _COLS,
        _SCHEMA,
        id_col,
        payload_col,
    )


def parquet_skipping_plan(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc the C128 synth parquet file
    (known row-group layout, c0 = (3d+i) % 100) is planned against the
    fixed band C0_LO..C0_HI and every pruning decision restated as
    doc_id arithmetic — each row group covers a consecutive run mod
    100, so its true [min, max] (and hence the prune bit) is exact SQL."""
    from danae_spark.multimodal.docframes import synth_roundtrip
    from danae_spark.multimodal.parquetblob import synth_parquet

    return synth_roundtrip(
        spark,
        sf_dir,
        synth_parquet,
        lambda p: plan_parquet_skip(p, "c0", C0_LO, C0_HI),
        _COLS,
        _SCHEMA,
    )


# ------------------------------------------------- Delta file pruning
#
# Delta's own data-skipping mechanism: every add action may carry
# per-column minValues/maxValues in its stats JSON — the planner
# replays the live set and prunes whole FILES from the log alone,
# without opening a single parquet footer. The footer cross-check
# (stats_consistent) is the trust audit: a writer whose log stats lie
# must be flagged, because a pruned file whose real data overlaps the
# band silently drops rows from every query.

DELTA_LO = 15
DELTA_HI = 25

_LOG_DIR = "_delta_log/"


def _pq_col_minmax(payload: bytes, column: str):
    """File-level (min, max) for one column from the parquet footer;
    (None, None) when absent or stats are missing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        f = pq.ParquetFile(pa.BufferReader(payload))
        md = f.metadata
        names = f.schema_arrow.names
        if column not in names:
            return None, None
        ci = names.index(column)
        lo = hi = None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        return lo, hi
    except Exception:
        return None, None


def plan_delta_skip(payload: bytes, column: str, lo, hi) -> Optional[dict]:
    """File-granular skip plan for `lo <= column <= hi` over a
    tar-shipped Delta table, from the transaction log's own stats.

    The replay applies the same refusals as the C148 census (torn
    chain, minReaderVersion > 1, a referenced file the archive lacks
    -> None); decisions come from the LOG (that is the Delta
    contract), and `stats_consistent` reports whether every live
    file's log min/max agrees with its parquet footer."""
    import json as _json

    from danae_spark.multimodal.archive import iter_archive_members

    if lo > hi:
        return None
    commits: dict[int, bytes] = {}
    files: dict[str, bytes] = {}
    saw_log = False
    try:
        for name, is_dir, data in iter_archive_members(payload):
            if is_dir:
                continue
            if name.startswith(_LOG_DIR):
                saw_log = True
                stem = name[len(_LOG_DIR):]
                if stem.endswith(".json") and stem[:-5].isdigit():
                    commits[int(stem[:-5])] = data
                continue
            files[name] = data
    except Exception:
        return None  # a torn archive quarantines, never crashes a task
    if not saw_log or not commits:
        return None
    versions = sorted(commits)
    if versions != list(range(len(versions))):
        return None  # torn log
    live: dict[str, dict] = {}
    try:
        for v in versions:
            for ln in commits[v].decode("utf-8").splitlines():
                if not ln.strip():
                    continue
                action = _json.loads(ln)
                if "protocol" in action:
                    if int(action["protocol"]["minReaderVersion"]) > 1:
                        return None
                elif "add" in action:
                    a = action["add"]
                    st = _json.loads(a["stats"]) if a.get("stats") else {}
                    live[a["path"]] = {
                        "rows": st.get("numRecords"),
                        "min": (st.get("minValues") or {}).get(column),
                        "max": (st.get("maxValues") or {}).get(column),
                    }
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
    except (KeyError, ValueError, TypeError, UnicodeDecodeError):
        return None

    pruned = scanned = 0
    rows_total = rows_scanned = 0
    consistent = True
    for path, a in live.items():
        data = files.get(path)
        if data is None:
            return None  # the log references a file the archive lacks
        rows = int(a["rows"] or 0)
        rows_total += rows
        skip = (
            a["min"] is not None
            and a["max"] is not None
            and (a["max"] < lo or a["min"] > hi)
        )
        if skip:
            pruned += 1
        else:
            scanned += 1
            rows_scanned += rows
        # only a PRESENT log claim can lie; absent stats simply scan
        if a["min"] is not None:
            f_lo, f_hi = _pq_col_minmax(data, column)
            if f_lo is not None and (a["min"], a["max"]) != (f_lo, f_hi):
                consistent = False
    return {
        "n_live_files": len(live),
        "files_pruned": pruned,
        "files_scanned": scanned,
        "rows_total": rows_total,
        "rows_scanned": rows_scanned,
        "table_skipped": len(live) > 0 and pruned == len(live),
        "stats_consistent": consistent,
    }


_DELTA_COLS = [
    "n_live_files",
    "files_pruned",
    "files_scanned",
    "rows_total",
    "rows_scanned",
    "table_skipped",
    "stats_consistent",
]
_DELTA_SCHEMA = (
    "doc_id bigint, n_live_files int, files_pruned int, "
    "files_scanned int, rows_total bigint, rows_scanned bigint, "
    "table_skipped boolean, stats_consistent boolean"
)


def delta_skip_frame(
    df,
    column: str,
    lo,
    hi,
    id_col: str = "doc_id",
    payload_col: str = "payload",
):
    """Delta skip plan over any (id, tar-binary) frame: one narrow
    Arrow map — log-only pruning at manifest scale."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(
        df,
        lambda p: plan_delta_skip(p, column, lo, hi),
        _DELTA_COLS,
        _DELTA_SCHEMA,
        id_col,
        payload_col,
    )


def delta_skipping_plan(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc the C148 synth Delta table
    (live set {F0} + {F2..Fn}, plus F1 when the chain is 2 commits;
    c0 = (d + 3j + i) % 50 per file) is planned against the fixed band
    DELTA_LO..DELTA_HI from the log's minValues/maxValues, with the
    d % 23 == 7 lying-max leg flagged inconsistent by the footer
    cross-check."""
    from danae_spark.multimodal.deltalog import synth_delta_table
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(
        spark,
        sf_dir,
        synth_delta_table,
        lambda p: plan_delta_skip(p, "c0", DELTA_LO, DELTA_HI),
        _DELTA_COLS,
        _DELTA_SCHEMA,
    )


# Live file F_j of doc d holds rows i < 5 + (d+j) % 6 with
# c0 = (d + 3j + i) % 50, a consecutive run mod 50:
#   start = (d + 3j) % 50; no wrap: [start, start+len-1]; wrap: [0, 49]
# Live set: j = 0 and j = 2..n_commits, plus j = 1 when n_commits = 2
# (even commits v >= 2 remove F_{v-1}, i.e. only F1 ever dies).
# Decisions come from the LOG stats; the d % 23 == 7 leg lies about
# F0's max (999), so F0 never prunes there and the doc flags
# inconsistent. d % 17 == 5 (protocol) and d % 13 == 8 (torn) reject.
DELTA_SKIPPING_ORACLE = """
WITH d0 AS (
  SELECT doc_id, doc_id AS d FROM documents
  WHERE doc_id % 17 <> 5 AND doc_id % 13 <> 8
),
lf AS (
  SELECT d0.doc_id, d0.d, j.j,
         5 + (d0.d + j.j) % 6 AS glen,
         (d0.d + 3 * j.j) % 50 AS gstart
  FROM d0 JOIN generate_series(0, 5) j(j)
       ON j.j <= 2 + d0.d % 3
      AND (j.j <> 1 OR 2 + d0.d % 3 = 2)
),
ff AS (
  SELECT doc_id, d, j, glen,
         CASE WHEN gstart + glen <= 50 THEN gstart ELSE 0 END AS fmin,
         CASE WHEN d % 23 = 7 AND j = 0 THEN 999
              WHEN gstart + glen <= 50 THEN gstart + glen - 1
              ELSE 49 END AS fmax
  FROM lf
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS INT) AS n_live_files,
         CAST(SUM(CASE WHEN fmax < 15 OR fmin > 25 THEN 1 ELSE 0 END)
              AS INT) AS files_pruned,
         CAST(SUM(glen) AS BIGINT) AS rows_total,
         CAST(SUM(CASE WHEN fmax < 15 OR fmin > 25 THEN 0 ELSE glen END)
              AS BIGINT) AS rows_scanned
  FROM ff GROUP BY doc_id
)
SELECT d.doc_id,
       agg.n_live_files,
       agg.files_pruned,
       CAST(agg.n_live_files - agg.files_pruned AS INT) AS files_scanned,
       agg.rows_total,
       agg.rows_scanned,
       CASE WHEN agg.doc_id IS NULL THEN NULL
            ELSE agg.files_pruned = agg.n_live_files END AS table_skipped,
       CASE WHEN agg.doc_id IS NULL THEN NULL
            ELSE d.doc_id % 23 <> 7 END AS stats_consistent
FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id
"""


# ---------------------------------------------- Iceberg file pruning
#
# Iceberg's mechanism: every manifest entry's data_file carries
# integer-keyed lower_bounds/upper_bounds maps (field-id -> the
# single-value binary serialization). The planner resolves the
# current snapshot, walks its manifests, and prunes live files from
# the bounds alone — manifests ARE the skip index; that is why they
# exist. Footer cross-check as the trust audit, like the Delta leg.

ICE_LO = 15
ICE_HI = 25


def plan_iceberg_skip(payload: bytes, field_id: int, lo, hi) -> Optional[dict]:
    """File-granular skip plan for `lo <= field <= hi` over a
    tar-shipped Iceberg table, from the manifests' bounds maps.

    Mirrors the C151 census's refusals (unknown format-version, a
    missing manifest or data file, an unresolvable current snapshot
    -> None); bounds decode per the single-value spec (longs are
    8-byte LE); a file with no bound for the field must be scanned."""
    import json as _json
    import struct as _struct
    import zlib as _zlib

    from danae_spark.multimodal.archive import iter_archive_members
    from danae_spark.multimodal.avroblob import _Bad as _AvroBad
    from danae_spark.multimodal.iceberg import (
        _Bad,
        _ST_DELETED,
        avro_file_read,
    )

    if lo > hi:
        return None
    try:
        files: dict[str, bytes] = {}
        meta_candidates: list[str] = []
        for name, is_dir, data in iter_archive_members(payload):
            if is_dir:
                continue
            files[name] = data
            if name.startswith("metadata/") and name.endswith(".metadata.json"):
                meta_candidates.append(name)
        if not meta_candidates:
            return None
        md = _json.loads(files[max(meta_candidates)].decode("utf-8"))
        if int(md["format-version"]) not in (1, 2):
            return None
        schemas = {s["schema-id"]: s for s in md.get("schemas", [])}
        schema = schemas.get(md.get("current-schema-id"))
        if schema is None:
            return None
        col_name = next(
            (f["name"] for f in schema["fields"] if f["id"] == field_id), None
        )
        snapshots = {s["snapshot-id"]: s for s in md.get("snapshots", [])}
        cur = snapshots.get(md.get("current-snapshot-id"))
        if cur is None or cur["manifest-list"] not in files:
            return None
        r = avro_file_read(files[cur["manifest-list"]])
        if r is None:
            return None
        _mls, manifests = r
        pruned = scanned = 0
        rows_total = rows_scanned = 0
        n_live = 0
        consistent = True
        for mf in manifests:
            mdata = files.get(mf["manifest_path"])
            if mdata is None:
                return None
            mr = avro_file_read(mdata)
            if mr is None:
                return None
            _ms, entries = mr
            for e in entries:
                if e["status"] == _ST_DELETED:
                    continue
                df = e["data_file"]
                data = files.get(df["file_path"])
                if data is None:
                    return None
                n_live += 1
                rows = int(df["record_count"])
                rows_total += rows
                b_lo = b_hi = None
                for kv in df.get("lower_bounds") or []:
                    if kv["key"] == field_id and len(kv["value"]) == 8:
                        b_lo = _struct.unpack("<q", kv["value"])[0]
                for kv in df.get("upper_bounds") or []:
                    if kv["key"] == field_id and len(kv["value"]) == 8:
                        b_hi = _struct.unpack("<q", kv["value"])[0]
                skip = (
                    b_lo is not None
                    and b_hi is not None
                    and (b_hi < lo or b_lo > hi)
                )
                if skip:
                    pruned += 1
                else:
                    scanned += 1
                    rows_scanned += rows
                if b_lo is not None and col_name is not None:
                    f_lo, f_hi = _pq_col_minmax(data, col_name)
                    if f_lo is not None and (b_lo, b_hi) != (f_lo, f_hi):
                        consistent = False
    except (_Bad, _AvroBad, KeyError, ValueError, TypeError, IndexError,
            UnicodeDecodeError, _struct.error, _zlib.error):
        # the census's reject set (fuzz-pinned): a torn archive, Avro
        # container or metadata tree quarantines, never crashes a task
        return None
    return {
        "n_live_files": n_live,
        "files_pruned": pruned,
        "files_scanned": scanned,
        "rows_total": rows_total,
        "rows_scanned": rows_scanned,
        "table_skipped": n_live > 0 and pruned == n_live,
        "stats_consistent": consistent,
    }


def iceberg_skip_frame(
    df,
    field_id: int,
    lo,
    hi,
    id_col: str = "doc_id",
    payload_col: str = "payload",
):
    """Iceberg skip plan over any (id, tar-binary) frame: one narrow
    Arrow map — manifest-only pruning at metadata scale."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(
        df,
        lambda p: plan_iceberg_skip(p, field_id, lo, hi),
        _DELTA_COLS,
        _DELTA_SCHEMA,
        id_col,
        payload_col,
    )


def iceberg_skipping_plan(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc the C151 synth Iceberg
    table is planned against the fixed band ICE_LO..ICE_HI from the
    manifests' c0 bounds (field id 1): the d % 11 == 6 no-bounds leg
    scans everything, the d % 31 == 3 lying-upper leg keeps its file
    scanned and flags inconsistent (unless that entry is the d % 4
    tombstone, which ships no bounds)."""
    from danae_spark.multimodal.docframes import synth_roundtrip
    from danae_spark.multimodal.iceberg import synth_iceberg_table

    return synth_roundtrip(
        spark,
        sf_dir,
        synth_iceberg_table,
        lambda p: plan_iceberg_skip(p, 1, ICE_LO, ICE_HI),
        _DELTA_COLS,
        _DELTA_SCHEMA,
    )


# Live file (m, k) of doc d: m < 1 + d%2, k < 1 + (d+m)%3, minus the
# d%4==1 tombstone at (0,0); rows rc = 5 + (d + 3m + k) % 6 with
# c0 = (d+m+k+i) % 50 — consecutive run mod 50. Bounds truthful
# except d%31==3 lying upper 999 at (0,0); d%11==6 ships none (scan).
# d%17==2 (format-version) and d%13==4 (missing manifest) reject.
ICEBERG_SKIPPING_ORACLE = """
WITH d0 AS (
  SELECT doc_id, doc_id AS d FROM documents
  WHERE doc_id % 17 <> 2 AND doc_id % 13 <> 4
),
lf AS (
  SELECT d0.doc_id, d0.d, m.m, k.k,
         5 + (d0.d + 3 * m.m + k.k) % 6 AS glen,
         (d0.d + m.m + k.k) % 50 AS gstart
  FROM d0
  JOIN generate_series(0, 1) m(m) ON m.m < 1 + d0.d % 2
  JOIN generate_series(0, 2) k(k) ON k.k < 1 + (d0.d + m.m) % 3
  WHERE NOT (d0.d % 4 = 1 AND m.m = 0 AND k.k = 0)
),
ff AS (
  SELECT doc_id, d, glen,
         d % 11 = 6 AS nobounds,
         CASE WHEN gstart + glen <= 50 THEN gstart ELSE 0 END AS fmin,
         CASE WHEN d % 31 = 3 AND m = 0 AND k = 0 THEN 999
              WHEN gstart + glen <= 50 THEN gstart + glen - 1
              ELSE 49 END AS fmax
  FROM lf
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS INT) AS n_live_files,
         CAST(SUM(CASE WHEN NOT nobounds AND (fmax < 15 OR fmin > 25)
                       THEN 1 ELSE 0 END) AS INT) AS files_pruned,
         CAST(SUM(glen) AS BIGINT) AS rows_total,
         CAST(SUM(CASE WHEN NOT nobounds AND (fmax < 15 OR fmin > 25)
                       THEN 0 ELSE glen END) AS BIGINT) AS rows_scanned
  FROM ff GROUP BY doc_id
)
SELECT d.doc_id,
       agg.n_live_files,
       agg.files_pruned,
       CAST(agg.n_live_files - agg.files_pruned AS INT) AS files_scanned,
       agg.rows_total,
       agg.rows_scanned,
       CASE WHEN agg.doc_id IS NULL THEN NULL
            ELSE agg.files_pruned = agg.n_live_files END AS table_skipped,
       CASE WHEN agg.doc_id IS NULL THEN NULL
            ELSE NOT (d.doc_id % 31 = 3 AND d.doc_id % 11 <> 6
                      AND NOT (d.doc_id % 4 = 1))
            END AS stats_consistent
FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id
"""


# Row group g of doc d holds rows i in [g*rg, min(n, (g+1)*rg)) with
# c0 = (3d+i) % 100 — a consecutive run mod 100 of length <= 6, so:
#   start = (3d + g*rg) % 100, len = min(n - g*rg, rg)
#   no wrap (start+len <= 100): min = start, max = start+len-1
#   wrap: the run covers 99 and 0 -> min = 0, max = 99 (never pruned)
# Pruned iff max < 30 or min > 45. d % 21 == 9 is C128's reject leg.
PARQUET_SKIPPING_ORACLE = """
WITH d0 AS (SELECT doc_id, doc_id AS d FROM documents),
p AS (
  SELECT doc_id, d, 10 + d % 7 AS n, 4 + d % 3 AS rg
  FROM d0 WHERE d % 21 <> 9
),
g AS (
  SELECT p.doc_id,
         least(p.n - gs.g * p.rg, p.rg) AS glen,
         (3 * p.d + gs.g * p.rg) % 100 AS gstart
  FROM p JOIN generate_series(0, 3) gs(g) ON gs.g * p.rg < p.n
),
gg AS (
  SELECT doc_id, glen,
         CASE WHEN gstart + glen <= 100 THEN gstart ELSE 0 END AS gmin,
         CASE WHEN gstart + glen <= 100 THEN gstart + glen - 1
              ELSE 99 END AS gmax
  FROM g
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS INT) AS n_row_groups,
         CAST(SUM(CASE WHEN gmax < 30 OR gmin > 45 THEN 1 ELSE 0 END)
              AS INT) AS pruned_groups,
         CAST(SUM(glen) AS BIGINT) AS rows_total,
         CAST(SUM(CASE WHEN gmax < 30 OR gmin > 45 THEN 0 ELSE glen END)
              AS BIGINT) AS rows_scanned
  FROM gg GROUP BY doc_id
)
SELECT d0.doc_id,
       agg.n_row_groups,
       agg.pruned_groups,
       CAST(agg.n_row_groups - agg.pruned_groups AS INT) AS scanned_groups,
       agg.rows_total,
       agg.rows_scanned,
       CASE WHEN agg.doc_id IS NULL THEN NULL
            ELSE agg.pruned_groups = agg.n_row_groups END AS file_pruned,
       CASE WHEN agg.doc_id IS NULL THEN NULL
            ELSE TRUE END AS col_present
FROM d0 LEFT JOIN agg USING (doc_id) ORDER BY d0.doc_id
"""
