"""Apache Hudi copy-on-write table census — the third lake format.

Completes the lake-native metadata family (C148 Delta, C151 Iceberg):
a Hudi table is a directory with a `.hoodie/` timeline —
`hoodie.properties` (java-properties table config) plus one file per
instant: `<ts>.commit` (a completed write, JSON write-stats),
`<ts>.inflight` / `<ts>.commit.requested` (in-progress, carrying no
committed data) — and base parquet files named
`<fileId>_<writeToken>_<instantTime>.parquet`. A reader resolves, per
file group (fileId), the LATEST completed slice; older slices still
on disk before cleaning must be excluded (the Delta-tombstone
analogue — a glob reader double-counts them).

The census replays the timeline per the public spec and cross-checks
the metadata against the data plane exactly like its two siblings:
every live slice's `fileSizeInBytes` must equal the member's bytes
and its `numWrites` the parquet footer's row count (via the C128
footer walk) — timeline → footer, end-to-end.

Reject-whole: a missing `hoodie.properties`, a MERGE_ON_READ table
(log-file merging is a different read path this census does not
claim), an unparseable commit JSON, or a live slice whose data file
the archive lacks. Inflight instants are COUNTED, never read.

Reference parity note: the reference engine (SURVEY §1) has no lake
metadata handling; extension surface like multimodal/deltalog.py.
"""

from __future__ import annotations

import json
import re
from typing import Optional

__all__ = [
    "parse_hudi_table",
    "synth_hudi_table",
    "hudi_census_frame",
    "hudi_census_roundtrip",
    "HUDI_CENSUS_ORACLE",
]

_HOODIE = ".hoodie/"
_COMMIT_RE = re.compile(r"^(\d{14})\.commit$")
_INFLIGHT_RE = re.compile(r"^(\d{14})\.(inflight|commit\.requested)$")
_BASE_RE = re.compile(r"^([\w-]+)_(\d+-\d+-\d+)_(\d{14})\.parquet$")


def _parse_properties(text: str) -> dict:
    props = {}
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        if "=" not in ln:
            raise ValueError("not a properties line")
        k, v = ln.split("=", 1)
        props[k.strip()] = v.strip()
    return props


def parse_hudi_table(payload: bytes) -> Optional[dict]:
    """One census row for a tar-shipped Hudi table, or None."""
    from danae_spark.multimodal.archive import iter_archive_members
    from danae_spark.multimodal.parquetblob import parse_parquet_blob

    try:
        files: dict[str, bytes] = {}
        for name, is_dir, data in iter_archive_members(payload):
            if not is_dir:
                files[name] = data
    except Exception:
        return None
    props_raw = files.get(_HOODIE + "hoodie.properties")
    if props_raw is None:
        return None
    try:
        props = _parse_properties(props_raw.decode("utf-8"))
    except (ValueError, UnicodeDecodeError):
        return None
    ttype = props.get("hoodie.table.type")
    if ttype != "COPY_ON_WRITE":
        return None  # MOR log merging is a read path this census lacks
    table_name = props.get("hoodie.table.name")
    if not table_name:
        return None

    commits: list[tuple[str, bytes]] = []
    n_inflight = 0
    for name, data in files.items():
        if not name.startswith(_HOODIE):
            continue
        stem = name[len(_HOODIE):]
        m = _COMMIT_RE.match(stem)
        if m:
            commits.append((m.group(1), data))
        elif _INFLIGHT_RE.match(stem):
            n_inflight += 1
    if not commits:
        return None  # a table with no completed instant has no data

    # replay in instant order: per file group, the latest slice wins
    live: dict[str, dict] = {}
    try:
        for ts, data in sorted(commits):
            doc = json.loads(data.decode("utf-8"))
            for _part, stats in doc["partitionToWriteStats"].items():
                for st in stats:
                    live[st["fileId"]] = {
                        "path": st["path"],
                        "rows": int(st["numWrites"]),
                        "size": int(st["fileSizeInBytes"]),
                        "ts": ts,
                    }
    except (KeyError, TypeError, ValueError, UnicodeDecodeError):
        return None

    sizes_ok = footers_ok = True
    live_rows = 0
    for fid, sl in live.items():
        data = files.get(sl["path"])
        if data is None:
            return None  # the timeline references a file the tar lacks
        m = _BASE_RE.match(sl["path"].rsplit("/", 1)[-1])
        if m is None or m.group(1) != fid or m.group(3) != sl["ts"]:
            return None  # base-file naming must agree with the stats
        if len(data) != sl["size"]:
            sizes_ok = False
        footer = parse_parquet_blob(data)
        if footer is None or footer["n_rows"] != sl["rows"]:
            footers_ok = False
        live_rows += sl["rows"]

    return {
        "table_name": table_name,
        "n_commits": len(commits),
        "n_inflight": n_inflight,
        "n_file_groups": len(live),
        "live_rows": live_rows,
        "sizes_consistent": sizes_ok,
        "footers_consistent": footers_ok,
    }


# ------------------------------------------------------------- synthesis
#
# Grid (restated in HUDI_CENSUS_ORACLE):
#   commits  C = 2 + d % 3 at instants ts_c; commit c creates file
#            group f{c} (rows 5 + (d + c) % 6) and, for odd c >= 1,
#            REWRITES group f0 (rows 5 + (d + c + 1) % 6) — the old f0
#            slice stays on disk (pre-clean), so a glob reader
#            double-counts exactly what the census must exclude
#   inflight d % 4 == 1 adds one inflight instant (counted, no data)
#   rejects  d % 17 == 6 MERGE_ON_READ type; d % 13 == 10 f0's
#            WINNING slice's data file missing (a dead slice's absence
#            is legal: cleaning took it)
#   flag     d % 23 == 17: f0's final slice lies about fileSizeInBytes
#            (sizes_consistent = false; footers stay consistent)


def hudi_n_commits(d: int) -> int:
    return 2 + d % 3


def hudi_rows(d: int, c: int, rewrite: bool) -> int:
    return 5 + (d + c + (1 if rewrite else 0)) % 6


def _hudi_data_file(d: int, c: int, rewrite: bool) -> bytes:
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = hudi_rows(d, c, rewrite)
    cols = {
        "c0": pa.array([(d + c * 3 + i) % 50 for i in range(n)], pa.int64()),
        "c1": pa.array([f"v{(d + i) % 4}" for i in range(n)]),
    }
    buf = io.BytesIO()
    pq.write_table(pa.table(cols), buf, compression="snappy")
    return buf.getvalue()


def synth_hudi_table(d: int) -> bytes:
    from danae_spark.multimodal.archive import _tar_build

    files: dict[str, bytes] = {}
    files[_HOODIE + "hoodie.properties"] = (
        "#Hudi table config\n"
        f"hoodie.table.name=tbl_{d}\n"
        "hoodie.table.type="
        + ("MERGE_ON_READ" if d % 17 == 6 else "COPY_ON_WRITE")
        + "\nhoodie.table.version=6\n"
        "hoodie.timeline.layout.version=1\n"
    ).encode("utf-8")

    nc = hudi_n_commits(d)
    cw = 3 if nc == 4 else 1  # f0's winning (last odd) commit
    for c in range(nc):
        ts = f"{20240101000000 + c:014d}"
        stats = []

        def slice_for(fid_c: int, rewrite: bool) -> None:
            blob = _hudi_data_file(d, fid_c if not rewrite else c, rewrite)
            path = f"part/f{fid_c}_0-{c}-1_{ts}.parquet"
            if not (d % 13 == 10 and fid_c == 0 and rewrite and c == cw):
                # the d%13 leg removes f0's WINNING slice (a dead
                # slice's absence is legal — cleaning took it)
                files[path] = blob
            size = len(blob)
            if d % 23 == 17 and fid_c == 0 and rewrite and c == cw:
                size += 7  # the lying-size flag leg
            stats.append({
                "fileId": f"f{fid_c}",
                "path": path,
                "prevCommit": "null" if c == 0 else f"{20240101000000 + c - 1:014d}",
                "numWrites": hudi_rows(d, fid_c if not rewrite else c, rewrite),
                "numDeletes": 0,
                "totalWriteBytes": size,
                "fileSizeInBytes": size,
            })

        slice_for(c, False)
        if c >= 1 and c % 2 == 1:
            slice_for(0, True)
        commit = {
            "partitionToWriteStats": {"part": stats},
            "compacted": False,
            "operation": "upsert" if c else "bulk_insert",
        }
        files[_HOODIE + f"{ts}.commit"] = json.dumps(commit).encode("utf-8")
    if d % 4 == 1:
        ts = f"{20240101000000 + nc:014d}"
        files[_HOODIE + f"{ts}.inflight"] = b""

    entries: list[tuple[str, bytes | None]] = [(".hoodie/", None), ("part/", None)]
    entries += sorted(files.items())
    return _tar_build(entries)


# Live set per the replay: group f{c} for c in 0..C-1, where f0's
# winning slice is the LAST odd commit (if any) and every other group's
# its creating commit. live_rows: f0 contributes 5 + (d + c_w + 1) % 6
# with c_w = the last odd commit < C (or 5 + d % 6 if none);
# group c >= 1 contributes 5 + (d + c) % 6.
HUDI_CENSUS_ORACLE = """
WITH d0 AS (
  SELECT doc_id, doc_id AS d FROM documents
  WHERE doc_id % 17 <> 6 AND doc_id % 13 <> 10
),
grp AS (
  SELECT d0.doc_id, d0.d, c.c,
         CASE WHEN c.c = 0 THEN
           CASE WHEN 2 + d0.d % 3 >= 4 THEN 5 + (d0.d + 3 + 1) % 6
                WHEN 2 + d0.d % 3 >= 2 THEN 5 + (d0.d + 1 + 1) % 6
                ELSE 5 + d0.d % 6 END
         ELSE 5 + (d0.d + c.c) % 6 END AS live_rows
  FROM d0 JOIN generate_series(0, 4) c(c) ON c.c < 2 + d0.d % 3
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS INT) AS n_file_groups,
         CAST(SUM(live_rows) AS BIGINT) AS live_rows
  FROM grp GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN d0.doc_id IS NULL THEN NULL
            ELSE 'tbl_' || CAST(d.doc_id AS VARCHAR) END AS table_name,
       CAST(CASE WHEN d0.doc_id IS NULL THEN NULL
            ELSE 2 + d.doc_id % 3 END AS INT) AS n_commits,
       CAST(CASE WHEN d0.doc_id IS NULL THEN NULL
            WHEN d.doc_id % 4 = 1 THEN 1 ELSE 0 END AS INT) AS n_inflight,
       agg.n_file_groups,
       agg.live_rows,
       CASE WHEN d0.doc_id IS NULL THEN NULL
            ELSE d.doc_id % 23 <> 17 END AS sizes_consistent,
       CASE WHEN d0.doc_id IS NULL THEN NULL
            ELSE TRUE END AS footers_consistent
FROM documents d
LEFT JOIN d0 USING (doc_id)
LEFT JOIN agg USING (doc_id)
ORDER BY d.doc_id
"""

_COLS = ["table_name", "n_commits", "n_inflight", "n_file_groups",
         "live_rows", "sizes_consistent", "footers_consistent"]
_SCHEMA = (
    "doc_id bigint, table_name string, n_commits int, n_inflight int, "
    "n_file_groups int, live_rows bigint, "
    "sizes_consistent boolean, footers_consistent boolean"
)


def hudi_census_frame(df, id_col="doc_id", payload_col="payload"):
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_hudi_table, _COLS, _SCHEMA,
                              id_col, payload_col)


def hudi_census_roundtrip(spark, sf_dir: str):
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_hudi_table,
                           parse_hudi_table, _COLS, _SCHEMA)
