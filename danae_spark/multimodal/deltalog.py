"""Delta Lake transaction-log census — the lake-native metadata walk.

An engine whose identity is data-lake analytics should read the lake's
own table format. The Delta transaction log (public protocol spec:
`_delta_log/<20-digit-version>.json`, one JSON action per line) fully
determines a table's live state: `protocol` gates readability,
`metaData` carries the schema and partition columns, and the ordered
replay of `add`/`remove` actions yields the live file set. This module
replays a table shipped as a tar archive (the repo's from-spec tar
walker, multimodal/archive.py) and CROSS-CHECKS the log against the
data it references: every live `add`'s size must equal the member's
byte length, and its `stats.numRecords` must equal the parquet
footer's row count (multimodal/parquetblob.py) — the compaction /
data-skipping story end-to-end: log → footer → stats.

Reject-whole (the torn-log legs):
  - the version chain is not contiguous from 0 (a missing commit means
    the replay state is undefined — never census a log you could not
    fully replay);
  - `protocol.minReaderVersion` > 1 (the spec REQUIRES readers to
    refuse tables demanding features they don't implement — column
    mapping, deletion vectors, v2 checkpoints all hide behind it);
  - a commit line that isn't valid JSON, a missing metaData, or an
    `add` whose data file is absent from the archive.

Checkpoint parquet files are ignored, not rejected: a contiguous
json chain from version 0 makes the checkpoint redundant by
construction (it is a materialization of the same replay).
"""

from __future__ import annotations

import json
from typing import Optional

__all__ = [
    "parse_delta_table",
    "synth_delta_table",
    "delta_log_census_frame",
    "delta_log_census_roundtrip",
    "DELTA_LOG_ORACLE",
]

_LOG_DIR = "_delta_log/"


def _commit_version(name: str) -> Optional[int]:
    """`_delta_log/<20 digits>.json` → version, else None."""
    if not name.startswith(_LOG_DIR) or not name.endswith(".json"):
        return None
    stem = name[len(_LOG_DIR) : -5]
    if len(stem) != 20 or not all("0" <= c <= "9" for c in stem):
        return None
    return int(stem)


def parse_delta_table(payload: bytes) -> Optional[dict]:
    """One census row for a tar-shipped Delta table, or None for a
    non-archive payload / any reject condition above."""
    from danae_spark.multimodal.archive import iter_archive_members
    from danae_spark.multimodal.parquetblob import parse_parquet_blob

    commits: dict[int, bytes] = {}
    files: dict[str, bytes] = {}
    saw_log_dir = False
    for name, is_dir, data in iter_archive_members(payload):
        if is_dir:
            continue
        if name.startswith(_LOG_DIR):
            saw_log_dir = True
            v = _commit_version(name)
            if v is not None:
                commits[v] = data
            continue  # checkpoints / _last_checkpoint: redundant, skipped
        files[name] = data
    if not saw_log_dir or not commits:
        return None
    versions = sorted(commits)
    if versions != list(range(len(versions))):
        return None  # torn log: the replay state would be undefined

    n_adds = n_removes = 0
    protocol_reader = None
    schema_fields = None
    partition_cols: list[str] = []
    live: dict[str, dict] = {}
    try:
        for v in versions:
            text = commits[v].decode("utf-8")
            for ln in text.splitlines():
                if not ln.strip():
                    continue
                action = json.loads(ln)
                if not isinstance(action, dict):
                    return None
                if "protocol" in action:
                    protocol_reader = int(action["protocol"]["minReaderVersion"])
                    if protocol_reader > 1:
                        return None  # demanded reader features we lack
                elif "metaData" in action:
                    md = action["metaData"]
                    schema = json.loads(md["schemaString"])
                    schema_fields = len(schema["fields"])
                    partition_cols = list(md.get("partitionColumns", []))
                elif "add" in action:
                    a = action["add"]
                    n_adds += 1
                    stats = a.get("stats")
                    live[a["path"]] = {
                        "size": int(a["size"]),
                        "rows": (
                            int(json.loads(stats)["numRecords"])
                            if stats
                            else None
                        ),
                        "pv": dict(a.get("partitionValues", {})),
                    }
                elif "remove" in action:
                    n_removes += 1
                    live.pop(action["remove"]["path"], None)
    except (KeyError, ValueError, TypeError, UnicodeDecodeError):
        return None
    if protocol_reader is None or schema_fields is None:
        return None  # a replayable table states protocol + metaData

    sizes_ok = footers_ok = True
    live_rows = 0
    pvals: set[tuple] = set()
    for path, a in live.items():
        data = files.get(path)
        if data is None:
            return None  # the log references a file the archive lacks
        if len(data) != a["size"]:
            sizes_ok = False
        footer = parse_parquet_blob(data)
        if footer is None or (
            a["rows"] is not None and footer["n_rows"] != a["rows"]
        ):
            footers_ok = False
        live_rows += a["rows"] if a["rows"] is not None else (
            footer["n_rows"] if footer else 0
        )
        pvals.add(tuple(sorted(a["pv"].items())))

    return {
        "n_commits": len(versions),
        "n_adds": n_adds,
        "n_removes": n_removes,
        "live_files": len(live),
        "live_rows": live_rows,
        "schema_fields": schema_fields,
        "n_partition_cols": len(partition_cols),
        "n_partition_values": len(pvals) if partition_cols else 0,
        "protocol_reader": protocol_reader,
        "sizes_consistent": sizes_ok,
        "footers_consistent": footers_ok,
    }


# ----------------------------------------------------------- synthesis
#
# Doc-arithmetic grid (restated verbatim in DELTA_LOG_ORACLE):
#   n_commits = 2 + d % 3
#   commit 0: protocol + metaData + add F0 + add F1
#   commit v>=1: add F_{v+1}; even v also removes F_{v-1}
#   file F_j: REAL parquet, rows r_j = 5 + (d + j) % 6
#   schema_fields = 2 + d % 2 (c0 long, c1 string, + c2 double)
#   partitioned (on synthetic col 'pc', values j % 2) when d % 3 == 0
#   d % 17 == 5: protocol demands minReaderVersion 3  (reject)
#   d % 13 == 8: the last commit's version skips ahead (torn-log reject)


def delta_n_commits(d: int) -> int:
    return 2 + d % 3


def delta_file_rows(d: int, j: int) -> int:
    return 5 + (d + j) % 6


def _data_file(d: int, j: int) -> bytes:
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = delta_file_rows(d, j)
    cols = {"c0": pa.array([(d + j * 3 + i) % 50 for i in range(n)], pa.int64()),
            "c1": pa.array([f"v{(d + i) % 4}" for i in range(n)])}
    if d % 2 == 1:
        cols["c2"] = pa.array([float((j + i) % 3) for i in range(n)])
    buf = io.BytesIO()
    pq.write_table(pa.table(cols), buf, compression="snappy")
    return buf.getvalue()


def synth_delta_table(d: int) -> bytes:
    """A REAL Delta table as a tar archive: contiguous commit chain,
    spec-shaped actions (protocol / metaData with a JSON schemaString /
    add with partitionValues + stats / remove), and the referenced
    parquet files written by the reference writer — so the census's
    log-vs-footer cross-check exercises real bytes, not mocks."""
    from danae_spark.multimodal.archive import _tar_build

    n_commits = delta_n_commits(d)
    partitioned = d % 3 == 0
    fields = [
        {"name": "c0", "type": "long", "nullable": True, "metadata": {}},
        {"name": "c1", "type": "string", "nullable": True, "metadata": {}},
    ]
    if d % 2 == 1:
        fields.append(
            {"name": "c2", "type": "double", "nullable": True, "metadata": {}}
        )
    schema_str = json.dumps({"type": "struct", "fields": fields})

    datafiles: dict[str, bytes] = {}

    def add_action(j: int) -> str:
        blob = _data_file(d, j)
        path = f"part-{j:05d}-{d:08d}.snappy.parquet"
        datafiles[path] = blob
        # per-column minValues/maxValues, TRUTHFUL from the data the
        # writer just produced (the Delta data-skipping input) — except
        # the d % 23 == 7 lying-stats leg, where F0's c0 max claims 999
        # so the skipping planner's footer cross-check has a live
        # inconsistency to flag
        n = delta_file_rows(d, j)
        c0_vals = [(d + j * 3 + i) % 50 for i in range(n)]
        c1_vals = [f"v{(d + i) % 4}" for i in range(n)]
        mins = {"c0": min(c0_vals), "c1": min(c1_vals)}
        maxs = {"c0": max(c0_vals), "c1": max(c1_vals)}
        if d % 23 == 7 and j == 0:
            maxs["c0"] = 999
        return json.dumps({
            "add": {
                "path": path,
                "size": len(blob),
                "modificationTime": 1700000000000 + j,
                "dataChange": True,
                "partitionValues": {"pc": str(j % 2)} if partitioned else {},
                "stats": json.dumps({
                    "numRecords": delta_file_rows(d, j),
                    "minValues": mins,
                    "maxValues": maxs,
                }),
            }
        })

    commits: list[str] = []
    c0 = [
        json.dumps({"protocol": {
            "minReaderVersion": 3 if d % 17 == 5 else 1,
            "minWriterVersion": 2,
        }}),
        json.dumps({"metaData": {
            "id": f"tbl-{d}",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_str,
            "partitionColumns": ["pc"] if partitioned else [],
            "configuration": {},
            "createdTime": 1700000000000,
        }}),
        add_action(0),
        add_action(1),
    ]
    commits.append("\n".join(c0) + "\n")
    for v in range(1, n_commits):
        lines = [add_action(v + 1)]
        if v % 2 == 0:
            removed = f"part-{v - 1:05d}-{d:08d}.snappy.parquet"
            lines.append(json.dumps({"remove": {
                "path": removed,
                "deletionTimestamp": 1700000000000 + 100 + v,
                "dataChange": True,
            }}))
        commits.append("\n".join(lines) + "\n")

    entries: list[tuple[str, bytes | None]] = [("_delta_log/", None)]
    for v, body in enumerate(commits):
        # torn log: the final commit's version skips ahead by one,
        # leaving a gap whatever the chain length
        if d % 13 == 8 and v == len(commits) - 1:
            v = v + 1
        entries.append((f"_delta_log/{v:020d}.json", body.encode("utf-8")))
    for path, blob in sorted(datafiles.items()):
        entries.append((path, blob))
    return _tar_build(entries)


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, n_commits int, n_adds int, n_removes int, "
    "live_files int, live_rows bigint, schema_fields int, "
    "n_partition_cols int, n_partition_values int, protocol_reader int, "
    "sizes_consistent boolean, footers_consistent boolean"
)
_COLS = [
    "n_commits", "n_adds", "n_removes", "live_files", "live_rows",
    "schema_fields", "n_partition_cols", "n_partition_values",
    "protocol_reader", "sizes_consistent", "footers_consistent",
]


def delta_log_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Delta-log census over any (id, binary) frame of tar-shipped
    tables: one Arrow-batched narrow map, no shuffle."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(
        df, parse_delta_table, _COLS, _SCHEMA, id_col, payload_col
    )


def delta_log_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real Delta table (commit
    chain + real parquet data files in a tar) is replayed by the
    census with the log-vs-footer cross-check on, and every column is
    restated as doc_id arithmetic. d%17==5 (unsupported reader
    protocol) and d%13==8 (torn version chain) reject whole."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(
        spark, sf_dir, synth_delta_table, parse_delta_table, _COLS, _SCHEMA
    )


# live file j (0..n_commits): removed iff j odd and j+1 even and
# j+1 <= n_commits-1 → with commits v=2.. removing F_{v-1}, the removed
# set is {v-1 : v even, 1 <= v-1 <= n_commits-2} = {1} for n_commits>=3,
# {1,3} would need n_commits>=5 (never: max 4).
DELTA_LOG_ORACLE = """
WITH d0 AS (
  SELECT doc_id, doc_id AS d, 2 + doc_id % 3 AS n_commits,
         CASE WHEN doc_id % 17 = 5 OR doc_id % 13 = 8 THEN 1 ELSE 0 END AS rej,
         CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS parted
  FROM documents
),
live AS (
  SELECT d0.doc_id,
         CAST(count(*) AS INT) AS live_files,
         CAST(sum(5 + (d0.d + j.j) % 6) AS BIGINT) AS live_rows,
         CAST(count(DISTINCT j.j % 2) AS INT) AS n_pv
  FROM d0 JOIN generate_series(0, 4) j(j) ON j.j <= d0.n_commits
  WHERE d0.rej = 0 AND NOT (j.j = 1 AND d0.n_commits >= 3)
  GROUP BY d0.doc_id
)
SELECT d0.doc_id,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(n_commits AS INT) END AS n_commits,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(n_commits + 1 AS INT) END AS n_adds,
       CASE WHEN rej = 1 THEN NULL
            ELSE CAST(CASE WHEN n_commits >= 3 THEN 1 ELSE 0 END AS INT)
            END AS n_removes,
       live.live_files,
       live.live_rows,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(2 + d % 2 AS INT) END AS schema_fields,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(parted AS INT) END AS n_partition_cols,
       CASE WHEN rej = 1 THEN NULL
            ELSE CAST(CASE WHEN parted = 1 THEN live.n_pv ELSE 0 END AS INT)
            END AS n_partition_values,
       CASE WHEN rej = 1 THEN NULL ELSE 1 END AS protocol_reader,
       CASE WHEN rej = 1 THEN NULL ELSE TRUE END AS sizes_consistent,
       CASE WHEN rej = 1 THEN NULL ELSE TRUE END AS footers_consistent
FROM d0 LEFT JOIN live USING (doc_id) ORDER BY d0.doc_id
"""
