"""Delta Lake table reader — replay `_delta_log` and read the live files.

The on-disk twin of the tar-blob census (multimodal/deltalog.py): the
same protocol rules applied to a real table directory. `read_delta`
replays the contiguous JSON commit chain (protocol gate, add/remove
reconciliation) and returns a DataFrame over exactly the LIVE parquet
files — so time-travel-by-version and vacuum-pending tombstones are
handled the way the Delta protocol defines them, not by globbing
`*.parquet` (which would double-read compacted data: every remove
tombstone's file is still on disk until vacuum).

Scale shape: the log replay is a driver-side read of the ~KB JSON
commits (exactly what every Delta client does — the log IS the
metadata plane); the data plane is a normal distributed parquet scan
over the live file list, so partition pruning / predicate pushdown
apply unchanged. Partition values recorded in the log are attached as
literal columns per file group via unionByName over per-partition
reads when the table is partitioned.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["replay_delta_log", "read_delta"]


class DeltaProtocolError(ValueError):
    """The table demands reader features this engine does not have."""


def replay_delta_log(table_dir: str, version: Optional[int] = None) -> dict:
    """Replay `_delta_log` up to `version` (default: latest). Returns
    {'version', 'schema_fields', 'partition_columns', 'live'} where
    live maps file path → {'size', 'rows', 'partition_values'}.

    Raises ValueError on a torn chain / missing metaData and
    DeltaProtocolError when minReaderVersion > 1 (the spec requires
    readers to refuse, not guess)."""
    log_dir = os.path.join(table_dir, "_delta_log")
    commits: dict[int, str] = {}
    for name in os.listdir(log_dir):
        stem, ext = os.path.splitext(name)
        if ext == ".json" and len(stem) == 20 and stem.isdigit():
            commits[int(stem)] = os.path.join(log_dir, name)
    if not commits:
        raise ValueError(f"no commit files under {log_dir}")
    versions = sorted(commits)
    if version is not None:
        versions = [v for v in versions if v <= version]
        if not versions or versions[-1] != version:
            raise ValueError(f"version {version} not in the log")
    if versions != list(range(len(versions))):
        raise ValueError(f"torn commit chain: {versions[:8]}...")

    live: dict[str, dict] = {}
    schema_fields = None
    partition_columns: list[str] = []
    for v in versions:
        with open(commits[v], encoding="utf-8") as fh:
            for ln in fh:
                if not ln.strip():
                    continue
                action = json.loads(ln)
                if "protocol" in action:
                    if int(action["protocol"]["minReaderVersion"]) > 1:
                        raise DeltaProtocolError(
                            "table requires minReaderVersion "
                            f"{action['protocol']['minReaderVersion']}"
                        )
                elif "metaData" in action:
                    md = action["metaData"]
                    schema_fields = json.loads(md["schemaString"])["fields"]
                    partition_columns = list(md.get("partitionColumns", []))
                elif "add" in action:
                    a = action["add"]
                    stats = a.get("stats")
                    live[a["path"]] = {
                        "size": int(a["size"]),
                        "rows": (
                            int(json.loads(stats)["numRecords"]) if stats else None
                        ),
                        "partition_values": dict(a.get("partitionValues", {})),
                    }
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
    if schema_fields is None:
        raise ValueError("log has no metaData action")
    return {
        "version": versions[-1],
        "schema_fields": schema_fields,
        "partition_columns": partition_columns,
        "live": live,
    }


def read_delta(
    spark: SparkSession, table_dir: str, version: Optional[int] = None
) -> DataFrame:
    """DataFrame over the table's LIVE files at `version` (default
    latest), with log-recorded partition values attached as columns."""
    state = replay_delta_log(table_dir, version)
    live = state["live"]
    pcols = state["partition_columns"]
    if not live:
        # an empty table still has a schema: build it from metaData
        from pyspark.sql.types import StructType

        typemap = {
            "long": "bigint", "integer": "int", "string": "string",
            "double": "double", "float": "float", "boolean": "boolean",
            "date": "date", "timestamp": "timestamp", "short": "smallint",
            "byte": "tinyint", "binary": "binary",
        }
        ddl = ", ".join(
            f"{f['name']} {typemap.get(f['type'], 'string')}"
            for f in state["schema_fields"]
        )
        return spark.createDataFrame([], StructType.fromDDL(ddl))
    if not pcols:
        paths = [os.path.join(table_dir, p) for p in sorted(live)]
        return spark.read.parquet(*paths)
    # partitioned: group live files by their recorded partition values
    # (the values live in the LOG, not the files) and attach them as
    # literal columns per group — one distributed scan per value tuple,
    # unioned; pruning on partition columns happens before the scan.
    groups: dict[tuple, list[str]] = {}
    for path, a in sorted(live.items()):
        key = tuple(a["partition_values"].get(c) for c in pcols)
        groups.setdefault(key, []).append(os.path.join(table_dir, path))
    out = None
    for key, paths in sorted(groups.items()):
        df = spark.read.parquet(*paths)
        for c, v in zip(pcols, key):
            df = df.withColumn(c, F.lit(v))
        out = df if out is None else out.unionByName(df)
    return out
