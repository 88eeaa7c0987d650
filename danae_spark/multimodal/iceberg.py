"""Apache Iceberg metadata-chain census — the second lake-native table
format (the Delta census's sibling, r17 directive #2's "can follow the
same pattern" follow-on).

Iceberg's metadata plane is a three-level chain, all public spec:

  metadata/<v>.metadata.json   format-version gate (1/2; anything
                               newer REJECTS — the spec's
                               forward-compatibility rule), schemas,
                               partition specs, snapshot list +
                               current-snapshot-id
  manifest list (Avro)         one record per manifest: path + added/
                               existing/deleted file and row counts
  manifests (Avro)             one entry per data file: status
                               (existing/added/deleted), path, format,
                               record_count, file_size_in_bytes

This module adds what the avro blob census (C131) deliberately left
out: a schema-driven DATUM codec (record / array / union-with-null /
string / long / int / boolean / double / bytes) over the same
container framing, so manifest records decode into real values — and
the census CROSS-CHECKS the chain bottom-up: each live entry's
file_size_in_bytes must equal the member's bytes and its record_count
the parquet footer's row count; each manifest's declared counts must
match its own entries. Reject-whole: unknown format version, a
current-snapshot-id not in the snapshot list, a manifest the archive
lacks, datum decode failure, counts that disagree.

Tables ship as tar archives (the Delta census convention,
multimodal/archive.py's from-spec tar walk).
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Optional

from danae_spark.multimodal.avroblob import (
    _read_bytes,
    _read_long,
    _write_bytes,
    _write_long,
)

__all__ = [
    "avro_datum_read",
    "avro_datum_write",
    "parse_iceberg_table",
    "synth_iceberg_table",
    "iceberg_census_frame",
    "iceberg_census_roundtrip",
    "ICEBERG_CENSUS_ORACLE",
]


class _Bad(Exception):
    pass


# ------------------------------------------- schema-driven datum codec


def avro_datum_read(schema, buf: bytes, pos: int) -> tuple[object, int]:
    """Decode one datum per the (parsed-JSON) Avro schema. Supports the
    subset Iceberg metadata uses: primitives, record, array, and
    unions of null + one branch (zigzag-long branch index)."""
    if isinstance(schema, list):  # union
        ix, pos = _read_long(buf, pos)
        if ix < 0 or ix >= len(schema):
            raise _Bad
        return avro_datum_read(schema[ix], buf, pos)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            out = {}
            for f in schema["fields"]:
                out[f["name"]], pos = avro_datum_read(f["type"], buf, pos)
            return out, pos
        if t == "array":
            items = []
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    return items, pos
                if n < 0:  # block with byte size prefix
                    n = -n
                    _sz, pos = _read_long(buf, pos)
                for _ in range(n):
                    v, pos = avro_datum_read(schema["items"], buf, pos)
                    items.append(v)
        schema = t  # {"type": "long"} primitive form
    if schema == "null":
        return None, pos
    if schema in ("long", "int"):
        return _read_long(buf, pos)
    if schema == "boolean":
        if pos >= len(buf) or buf[pos] not in (0, 1):
            raise _Bad
        return bool(buf[pos]), pos + 1
    if schema == "string":
        b, pos = _read_bytes(buf, pos)
        return b.decode("utf-8"), pos
    if schema == "bytes":
        return _read_bytes(buf, pos)
    if schema == "double":
        if pos + 8 > len(buf):
            raise _Bad
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    raise _Bad


def avro_datum_write(schema, value) -> bytes:
    if isinstance(schema, list):  # union: null or the one branch
        if value is None:
            ix = schema.index("null")
            return _write_long(ix)
        ix = next(i for i, s in enumerate(schema) if s != "null")
        return _write_long(ix) + avro_datum_write(schema[ix], value)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return b"".join(
                avro_datum_write(f["type"], value[f["name"]])
                for f in schema["fields"]
            )
        if t == "array":
            out = b""
            if value:
                out += _write_long(len(value))
                out += b"".join(
                    avro_datum_write(schema["items"], v) for v in value
                )
            return out + _write_long(0)
        schema = t
    if schema == "null":
        return b""
    if schema in ("long", "int"):
        return _write_long(value)
    if schema == "boolean":
        return bytes((1 if value else 0,))
    if schema == "string":
        return _write_bytes(value.encode("utf-8"))
    if schema == "bytes":
        return _write_bytes(value)
    if schema == "double":
        return struct.pack("<d", value)
    raise ValueError(f"unsupported schema {schema!r}")


# --------------------------------------- Avro container (null codec)

_SYNC = bytes(range(16))


def avro_file_write(schema: dict, records: list) -> bytes:
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": b"null"}
    out = bytearray(b"Obj\x01")
    out += _write_long(len(meta))
    for k, v in meta.items():
        out += _write_bytes(k.encode()) + _write_bytes(v)
    out += _write_long(0)
    out += _SYNC
    if records:
        blob = b"".join(avro_datum_write(schema, r) for r in records)
        out += _write_long(len(records)) + _write_bytes(blob) + _SYNC
    return bytes(out)


def avro_file_read(payload: bytes) -> Optional[tuple[dict, list]]:
    """(schema, records) for a null/deflate-codec Avro file whose
    schema the datum codec supports; raises _Bad on malformation."""
    if payload[:4] != b"Obj\x01":
        raise _Bad
    pos = 4
    meta = {}
    while True:
        n, pos = _read_long(payload, pos)
        if n == 0:
            break
        if n < 0:
            _sz, pos = _read_long(payload, pos)
            n = -n
        for _ in range(n):
            k, pos = _read_bytes(payload, pos)
            v, pos = _read_bytes(payload, pos)
            meta[k.decode()] = v
    if pos + 16 > len(payload):
        raise _Bad
    sync = payload[pos : pos + 16]
    pos += 16
    try:
        schema = json.loads(meta["avro.schema"])
    except (KeyError, ValueError):
        raise _Bad
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise _Bad
    records = []
    while pos < len(payload):
        count, pos = _read_long(payload, pos)
        blob, pos = _read_bytes(payload, pos)
        if payload[pos : pos + 16] != sync:
            raise _Bad
        pos += 16
        if codec == "deflate":
            z = zlib.decompressobj(-15)
            blob = z.decompress(blob, 1 << 26)
            if not z.eof or z.unconsumed_tail:
                raise _Bad
        at = 0
        for _ in range(count):
            rec, at = avro_datum_read(schema, blob, at)
            records.append(rec)
        if at != len(blob):
            raise _Bad
    return schema, records


# ---------------------------------------------------- Iceberg structures

MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "existing_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
    ],
}

# per-column bounds ride the spec's integer-keyed map, which Avro
# represents as an array of key/value records (field-id -> the
# single-value binary serialization; longs are 8-byte little-endian)
_BOUNDS_T = ["null", {
    "type": "array",
    "items": {
        "type": "record", "name": "k_v",
        "fields": [
            {"name": "key", "type": "int"},
            {"name": "value", "type": "bytes"},
        ],
    },
}]

MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record", "name": "data_file",
            "fields": [
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
                {"name": "lower_bounds", "type": _BOUNDS_T},
                {"name": "upper_bounds", "type": _BOUNDS_T},
            ],
        }},
    ],
}


def bound_long(v: int) -> bytes:
    """Iceberg single-value serialization of a long: 8-byte LE."""
    return struct.pack("<q", v)

_ST_EXISTING, _ST_ADDED, _ST_DELETED = 0, 1, 2


def parse_iceberg_table(payload: bytes) -> Optional[dict]:
    """One census row for a tar-shipped Iceberg table, or None."""
    from danae_spark.multimodal.archive import iter_archive_members
    from danae_spark.multimodal.parquetblob import parse_parquet_blob

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
        # highest version wins (v<N>.metadata.json ordering)
        meta_name = max(meta_candidates)
        md = json.loads(files[meta_name].decode("utf-8"))
        fv = int(md["format-version"])
        if fv not in (1, 2):
            return None  # forward-compat rule: refuse unknown versions
        schemas = {s["schema-id"]: s for s in md.get("schemas", [])}
        schema = schemas.get(md.get("current-schema-id"))
        if schema is None:
            return None
        specs = {s["spec-id"]: s for s in md.get("partition-specs", [])}
        spec = specs.get(md.get("default-spec-id"))
        snapshots = {s["snapshot-id"]: s for s in md.get("snapshots", [])}
        cur_id = md.get("current-snapshot-id")
        if cur_id not in snapshots:
            return None  # a current pointer outside the list is torn
        cur = snapshots[cur_id]

        ml_path = cur["manifest-list"]
        if ml_path not in files:
            return None
        _mls, manifests = avro_file_read(files[ml_path])
        live_files = live_rows = 0
        n_deleted = 0
        sizes_ok = footers_ok = True
        for mf in manifests:
            mpath = mf["manifest_path"]
            if mpath not in files:
                return None
            if mf["manifest_length"] != len(files[mpath]):
                return None  # the list lied about the manifest
            _ms, entries = avro_file_read(files[mpath])
            counts = {_ST_EXISTING: 0, _ST_ADDED: 0, _ST_DELETED: 0}
            rows = {_ST_EXISTING: 0, _ST_ADDED: 0, _ST_DELETED: 0}
            for e in entries:
                st = e["status"]
                if st not in counts:
                    return None
                df = e["data_file"]
                counts[st] += 1
                rows[st] += df["record_count"]
                if st == _ST_DELETED:
                    n_deleted += 1
                    continue
                data = files.get(df["file_path"])
                if data is None:
                    return None  # live entry's data file missing
                if len(data) != df["file_size_in_bytes"]:
                    sizes_ok = False
                footer = parse_parquet_blob(data)
                if footer is None or footer["n_rows"] != df["record_count"]:
                    footers_ok = False
                live_files += 1
                live_rows += df["record_count"]
            # the manifest list's declared counts must match the entries
            if (counts[_ST_ADDED] != mf["added_files_count"]
                    or counts[_ST_EXISTING] != mf["existing_files_count"]
                    or counts[_ST_DELETED] != mf["deleted_files_count"]
                    or rows[_ST_ADDED] != mf["added_rows_count"]
                    or rows[_ST_EXISTING] != mf["existing_rows_count"]):
                return None
        return {
            "format_version": fv,
            "schema_fields": len(schema["fields"]),
            "n_partition_fields": len(spec["fields"]) if spec else 0,
            "n_snapshots": len(snapshots),
            "n_manifests": len(manifests),
            "live_files": live_files,
            "live_rows": live_rows,
            "n_deleted_entries": n_deleted,
            "sizes_consistent": sizes_ok,
            "footers_consistent": footers_ok,
        }
    except (_Bad, KeyError, ValueError, TypeError, IndexError,
            UnicodeDecodeError, struct.error, zlib.error):
        return None


# ----------------------------------------------------------- synthesis
#
# Doc-arithmetic grid (restated verbatim in ICEBERG_CENSUS_ORACLE):
#   n_snapshots = 1 + d % 3 (only the current one is replayed)
#   current snapshot: n_manifests = 1 + d % 2
#   manifest m: 1 + (d + m) % 3 entries; when d % 4 == 1 the FIRST
#   entry of manifest 0 is a DELETED tombstone (not live)
#   entry rows: r = 5 + (d + m * 3 + k) % 6 (same _data_file shape as
#   the Delta census — the parquet cross-check is shared)
#   schema_fields = 2 + d % 2; partitioned (1 spec field) iff d%3==0
#   d % 17 == 2: format-version 3            (reject)
#   d % 13 == 4: a manifest missing from tar (reject)
#   d % 23 == 5: manifest-list lies about added_files_count (reject)


def ice_n_snapshots(d: int) -> int:
    return 1 + d % 3


def ice_n_manifests(d: int) -> int:
    return 1 + d % 2


def ice_entries(d: int, m: int) -> int:
    return 1 + (d + m) % 3


def ice_rows(d: int, m: int, k: int) -> int:
    return 5 + (d + m * 3 + k) % 6


def synth_iceberg_table(d: int) -> bytes:
    from danae_spark.multimodal.archive import _tar_build
    from danae_spark.multimodal.deltalog import _data_file

    files: dict[str, bytes] = {}
    all_manifests = []
    for m in range(ice_n_manifests(d)):
        entries = []
        counts = {_ST_EXISTING: 0, _ST_ADDED: 0, _ST_DELETED: 0}
        rows = {_ST_EXISTING: 0, _ST_ADDED: 0, _ST_DELETED: 0}
        for k in range(ice_entries(d, m)):
            rc = ice_rows(d, m, k)
            path = f"data/f{m}_{k}_{d}.parquet"
            status = (
                _ST_DELETED if (d % 4 == 1 and m == 0 and k == 0)
                else (_ST_ADDED if k % 2 == 0 else _ST_EXISTING)
            )
            if status != _ST_DELETED:
                # reuse the Delta census's parquet builder but with the
                # iceberg row grid: rows must equal rc
                blob = _ice_data_file(d, m, k)
                files[path] = blob
                size = len(blob)
            else:
                size = 100  # tombstones reference no shipped file
            counts[status] += 1
            rows[status] += rc
            # truthful c0/c1 bounds (field ids 1/2) from the same
            # arithmetic the data writer used; d % 11 == 6 ships no
            # bounds (a pre-metrics writer — the planner must scan);
            # d % 31 == 3 lies about (m=0, k=0)'s c0 upper bound so
            # the skipping planner's footer audit has a live
            # inconsistency (skipped when that entry is the tombstone)
            if d % 11 == 6 or status == _ST_DELETED:
                lower = upper = None
            else:
                start = (d + m + k) % 50
                if start + rc <= 50:
                    c0_lo, c0_hi = start, start + rc - 1
                else:
                    c0_lo, c0_hi = 0, 49
                if d % 31 == 3 and m == 0 and k == 0:
                    c0_hi = 999
                c1_vals = [f"v{(d + i) % 4}" for i in range(rc)]
                lower = [{"key": 1, "value": bound_long(c0_lo)},
                         {"key": 2, "value": min(c1_vals).encode()}]
                upper = [{"key": 1, "value": bound_long(c0_hi)},
                         {"key": 2, "value": max(c1_vals).encode()}]
            entries.append({
                "status": status,
                "snapshot_id": 1000 + d,
                "data_file": {
                    "file_path": path,
                    "file_format": "PARQUET",
                    "record_count": rc,
                    "file_size_in_bytes": size,
                    "lower_bounds": lower,
                    "upper_bounds": upper,
                },
            })
        mpath = f"metadata/manifest-{m}-{d}.avro"
        files[mpath] = avro_file_write(MANIFEST_ENTRY_SCHEMA, entries)
        lie = 1 if (d % 23 == 5 and m == 0) else 0
        all_manifests.append({
            "manifest_path": mpath,
            "manifest_length": len(files[mpath]),
            "partition_spec_id": 0,
            "added_files_count": counts[_ST_ADDED] + lie,
            "existing_files_count": counts[_ST_EXISTING],
            "deleted_files_count": counts[_ST_DELETED],
            "added_rows_count": rows[_ST_ADDED],
            "existing_rows_count": rows[_ST_EXISTING],
            "deleted_rows_count": rows[_ST_DELETED],
        })
    ml_path = f"metadata/snap-{1000 + d}-manifest-list.avro"
    files[ml_path] = avro_file_write(MANIFEST_LIST_SCHEMA, all_manifests)
    if d % 13 == 4:
        del files[all_manifests[0]["manifest_path"]]  # torn chain

    fields = [
        {"id": 1, "name": "c0", "required": False, "type": "long"},
        {"id": 2, "name": "c1", "required": False, "type": "string"},
    ]
    if d % 2 == 1:
        fields.append(
            {"id": 3, "name": "c2", "required": False, "type": "double"}
        )
    snapshots = []
    for s in range(ice_n_snapshots(d)):
        sid = 1000 + d - (ice_n_snapshots(d) - 1 - s)
        snapshots.append({
            "snapshot-id": sid,
            "sequence-number": s + 1,
            "timestamp-ms": 1700000000000 + s,
            "manifest-list": ml_path if sid == 1000 + d else
            f"metadata/snap-{sid}-manifest-list.avro",
            "summary": {"operation": "append"},
        })
        if sid != 1000 + d:
            # older snapshots keep a (replayable but unvisited)
            # empty manifest list so their paths resolve
            files[snapshots[-1]["manifest-list"]] = avro_file_write(
                MANIFEST_LIST_SCHEMA, []
            )
    md = {
        "format-version": 3 if d % 17 == 2 else 2,
        "table-uuid": f"00000000-0000-0000-0000-{d:012d}",
        "location": "tar:/",
        "last-sequence-number": ice_n_snapshots(d),
        "schemas": [{"type": "struct", "schema-id": 0, "fields": fields}],
        "current-schema-id": 0,
        "partition-specs": [{
            "spec-id": 0,
            "fields": (
                [{"name": "c1_bucket", "transform": "bucket[4]",
                  "source-id": 2, "field-id": 1000}]
                if d % 3 == 0 else []
            ),
        }],
        "default-spec-id": 0,
        "current-snapshot-id": 1000 + d,
        "snapshots": snapshots,
    }
    files[f"metadata/v{ice_n_snapshots(d)}.metadata.json"] = json.dumps(
        md
    ).encode("utf-8")

    entries = [("metadata/", None), ("data/", None)]
    entries += sorted(files.items())
    return _tar_build(entries)


def _ice_data_file(d: int, m: int, k: int) -> bytes:
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = ice_rows(d, m, k)
    cols = {"c0": pa.array([(d + m + k + i) % 50 for i in range(n)], pa.int64()),
            "c1": pa.array([f"v{(d + i) % 4}" for i in range(n)])}
    if d % 2 == 1:
        cols["c2"] = pa.array([float((m + i) % 3) for i in range(n)])
    buf = io.BytesIO()
    pq.write_table(pa.table(cols), buf, compression="snappy")
    return buf.getvalue()


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, format_version int, schema_fields int, "
    "n_partition_fields int, n_snapshots int, n_manifests int, "
    "live_files int, live_rows bigint, n_deleted_entries int, "
    "sizes_consistent boolean, footers_consistent boolean"
)
_COLS = ["format_version", "schema_fields", "n_partition_fields",
         "n_snapshots", "n_manifests", "live_files", "live_rows",
         "n_deleted_entries", "sizes_consistent", "footers_consistent"]


def iceberg_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Iceberg metadata-chain census over any (id, binary) frame of
    tar-shipped tables: one Arrow-batched narrow map, no shuffle."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(
        df, parse_iceberg_table, _COLS, _SCHEMA, id_col, payload_col
    )


def iceberg_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real Iceberg table
    (metadata.json + Avro manifest list + Avro manifests decoded by
    the schema-driven datum codec + real parquet data files) is
    replayed from the current snapshot down, with the bottom-up
    cross-checks on; every column restated as doc_id arithmetic.
    d%17==2 (format-version 3), d%13==4 (missing manifest) and
    d%23==5 (manifest-list count lie) reject whole."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(
        spark, sf_dir, synth_iceberg_table, parse_iceberg_table, _COLS, _SCHEMA
    )


ICEBERG_CENSUS_ORACLE = """
WITH d0 AS (
  SELECT doc_id, doc_id AS d,
         CASE WHEN doc_id % 17 = 2 OR doc_id % 13 = 4 OR doc_id % 23 = 5
              THEN 1 ELSE 0 END AS rej,
         1 + doc_id % 3 AS n_snapshots, 1 + doc_id % 2 AS n_manifests,
         CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END AS has_tomb
  FROM documents
),
ent AS (
  SELECT d0.doc_id, m.m, k.k,
         5 + (d0.d + m.m * 3 + k.k) % 6 AS rc,
         CASE WHEN d0.has_tomb = 1 AND m.m = 0 AND k.k = 0
              THEN 1 ELSE 0 END AS tomb
  FROM d0
  JOIN generate_series(0, 1) m(m) ON m.m < d0.n_manifests
  JOIN generate_series(0, 2) k(k) ON k.k < 1 + (d0.d + m.m) % 3
  WHERE d0.rej = 0
),
agg AS (
  SELECT doc_id,
         CAST(count(*) FILTER (WHERE tomb = 0) AS INT) AS live_files,
         CAST(sum(rc) FILTER (WHERE tomb = 0) AS BIGINT) AS live_rows,
         CAST(count(*) FILTER (WHERE tomb = 1) AS INT) AS n_deleted
  FROM ent GROUP BY doc_id
)
SELECT d0.doc_id,
       CASE WHEN rej = 1 THEN NULL ELSE 2 END AS format_version,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(2 + d % 2 AS INT) END
         AS schema_fields,
       CASE WHEN rej = 1 THEN NULL
            ELSE CAST(CASE WHEN d % 3 = 0 THEN 1 ELSE 0 END AS INT) END
         AS n_partition_fields,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(n_snapshots AS INT) END
         AS n_snapshots,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(n_manifests AS INT) END
         AS n_manifests,
       agg.live_files,
       agg.live_rows,
       CASE WHEN rej = 1 THEN NULL ELSE agg.n_deleted END AS n_deleted_entries,
       CASE WHEN rej = 1 THEN NULL ELSE TRUE END AS sizes_consistent,
       CASE WHEN rej = 1 THEN NULL ELSE TRUE END AS footers_consistent
FROM d0 LEFT JOIN agg USING (doc_id) ORDER BY d0.doc_id
"""
