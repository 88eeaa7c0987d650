"""Zarr v2 store census — the chunked-array lake format.

Zarr stores an N-d array as a directory: a `.zarray` JSON document
(shape, chunks, dtype, compressor, fill_value) plus one file per
chunk named by its grid index ("0.0", "1.3", ...). It is how large
scientific and ML array data actually lands in object stores, and it
is the array-world mirror of the lake censuses: metadata declares a
layout, the data plane must honor it.

The census replays a tar-shipped store:

  - every `.zarray` is parsed strictly (zarr_format must be 2; shape/
    chunks must be positive-int lists of equal rank; the dtype must
    be in the fixed-width subset — object dtypes are not an array
    lake);
  - every chunk file must DECODE to exactly prod(chunks) x itemsize
    bytes (v2 pads edge chunks to full size): zlib chunks are
    decompressed for real (bomb-capped), raw chunks size-checked; an
    unknown compressor rejects whole (its byte math is unknowable —
    the GGUF rule);
  - a chunk name outside the grid rejects whole (a lying writer);
  - a MISSING chunk is legal (zarr reads it as fill_value) and is
    REPORTED via chunks_complete — the lazy-written-array reality a
    glob-based completeness check gets wrong in both directions.

Reference parity note: the reference engine (SURVEY §1) has no array
handling; extension surface like multimodal/tensors.py.
"""

from __future__ import annotations

import json
import zlib
from typing import Optional

__all__ = [
    "parse_zarr_store",
    "synth_zarr_store",
    "zarr_census_frame",
    "zarr_census_roundtrip",
    "ZARR_CENSUS_ORACLE",
]

_DTYPES = {"<f8": 8, "<f4": 4, "<i8": 8, "<i4": 4, "<i2": 2,
           "|i1": 1, "|u1": 1, "|b1": 1}
_MAX_CHUNK = 64 * 1024 * 1024


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def parse_zarr_store(payload: bytes) -> Optional[dict]:
    from danae_spark.multimodal.archive import iter_archive_members

    try:
        files: dict[str, bytes] = {}
        for name, is_dir, data in iter_archive_members(payload):
            if not is_dir:
                files[name] = data
    except Exception:
        return None
    arrays: dict[str, dict] = {}
    for name in files:
        if name.endswith("/.zarray"):
            arrays[name[: -len("/.zarray")]] = {}
    if not arrays:
        return None
    total_elements = 0
    expected = present = 0
    complete = True
    dtypes = set()
    compressors = set()
    for arr in sorted(arrays):
        try:
            meta = json.loads(files[arr + "/.zarray"].decode("utf-8"))
        except (ValueError, UnicodeDecodeError):
            return None
        if not isinstance(meta, dict) or meta.get("zarr_format") != 2:
            return None
        shape = meta.get("shape")
        chunks = meta.get("chunks")
        dtype = meta.get("dtype")
        comp = meta.get("compressor")
        if (
            not isinstance(shape, list) or not isinstance(chunks, list)
            or len(shape) != len(chunks) or not shape
            or not all(isinstance(s, int) and s > 0 for s in shape)
            or not all(isinstance(c, int) and c > 0 for c in chunks)
        ):
            return None
        if dtype not in _DTYPES:
            return None  # object/structured dtypes are not an array lake
        comp_id = None
        if comp is not None:
            if not isinstance(comp, dict) or "id" not in comp:
                return None
            comp_id = comp["id"]
            if comp_id != "zlib":
                return None  # unknown codec: byte math unknowable
        itemsize = _DTYPES[dtype]
        n = 1
        for s in shape:
            n *= s
        total_elements += n
        dtypes.add(dtype)
        compressors.add(comp_id or "raw")
        grid = [_ceil_div(s, c) for s, c in zip(shape, chunks)]
        n_grid = 1
        for g in grid:
            n_grid *= g
        expected += n_grid
        chunk_bytes = itemsize
        for c in chunks:
            chunk_bytes *= c
        prefix = arr + "/"
        for name, data in files.items():
            if not name.startswith(prefix) or name.endswith("/.zarray"):
                continue
            stem = name[len(prefix):]
            if stem.startswith("."):
                continue  # .zattrs and friends: metadata, not chunks
            parts = stem.split(".")
            if len(parts) != len(grid) or not all(p.isdigit() for p in parts):
                return None  # not a chunk key for this array's rank
            ix = [int(p) for p in parts]
            if any(i >= g for i, g in zip(ix, grid)):
                return None  # a chunk outside the declared grid
            if comp_id == "zlib":
                try:
                    dec = zlib.decompressobj()
                    raw = dec.decompress(data, _MAX_CHUNK)
                    if dec.unconsumed_tail or not dec.eof or dec.unused_data:
                        return None
                except zlib.error:
                    return None
                if len(raw) != chunk_bytes:
                    return None  # the chunk lies about its extent
            elif len(data) != chunk_bytes:
                return None
            present += 1
    if present > expected:
        return None  # duplicate or stray chunk accounting
    if present < expected:
        complete = False
    return {
        "n_arrays": len(arrays),
        "total_elements": total_elements,
        "expected_chunks": expected,
        "present_chunks": present,
        "chunks_complete": complete,
        "dtypes": "/".join(sorted(dtypes)),
        "codecs": "/".join(sorted(compressors)),
    }


# ------------------------------------------------------------- synthesis
#
# Grid (restated in ZARR_CENSUS_ORACLE):
#   arrays  G = 1 + d % 2, names a0/a1: shape (8 + d % 5, 6),
#           chunks (4, 3) -> grid ceil((8 + d%5)/4) x 2
#   dtype   [<f4, <i8, |u1][d % 3]; zlib on even d, raw on odd
#   missing d % 7 == 3 drops a0's chunk (0, 0): chunks_complete=false
#           (zarr reads it as fill_value — legal, reported)
#   rejects d % 17 == 15 invalid .zarray JSON; d % 13 == 3 a chunk
#           decodes to the wrong extent; d % 23 == 6 unknown codec


def synth_zarr_store(d: int) -> bytes:
    from danae_spark.multimodal.archive import _tar_build

    dtype = ["<f4", "<i8", "|u1"][d % 3]
    itemsize = _DTYPES[dtype]
    rows = 8 + d % 5
    entries: list[tuple[str, bytes | None]] = []
    for a in range(1 + d % 2):
        name = f"a{a}"
        comp = {"id": "zlib", "level": 1} if d % 2 == 0 else None
        if d % 23 == 6 and a == 0:
            comp = {"id": "blosc", "cname": "lz4"}
        meta = {
            "zarr_format": 2,
            "shape": [rows, 6],
            "chunks": [4, 3],
            "dtype": dtype,
            "compressor": comp,
            "fill_value": 0,
            "order": "C",
            "filters": None,
        }
        raw_meta = json.dumps(meta).encode("utf-8")
        if d % 17 == 15 and a == 0:
            raw_meta = raw_meta[:-4]  # torn JSON
        entries.append((name + "/", None))
        entries.append((name + "/.zarray", raw_meta))
        entries.append((name + "/.zattrs", b'{"source": "synth"}'))
        chunk_bytes = 4 * 3 * itemsize
        for i in range(_ceil_div(rows, 4)):
            for j in range(2):
                if d % 7 == 3 and a == 0 and i == 0 and j == 0:
                    continue  # lazily-unwritten chunk
                blob = bytes((d + i + j) % 251 for _ in range(chunk_bytes))
                if d % 13 == 3 and a == 0 and i == 0 and j == 1:
                    blob = blob[:-2]  # wrong extent
                if comp is not None and comp["id"] == "zlib":
                    blob = zlib.compress(blob, 1)
                entries.append((f"{name}/{i}.{j}", blob))
    return _tar_build(entries)


_COLS = ["n_arrays", "total_elements", "expected_chunks",
         "present_chunks", "chunks_complete", "dtypes", "codecs"]
_SCHEMA = (
    "doc_id bigint, n_arrays int, total_elements bigint, "
    "expected_chunks int, present_chunks int, chunks_complete boolean, "
    "dtypes string, codecs string"
)


def zarr_census_frame(df, id_col="doc_id", payload_col="payload"):
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_zarr_store, _COLS, _SCHEMA,
                              id_col, payload_col)


def zarr_census_roundtrip(spark, sf_dir: str):
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_zarr_store,
                           parse_zarr_store, _COLS, _SCHEMA)


ZARR_CENSUS_ORACLE = """
WITH d0 AS (
  SELECT doc_id, doc_id AS d FROM documents
  WHERE doc_id % 17 <> 15 AND doc_id % 13 <> 3 AND doc_id % 23 <> 6
),
a AS (
  SELECT d0.doc_id, d0.d,
         CAST(1 + d0.d % 2 AS INT) AS n_arrays,
         (8 + d0.d % 5) * 6 AS el_per,
         ((8 + d0.d % 5 + 3) // 4) * 2 AS grid_per
  FROM d0
)
SELECT d.doc_id,
       a.n_arrays,
       CAST(a.el_per * a.n_arrays AS BIGINT) AS total_elements,
       CAST(a.grid_per * a.n_arrays AS INT) AS expected_chunks,
       CAST(a.grid_per * a.n_arrays
            - CASE WHEN d.doc_id % 7 = 3 THEN 1 ELSE 0 END AS INT)
         AS present_chunks,
       CASE WHEN a.doc_id IS NULL THEN NULL
            ELSE d.doc_id % 7 <> 3 END AS chunks_complete,
       CASE WHEN a.doc_id IS NULL THEN NULL
            ELSE CASE d.doc_id % 3 WHEN 0 THEN '<f4'
                 WHEN 1 THEN '<i8' ELSE '|u1' END END AS dtypes,
       CASE WHEN a.doc_id IS NULL THEN NULL
            WHEN d.doc_id % 2 = 0 THEN 'zlib' ELSE 'raw' END AS codecs
FROM documents d LEFT JOIN a USING (doc_id) ORDER BY d.doc_id
"""
