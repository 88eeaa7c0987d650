"""Tensor-container blob censuses: safetensors and NumPy .npy/.npz.

A training-data lake does not hold only documents — it holds the
tensors derived from them: embedding shards, tokenized arrays,
checkpoint fragments. The two open containers that dominate are
safetensors (the HF checkpoint/shard format: an 8-byte LE header
length, a JSON header mapping tensor name -> dtype/shape/
data_offsets, then one flat byte buffer) and NumPy's .npy (magic +
version + a Python-literal header dict) with .npz as a zip of .npy
members (walked by the C66 archive layer, so CRCs verify for real).

Census, not decode: the planner's questions are how many tensors,
how many parameters, which dtypes, how many bytes — all answerable
from the headers. The safetensors walk VALIDATES the layout the way
the reference implementation does: offsets must be monotone,
non-overlapping, starting at 0, ending exactly at the buffer's end,
and each tensor's byte span must equal product(shape) x dtype size —
a header that lies about any of it rejects whole (an offset lie is
how a malicious checkpoint reads out of bounds).

Reference parity note: the reference engine (SURVEY §1) has no
tensor-container handling; mandated LLM-pipeline extension surface
like multimodal/parquetblob.py.
"""

from __future__ import annotations

import ast
import json
import struct
from typing import Optional

__all__ = [
    "parse_safetensors",
    "synth_safetensors",
    "parse_npy",
    "synth_npy",
    "synth_npz",
    "safetensors_census_frame",
    "safetensors_census_roundtrip",
    "npy_census_frame",
    "npy_census_roundtrip",
    "SAFETENSORS_CENSUS_ORACLE",
    "NPY_CENSUS_ORACLE",
]

_MAX_HEADER = 100 * 1024 * 1024  # the reference impl's 100 MB cap

_DTYPE_BYTES = {
    "F64": 8, "F32": 4, "F16": 2, "BF16": 2,
    "I64": 8, "I32": 4, "I16": 2, "I8": 1, "U8": 1, "BOOL": 1,
}


def parse_safetensors(payload: bytes) -> Optional[dict]:
    p = bytes(payload) if payload is not None else b""
    if len(p) < 8:
        return None
    (hlen,) = struct.unpack("<Q", p[:8])
    if hlen == 0 or hlen > _MAX_HEADER or 8 + hlen > len(p):
        return None
    try:
        header = json.loads(p[8 : 8 + hlen].decode("utf-8"))
    except (UnicodeDecodeError, ValueError):
        return None
    if not isinstance(header, dict):
        return None
    buf_len = len(p) - 8 - hlen
    meta = header.pop("__metadata__", None)
    if meta is not None and not (
        isinstance(meta, dict)
        and all(isinstance(k, str) and isinstance(v, str) for k, v in meta.items())
    ):
        return None
    spans = []
    total_params = 0
    dtypes = set()
    try:
        for name, t in header.items():
            dtype = t["dtype"]
            shape = t["shape"]
            b0, b1 = t["data_offsets"]
            if dtype not in _DTYPE_BYTES:
                return None
            if not all(isinstance(s, int) and s >= 0 for s in shape):
                return None
            params = 1
            for s in shape:
                params *= s
            if b1 - b0 != params * _DTYPE_BYTES[dtype]:
                return None  # the header lies about the tensor's span
            spans.append((b0, b1))
            total_params += params
            dtypes.add(dtype)
    except (KeyError, TypeError, ValueError):
        return None
    spans.sort()
    pos = 0
    for b0, b1 in spans:
        if b0 != pos or b1 < b0:
            return None  # gap or overlap: the layout is not the spec's
        pos = b1
    if pos != buf_len:
        return None  # trailing or missing buffer bytes
    return {
        "n_tensors": len(spans),
        "total_params": total_params,
        "data_bytes": buf_len,
        "dtypes": "/".join(sorted(dtypes)) if dtypes else None,
        "n_metadata": len(meta) if meta is not None else 0,
    }


# ---------------------------------------------------------------- .npy

_NPY_MAGIC = b"\x93NUMPY"

# numpy descr -> element size for the census subset (native-endian
# or explicit little/big endian markers)
_NPY_DESCR = {
    "f8": 8, "f4": 4, "f2": 2, "i8": 8, "i4": 4, "i2": 2,
    "i1": 1, "u1": 1, "b1": 1,
}


def parse_npy(payload: bytes) -> Optional[dict]:
    """One .npy header: dtype / shape / order, sizes validated against
    the actual payload length (a truncated array rejects whole)."""
    p = bytes(payload) if payload is not None else b""
    if len(p) < 10 or p[:6] != _NPY_MAGIC:
        return None
    major, _minor = p[6], p[7]
    if major == 1:
        (hlen,) = struct.unpack("<H", p[8:10])
        hstart = 10
    elif major in (2, 3):
        if len(p) < 12:
            return None
        (hlen,) = struct.unpack("<I", p[8:12])
        hstart = 12
    else:
        return None
    if hstart + hlen > len(p):
        return None
    try:
        hdr = ast.literal_eval(p[hstart : hstart + hlen].decode("latin-1").strip())
    except (ValueError, SyntaxError):
        return None
    if not isinstance(hdr, dict):
        return None
    try:
        descr = hdr["descr"]
        fortran = bool(hdr["fortran_order"])
        shape = tuple(hdr["shape"])
    except (KeyError, TypeError):
        return None
    if not isinstance(descr, str) or descr.lstrip("<>|=") not in _NPY_DESCR:
        return None  # structured/object dtypes: not a census subject
    if not all(isinstance(s, int) and s >= 0 for s in shape):
        return None
    itemsize = _NPY_DESCR[descr.lstrip("<>|=")]
    n = 1
    for s in shape:
        n *= s
    if len(p) - hstart - hlen != n * itemsize:
        return None  # truncated or padded data
    return {
        "dtype": descr.lstrip("<>|="),
        "ndim": len(shape),
        "n_elements": n,
        "data_bytes": n * itemsize,
        "fortran_order": fortran,
        "npy_version": major,
    }


def parse_npz(payload: bytes) -> Optional[dict]:
    """A .npz is a zip of .npy members: the C66 archive walk verifies
    CRCs and sizes, then every member must parse as .npy (an archive
    claiming the extension with a non-npy member rejects whole)."""
    from danae_spark.multimodal.archive import iter_archive_members

    members = []
    try:
        for name, is_dir, data in iter_archive_members(payload):
            if is_dir:
                continue
            if not name.endswith(".npy"):
                return None
            r = parse_npy(data)
            if r is None:
                return None
            members.append(r)
    except Exception:
        return None
    if not members:
        return None
    return {
        "n_arrays": len(members),
        "total_elements": sum(m["n_elements"] for m in members),
        "total_bytes": sum(m["data_bytes"] for m in members),
        "dtypes": "/".join(sorted({m["dtype"] for m in members})),
        "max_ndim": max(m["ndim"] for m in members),
    }


# ------------------------------------------------------------- synthesis
#
# safetensors grid (restated in SAFETENSORS_CENSUS_ORACLE):
#   T = 1 + d % 4 tensors "t{j}": dtype [F32, F16, I8][(d + j) % 3],
#   shape (2 + d % 3, 1 + (d + j) % 4) -> params = rows * cols
#   __metadata__ present when d % 5 == 2, with 1 + d % 2 keys
#   rejects: d % 17 == 3 header-length lie; d % 13 == 6 shifted layout
#   (gap at 0 / trailing overhang); d % 23 == 9 span/shape mismatch


def st_n_tensors(d: int) -> int:
    return 1 + d % 4


def st_tensor(d: int, j: int) -> tuple[str, int, int]:
    dtype = ["F32", "F16", "I8"][(d + j) % 3]
    return dtype, 2 + d % 3, 1 + (d + j) % 4


def synth_safetensors(d: int) -> bytes:
    header: dict = {}
    pos = 0
    for j in range(st_n_tensors(d)):
        dtype, rows, cols = st_tensor(d, j)
        nbytes = rows * cols * _DTYPE_BYTES[dtype]
        b0, b1 = pos, pos + nbytes
        if d % 13 == 6 and j == 0:
            b0, b1 = b0 + 1, b1 + 1  # span intact, layout starts at 1
        header[f"t{j}"] = {
            "dtype": dtype,
            "shape": [rows, cols],
            "data_offsets": [b0, b1],
        }
        if d % 23 == 9 and j == 0:
            header[f"t{j}"]["shape"] = [rows, cols + 1]  # span lie
        pos += nbytes
    if d % 5 == 2:
        header["__metadata__"] = {
            f"k{i}": f"v{d % 7}" for i in range(1 + d % 2)
        }
    hjson = json.dumps(header, sort_keys=True).encode("utf-8")
    hlen = len(hjson)
    if d % 17 == 3:
        hlen += 10_000  # claims a header past the payload
    return struct.pack("<Q", hlen) + hjson + bytes(pos)


# .npy / .npz grid (restated in NPY_CENSUS_ORACLE): even docs are one
# .npy (dtype [f4, i8, u1][d % 3] via (d//2) arithmetic below, shape
# (3 + d % 4, 2 + d % 3)); odd docs are a .npz of 1 + d % 3 members.
#   rejects: d % 19 == 7 truncated data; d % 29 == 11 corrupted magic


def _npy_bytes(dtype: str, shape: tuple[int, ...], version: int = 1) -> bytes:
    import numpy as np

    arr = np.zeros(shape, dtype=dtype)
    hdr_dict = {
        "descr": arr.dtype.str,
        "fortran_order": False,
        "shape": shape,
    }
    body = repr(hdr_dict).encode("latin-1")
    if version == 1:
        pad = (64 - (10 + len(body) + 1) % 64) % 64
        header = body + b" " * pad + b"\n"
        return _NPY_MAGIC + bytes((1, 0)) + struct.pack("<H", len(header)) \
            + header + arr.tobytes()
    pad = (64 - (12 + len(body) + 1) % 64) % 64
    header = body + b" " * pad + b"\n"
    return _NPY_MAGIC + bytes((2, 0)) + struct.pack("<I", len(header)) \
        + header + arr.tobytes()


def npy_dtype(d: int) -> str:
    return ["f4", "i8", "u1"][d % 3]


def synth_npy(d: int) -> bytes:
    raw = bytearray(
        _npy_bytes(npy_dtype(d), (3 + d % 4, 2 + d % 3),
                   version=2 if d % 7 == 1 else 1)
    )
    if d % 19 == 7:
        raw = raw[:-3]  # truncated data
    if d % 29 == 11:
        raw[0] ^= 0xFF
    return bytes(raw)


def synth_npz(d: int) -> bytes:
    from danae_spark.multimodal.archive import _zip_build

    members = []
    for j in range(1 + d % 3):
        members.append(
            (f"arr_{j}.npy",
             _npy_bytes(npy_dtype(d + j), (2 + (d + j) % 3, 1 + j)), 0)
        )
    if d % 19 == 7:
        # one member is not an .npy: the whole npz rejects
        members.append(("notes.txt", b"stray member", 0))
    blob = bytearray(_zip_build(members))
    if d % 29 == 11:
        blob[0] ^= 0xFF
    return bytes(blob)


# ----------------------------------------------------- Spark entry points

_ST_COLS = ["n_tensors", "total_params", "data_bytes", "dtypes",
            "n_metadata"]
_ST_SCHEMA = (
    "doc_id bigint, n_tensors int, total_params bigint, "
    "data_bytes bigint, dtypes string, n_metadata int"
)


def safetensors_census_frame(df, id_col="doc_id", payload_col="payload"):
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_safetensors, _ST_COLS, _ST_SCHEMA,
                              id_col, payload_col)


def safetensors_census_roundtrip(spark, sf_dir: str):
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_safetensors,
                           parse_safetensors, _ST_COLS, _ST_SCHEMA)


# unified npy/npz census row: even docs census a single .npy as a
# 1-array container, odd docs a .npz
_NP_COLS = ["container", "n_arrays", "total_elements", "total_bytes",
            "dtypes", "max_ndim"]
_NP_SCHEMA = (
    "doc_id bigint, container string, n_arrays int, "
    "total_elements bigint, total_bytes bigint, dtypes string, max_ndim int"
)


def _parse_np_any(payload: bytes) -> Optional[dict]:
    if payload[:6] == _NPY_MAGIC:
        r = parse_npy(payload)
        if r is None:
            return None
        return {
            "container": "npy",
            "n_arrays": 1,
            "total_elements": r["n_elements"],
            "total_bytes": r["data_bytes"],
            "dtypes": r["dtype"],
            "max_ndim": r["ndim"],
        }
    r = parse_npz(payload)
    if r is None:
        return None
    return {"container": "npz", **r}


def npy_census_frame(df, id_col="doc_id", payload_col="payload"):
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, _parse_np_any, _NP_COLS, _NP_SCHEMA,
                              id_col, payload_col)


def _synth_np(d: int) -> bytes:
    return synth_npy(d) if d % 2 == 0 else synth_npz(d)


def npy_census_roundtrip(spark, sf_dir: str):
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, _synth_np, _parse_np_any,
                           _NP_COLS, _NP_SCHEMA)


_ST_DTYPE_SQL = "CASE (d + {j}) % 3 WHEN 0 THEN 'F32' WHEN 1 THEN 'F16' ELSE 'I8' END"

SAFETENSORS_CENSUS_ORACLE = """
WITH d0 AS (
  SELECT doc_id, doc_id AS d FROM documents
  WHERE doc_id % 17 <> 3 AND doc_id % 13 <> 6 AND doc_id % 23 <> 9
),
t AS (
  SELECT d0.doc_id, d0.d, j.j,
         (2 + d0.d % 3) * (1 + (d0.d + j.j) % 4) AS params,
         CASE (d0.d + j.j) % 3 WHEN 0 THEN 'F32'
              WHEN 1 THEN 'F16' ELSE 'I8' END AS dtype,
         CASE (d0.d + j.j) % 3 WHEN 0 THEN 4 WHEN 1 THEN 2 ELSE 1 END
           AS esize
  FROM d0 JOIN generate_series(0, 3) j(j) ON j.j < 1 + d0.d % 4
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS INT) AS n_tensors,
         CAST(SUM(params) AS BIGINT) AS total_params,
         CAST(SUM(params * esize) AS BIGINT) AS data_bytes,
         string_agg(DISTINCT dtype, '/' ORDER BY dtype) AS dtypes
  FROM t GROUP BY doc_id
)
SELECT d.doc_id,
       agg.n_tensors,
       agg.total_params,
       agg.data_bytes,
       agg.dtypes,
       CAST(CASE WHEN agg.doc_id IS NULL THEN NULL
            WHEN d.doc_id % 5 = 2 THEN 1 + d.doc_id % 2
            ELSE 0 END AS INT) AS n_metadata
FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id
"""

NPY_CENSUS_ORACLE = """
WITH d0 AS (
  SELECT doc_id, doc_id AS d FROM documents
  WHERE doc_id % 19 <> 7 AND doc_id % 29 <> 11
),
npy AS (
  SELECT doc_id, 'npy' AS container, 1 AS n_arrays,
         (3 + d % 4) * (2 + d % 3) AS elements,
         (3 + d % 4) * (2 + d % 3)
           * (CASE d % 3 WHEN 0 THEN 4 WHEN 1 THEN 8 ELSE 1 END) AS bytes,
         CASE d % 3 WHEN 0 THEN 'f4' WHEN 1 THEN 'i8' ELSE 'u1' END
           AS dtypes,
         2 AS max_ndim
  FROM d0 WHERE d % 2 = 0
),
npzm AS (
  SELECT d0.doc_id, d0.d, j.j,
         (2 + (d0.d + j.j) % 3) * (1 + j.j) AS elements,
         (2 + (d0.d + j.j) % 3) * (1 + j.j)
           * (CASE (d0.d + j.j) % 3 WHEN 0 THEN 4 WHEN 1 THEN 8 ELSE 1 END)
           AS bytes,
         CASE (d0.d + j.j) % 3 WHEN 0 THEN 'f4' WHEN 1 THEN 'i8'
              ELSE 'u1' END AS dtype
  FROM d0 JOIN generate_series(0, 2) j(j) ON j.j < 1 + d0.d % 3
  WHERE d0.d % 2 = 1
),
npz AS (
  SELECT doc_id, 'npz' AS container,
         CAST(COUNT(*) AS INT) AS n_arrays,
         SUM(elements) AS elements, SUM(bytes) AS bytes,
         string_agg(DISTINCT dtype, '/' ORDER BY dtype) AS dtypes,
         2 AS max_ndim
  FROM npzm GROUP BY doc_id
),
u AS (
  SELECT doc_id, container, n_arrays, elements, bytes, dtypes, max_ndim
  FROM npy
  UNION ALL
  SELECT doc_id, container, n_arrays, elements, bytes, dtypes, max_ndim
  FROM npz
)
SELECT d.doc_id,
       u.container,
       CAST(u.n_arrays AS INT) AS n_arrays,
       CAST(u.elements AS BIGINT) AS total_elements,
       CAST(u.bytes AS BIGINT) AS total_bytes,
       u.dtypes,
       CAST(u.max_ndim AS INT) AS max_ndim
FROM documents d LEFT JOIN u USING (doc_id) ORDER BY d.doc_id
"""


# ------------------------------------------------------ Arrow IPC census
#
# The Arrow IPC container (file format with the ARROW1 magic frame, or
# the bare stream format) is how dataset shards ship in practice —
# census via pyarrow, the format's canonical implementation (the C128
# parquet-census precedent: the engine's own walk over its metadata).
#
# Grid (restated in ARROW_CENSUS_ORACLE):
#   format  file (even d) / stream (odd d)
#   cols    2 + d % 2 (c0 int64, c1 string, + c2 double)
#   rows    10 + d % 7, written in batches of 4 + d % 3
#   reject  d % 21 == 11 (corrupted leading bytes)


def parse_arrow_blob(payload: bytes) -> Optional[dict]:
    import pyarrow as pa

    p = bytes(payload) if payload is not None else b""
    if len(p) < 8:
        return None
    fmt = None
    try:
        if p[:6] == b"ARROW1":
            reader = pa.ipc.open_file(pa.BufferReader(p))
            fmt = "file"
            n_batches = reader.num_record_batches
            batches = [reader.get_batch(i) for i in range(n_batches)]
            schema = reader.schema
        else:
            reader = pa.ipc.open_stream(pa.BufferReader(p))
            fmt = "stream"
            batches = list(reader)
            schema = reader.schema
    except (pa.ArrowException, OSError, ValueError):
        # ArrowException is the base: a mutated stream can surface
        # Invalid, NotImplemented, or Capacity errors — all quarantine
        return None
    return {
        "format": fmt,
        "n_batches": len(batches),
        "n_rows": sum(b.num_rows for b in batches),
        "n_cols": len(schema.names),
        "columns": "/".join(schema.names),
    }


def synth_arrow(d: int) -> bytes:
    import io

    import pyarrow as pa

    n = 10 + d % 7
    cols = {"c0": pa.array([(d * 3 + i) % 100 for i in range(n)], pa.int64()),
            "c1": pa.array([f"s{(d + i) % 9}" for i in range(n)])}
    if (2 + d % 2) >= 3:
        cols["c2"] = pa.array([float((d + i) % 5) for i in range(n)])
    table = pa.table(cols)
    sink = io.BytesIO()
    opener = pa.ipc.new_file if d % 2 == 0 else pa.ipc.new_stream
    with opener(sink, table.schema) as w:
        step = 4 + d % 3
        for off in range(0, n, step):
            w.write_table(table.slice(off, step))
    raw = bytearray(sink.getvalue())
    if d % 21 == 11:
        raw[0] ^= 0xFF
    return bytes(raw)


_AR_COLS = ["format", "n_batches", "n_rows", "n_cols", "columns"]
_AR_SCHEMA = (
    "doc_id bigint, format string, n_batches int, n_rows int, "
    "n_cols int, columns string"
)


def arrow_census_frame(df, id_col="doc_id", payload_col="payload"):
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_arrow_blob, _AR_COLS, _AR_SCHEMA,
                              id_col, payload_col)


def arrow_census_roundtrip(spark, sf_dir: str):
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_arrow, parse_arrow_blob,
                           _AR_COLS, _AR_SCHEMA)


ARROW_CENSUS_ORACLE = """
WITH d0 AS (
  SELECT doc_id, doc_id AS d FROM documents WHERE doc_id % 21 <> 11
)
SELECT d.doc_id,
       CASE WHEN d0.doc_id IS NULL THEN NULL
            WHEN d.doc_id % 2 = 0 THEN 'file' ELSE 'stream' END AS format,
       CAST(CASE WHEN d0.doc_id IS NULL THEN NULL
            ELSE (10 + d.doc_id % 7 + (4 + d.doc_id % 3) - 1)
                 // (4 + d.doc_id % 3) END AS INT) AS n_batches,
       CAST(CASE WHEN d0.doc_id IS NULL THEN NULL
            ELSE 10 + d.doc_id % 7 END AS INT) AS n_rows,
       CAST(CASE WHEN d0.doc_id IS NULL THEN NULL
            ELSE 2 + d.doc_id % 2 END AS INT) AS n_cols,
       CASE WHEN d0.doc_id IS NULL THEN NULL
            WHEN d.doc_id % 2 = 0 THEN 'c0/c1' ELSE 'c0/c1/c2' END
         AS columns
FROM documents d LEFT JOIN d0 USING (doc_id) ORDER BY d.doc_id
"""


# --------------------------------------------------------- GGUF census
#
# GGUF (the llama.cpp model container; public spec in the ggml docs):
# "GGUF" magic, u32 version, u64 tensor_count, u64 metadata_kv_count;
# metadata kvs (u64-length keys, typed values incl. typed arrays);
# tensor infos (name, u32 n_dims, u64 dims, u32 ggml type, u64 offset
# into the data section); data starts at the header end aligned to
# general.alignment (default 32) and every tensor's offset is
# RELATIVE to that base, itself aligned.
#
# Census with layout validation over the quantization subset
# [F32, F16, Q8_0, Q4_0] (block sizes 1/1/32/32, type sizes 4/2/34/18
# bytes per block): offsets must be aligned and tile the data section
# in order — the safetensors discipline, because a model blob with a
# lying offset reads out of bounds the same way. Unknown ggml types
# reject whole (their byte math is unknowable).
#
# Grid (restated in GGUF_CENSUS_ORACLE):
#   T = 1 + d % 4 tensors: dims (32 * (1 + d % 3), 1 + (d + t) % 4),
#   type [F32, F16, Q8_0, Q4_0][(d + t) % 4]
#   kv: general.architecture = [llama, gpt2, phi][d % 3],
#       general.alignment = 32, plus 1 + d % 2 extra string kvs
#   rejects: d % 13 == 9 misaligned offset; d % 19 == 10 truncated
#   data; d % 23 == 15 unknown ggml type

_GGUF_MAGIC = b"GGUF"
# ggml type id -> (block elements, block bytes)
_GGML_TYPES = {0: (1, 4), 1: (1, 2), 8: (32, 34), 2: (32, 18)}
_GGML_NAMES = {0: "F32", 1: "F16", 8: "Q8_0", 2: "Q4_0"}
_GGUF_ALIGN = 32

_GV_U8, _GV_I8, _GV_U16, _GV_I16 = 0, 1, 2, 3
_GV_U32, _GV_I32, _GV_F32, _GV_BOOL = 4, 5, 6, 7
_GV_STR, _GV_ARR, _GV_U64, _GV_I64, _GV_F64 = 8, 9, 10, 11, 12

_GV_SCALAR = {
    _GV_U8: ("<B", 1), _GV_I8: ("<b", 1), _GV_U16: ("<H", 2),
    _GV_I16: ("<h", 2), _GV_U32: ("<I", 4), _GV_I32: ("<i", 4),
    _GV_F32: ("<f", 4), _GV_BOOL: ("<B", 1), _GV_U64: ("<Q", 8),
    _GV_I64: ("<q", 8), _GV_F64: ("<d", 8),
}


def _g_str(buf: bytes, pos: int) -> tuple[str, int]:
    (n,) = struct.unpack_from("<Q", buf, pos)
    pos += 8
    if pos + n > len(buf):
        raise ValueError("string past EOF")
    return buf[pos : pos + n].decode("utf-8"), pos + n


def _g_value(buf: bytes, pos: int, vtype: int):
    if vtype == _GV_STR:
        return _g_str(buf, pos)
    if vtype == _GV_ARR:
        (atype,) = struct.unpack_from("<I", buf, pos)
        (count,) = struct.unpack_from("<Q", buf, pos + 4)
        pos += 12
        out = []
        for _ in range(count):
            v, pos = _g_value(buf, pos, atype)
            out.append(v)
        return out, pos
    if vtype in _GV_SCALAR:
        fmt, size = _GV_SCALAR[vtype]
        (v,) = struct.unpack_from(fmt, buf, pos)
        if vtype == _GV_BOOL:
            v = bool(v)
        return v, pos + size
    raise ValueError(f"unknown gguf value type {vtype}")


def parse_gguf(payload: bytes) -> Optional[dict]:
    p = bytes(payload) if payload is not None else b""
    if len(p) < 24 or p[:4] != _GGUF_MAGIC:
        return None
    try:
        (version,) = struct.unpack_from("<I", p, 4)
        if version not in (2, 3):
            return None  # v1's 32-bit counts are a different wire format
        (n_tensors,) = struct.unpack_from("<Q", p, 8)
        (n_kv,) = struct.unpack_from("<Q", p, 16)
        if n_tensors > 1_000_000 or n_kv > 1_000_000:
            return None
        pos = 24
        meta: dict = {}
        for _ in range(n_kv):
            key, pos = _g_str(p, pos)
            (vtype,) = struct.unpack_from("<I", p, pos)
            val, pos = _g_value(p, pos + 4, vtype)
            meta[key] = val
        align = meta.get("general.alignment", _GGUF_ALIGN)
        if not isinstance(align, int) or align <= 0 or align & (align - 1):
            return None  # alignment must be a positive power of two
        infos = []
        total_params = 0
        qtypes = set()
        for _ in range(n_tensors):
            name, pos = _g_str(p, pos)
            (nd,) = struct.unpack_from("<I", p, pos)
            pos += 4
            if nd == 0 or nd > 8:
                return None
            dims = struct.unpack_from(f"<{nd}Q", p, pos)
            pos += 8 * nd
            (ttype,) = struct.unpack_from("<I", p, pos)
            (off,) = struct.unpack_from("<Q", p, pos + 4)
            pos += 12
            if ttype not in _GGML_TYPES:
                return None  # unknown quantization: byte math unknowable
            blk, blk_bytes = _GGML_TYPES[ttype]
            n = 1
            for s in dims:
                n *= s
            if n % blk:
                return None  # a quantized tensor must fill whole blocks
            infos.append((off, n // blk * blk_bytes, name))
            total_params += n
            qtypes.add(_GGML_NAMES[ttype])
        data_start = (pos + align - 1) // align * align
        infos.sort()
        expect_off = 0
        for off, nbytes, _name in infos:
            if off != expect_off or off % align:
                return None  # gap/overlap/misalignment in the data plan
            expect_off = (off + nbytes + align - 1) // align * align
        data_len = len(p) - data_start
        used = infos[-1][0] + infos[-1][1] if infos else 0
        if infos:
            if data_len < used or data_len > expect_off:
                return None  # truncated or overlong data section
        elif data_len != 0:
            return None
    except (struct.error, ValueError, UnicodeDecodeError, OverflowError):
        return None
    arch = meta.get("general.architecture")
    return {
        "version": version,
        "n_tensors": n_tensors,
        "n_kv": n_kv,
        "total_params": total_params,
        "data_bytes": used,
        "architecture": arch if isinstance(arch, str) else None,
        "quant_types": "/".join(sorted(qtypes)) if qtypes else None,
    }


def _g_kv_str(key: str, val: str) -> bytes:
    k = key.encode()
    v = val.encode()
    return (struct.pack("<Q", len(k)) + k + struct.pack("<I", _GV_STR)
            + struct.pack("<Q", len(v)) + v)


def _g_kv_u32(key: str, val: int) -> bytes:
    k = key.encode()
    return (struct.pack("<Q", len(k)) + k
            + struct.pack("<I", _GV_U32) + struct.pack("<I", val))


def gguf_arch(d: int) -> str:
    return ["llama", "gpt2", "phi"][d % 3]


def synth_gguf(d: int) -> bytes:
    T = 1 + d % 4
    kvs = [_g_kv_str("general.architecture", gguf_arch(d)),
           _g_kv_u32("general.alignment", _GGUF_ALIGN)]
    for i in range(1 + d % 2):
        kvs.append(_g_kv_str(f"meta.k{i}", f"v{d % 7}"))
    infos = b""
    off = 0
    sizes = []
    for t in range(T):
        rows, cols = 32 * (1 + d % 3), 1 + (d + t) % 4
        ttype = [0, 1, 8, 2][(d + t) % 4]
        if d % 23 == 15 and t == 0:
            ttype = 77  # a quantization this walk does not know
        blk, blk_bytes = _GGML_TYPES.get(ttype, (32, 34))
        nbytes = rows * cols // blk * blk_bytes
        this_off = off
        if d % 13 == 9 and t == 0:
            this_off += 1  # misaligned / overlapping layout
        name = f"blk.{t}.weight".encode()
        infos += (struct.pack("<Q", len(name)) + name
                  + struct.pack("<I", 2) + struct.pack("<QQ", rows, cols)
                  + struct.pack("<I", ttype) + struct.pack("<Q", this_off))
        sizes.append(nbytes)
        off = (off + nbytes + _GGUF_ALIGN - 1) // _GGUF_ALIGN * _GGUF_ALIGN
    header = (_GGUF_MAGIC + struct.pack("<I", 3)
              + struct.pack("<Q", T) + struct.pack("<Q", len(kvs))
              + b"".join(kvs) + infos)
    data_start = (len(header) + _GGUF_ALIGN - 1) // _GGUF_ALIGN * _GGUF_ALIGN
    # data section: zero-filled through the LAST tensor's end, unpadded
    # (the spec pads BETWEEN tensors; the file may end at the last byte)
    last_start = off - ((sizes[-1] + _GGUF_ALIGN - 1) // _GGUF_ALIGN
                        * _GGUF_ALIGN) if T else 0
    last_end = last_start + sizes[-1] if T else 0
    raw = bytearray(header + bytes(data_start - len(header)) + bytes(last_end))
    if d % 19 == 10:
        raw = raw[:-5]  # truncated data section
    return bytes(raw)


# Per-tensor bytes: n = 32*(1+d%3) * (1+(d+t)%4) elements; F32 n*4,
# F16 n*2, Q8_0 n/32*34, Q4_0 n/32*18. The data section aligns to 32
# BETWEEN tensors and ends unpadded, so data_bytes = sum of padded
# sizes for all but the last tensor + the last raw size.
GGUF_CENSUS_ORACLE = """
WITH d0 AS (
  SELECT doc_id, doc_id AS d FROM documents
  WHERE doc_id % 13 <> 9 AND doc_id % 19 <> 10 AND doc_id % 23 <> 15
),
t AS (
  SELECT d0.doc_id, d0.d, j.t,
         32 * (1 + d0.d % 3) * (1 + (d0.d + j.t) % 4) AS n,
         (d0.d + j.t) % 4 AS tt,
         1 + d0.d % 4 AS tc
  FROM d0 JOIN generate_series(0, 3) j(t) ON j.t < 1 + d0.d % 4
),
tb AS (
  SELECT doc_id, d, t, n, tc,
         CASE tt WHEN 0 THEN n * 4 WHEN 1 THEN n * 2
              WHEN 2 THEN n // 32 * 34 ELSE n // 32 * 18 END AS nb,
         CASE tt WHEN 0 THEN 'F32' WHEN 1 THEN 'F16'
              WHEN 2 THEN 'Q8_0' ELSE 'Q4_0' END AS qt
  FROM t
),
agg AS (
  SELECT doc_id,
         CAST(SUM(n) AS BIGINT) AS total_params,
         CAST(SUM(CASE WHEN t < tc - 1
                       THEN (nb + 31) // 32 * 32 ELSE nb END) AS BIGINT)
           AS data_bytes,
         string_agg(DISTINCT qt, '/' ORDER BY qt) AS quant_types
  FROM tb GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(CASE WHEN d0.doc_id IS NULL THEN NULL ELSE 3 END AS INT)
         AS version,
       CAST(CASE WHEN d0.doc_id IS NULL THEN NULL
            ELSE 1 + d.doc_id % 4 END AS INT) AS n_tensors,
       CAST(CASE WHEN d0.doc_id IS NULL THEN NULL
            ELSE 3 + d.doc_id % 2 END AS INT) AS n_kv,
       agg.total_params,
       agg.data_bytes,
       CASE WHEN d0.doc_id IS NULL THEN NULL
            ELSE CASE d.doc_id % 3 WHEN 0 THEN 'llama'
                 WHEN 1 THEN 'gpt2' ELSE 'phi' END END AS architecture,
       agg.quant_types
FROM documents d
LEFT JOIN d0 USING (doc_id)
LEFT JOIN agg USING (doc_id)
ORDER BY d.doc_id
"""

_GG_COLS = ["version", "n_tensors", "n_kv", "total_params", "data_bytes",
            "architecture", "quant_types"]
_GG_SCHEMA = (
    "doc_id bigint, version int, n_tensors int, n_kv int, "
    "total_params bigint, data_bytes bigint, architecture string, "
    "quant_types string"
)


def gguf_census_frame(df, id_col="doc_id", payload_col="payload"):
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_gguf, _GG_COLS, _GG_SCHEMA,
                              id_col, payload_col)


def gguf_census_roundtrip(spark, sf_dir: str):
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_gguf, parse_gguf,
                           _GG_COLS, _GG_SCHEMA)
