"""Per-blob Avro object-container census — the other lake container.

Avro object-container files (magic `Obj\\x01`, Avro 1.11 spec) are,
with parquet, the ubiquitous row-oriented lake format; the blob-census
layer (csv/json/parquet/sqlite/access-log/chat, r14) lacked it. This
module walks the container from the spec:

  - file metadata map (zigzag-varint block counts, negative-count
    blocks with byte sizes per the map encoding), `avro.schema` parsed
    as JSON (record name + field count censused; non-record top-level
    types report the type string), `avro.codec` defaulting to null;
  - the 16-byte sync marker, then data blocks: record count, byte
    size, payload, sync — EVERY block's sync must equal the header's
    (that is the container's corruption detection, and the census
    enforces it);
  - codecs: null (verbatim) and deflate (raw DEFLATE, RFC 1951 — the
    two codecs the spec requires); payloads are actually decompressed
    so a corrupt deflate stream rejects instead of censusing;
  - reject-whole: bad magic, malformed metadata, unparseable schema
    JSON, unknown codec (snappy/zstd without their optional support —
    never census what you could not read), sync mismatch, truncated
    or trailing bytes, decompression-bomb budget.

Census row: codec, schema_name, n_fields, n_blocks, n_records,
total_payload (decompressed bytes across blocks).
"""

from __future__ import annotations

import json
import zlib
from typing import Optional

__all__ = [
    "parse_avro_blob",
    "synth_avro",
    "avro_census_frame",
    "avro_census_roundtrip",
    "AVRO_CENSUS_ORACLE",
]

_MAGIC = b"Obj\x01"
_MAX_PAYLOAD = 1 << 30  # bomb guard


class _Bad(Exception):
    pass


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    """Zigzag varint long; (value, next_pos)."""
    shift = 0
    acc = 0
    while True:
        if pos >= len(data) or shift > 63:
            raise _Bad
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _read_bytes(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(data, pos)
    if n < 0 or pos + n > len(data):
        raise _Bad
    return data[pos : pos + n], pos + n


def parse_avro_blob(payload: bytes) -> Optional[dict]:
    try:
        return _parse(payload)
    except (_Bad, ValueError, zlib.error, UnicodeDecodeError):
        return None


def _parse(payload: bytes) -> Optional[dict]:
    if len(payload) < 4 or payload[:4] != _MAGIC:
        return None
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = _read_long(payload, pos)
        if count == 0:
            break
        if count < 0:
            # negative map-block count: abs(count) entries preceded by
            # a byte size (spec's skippable-block form)
            _size, pos = _read_long(payload, pos)
            count = -count
        if count > 1024:
            raise _Bad
        for _ in range(count):
            key, pos = _read_bytes(payload, pos)
            val, pos = _read_bytes(payload, pos)
            meta[key.decode("utf-8")] = val
    if "avro.schema" not in meta:
        raise _Bad
    schema = json.loads(meta["avro.schema"])
    if isinstance(schema, dict) and schema.get("type") == "record":
        name = schema.get("name")
        fields = schema.get("fields")
        if not isinstance(name, str) or not isinstance(fields, list):
            raise _Bad
        schema_name, n_fields = name, len(fields)
    elif isinstance(schema, str):
        schema_name, n_fields = schema, 0
    elif isinstance(schema, dict) and isinstance(schema.get("type"), str):
        schema_name, n_fields = schema["type"], 0
    else:
        raise _Bad
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        return None  # snappy/zstd: optional codecs we do not ship
    if pos + 16 > len(payload):
        raise _Bad
    sync = payload[pos : pos + 16]
    pos += 16
    n_blocks = 0
    n_records = 0
    total_payload = 0
    while pos < len(payload):
        count, pos = _read_long(payload, pos)
        if count <= 0:
            raise _Bad
        size, pos = _read_long(payload, pos)
        if size < 0 or pos + size + 16 > len(payload):
            raise _Bad
        blob = payload[pos : pos + size]
        pos += size
        if payload[pos : pos + 16] != sync:
            raise _Bad  # the container's per-block corruption check
        pos += 16
        if codec == "deflate":
            # Cap output BEFORE expansion: a small hostile DEFLATE block
            # can blow up ~1000x, so decompress under the remaining
            # payload budget instead of materializing then checking.
            z = zlib.decompressobj(-15)
            data = z.decompress(blob, _MAX_PAYLOAD + 1 - total_payload)
            if z.unconsumed_tail or z.unused_data or not z.eof:
                raise _Bad
        else:
            data = blob
        n_blocks += 1
        n_records += count
        total_payload += len(data)
        if total_payload > _MAX_PAYLOAD:
            raise _Bad
    return {
        "codec": codec,
        "schema_name": schema_name,
        "n_fields": n_fields,
        "n_blocks": n_blocks,
        "n_records": n_records,
        "total_payload": total_payload,
    }


# ----------------------------------------------------------- synthesis
#
# Pure doc_id arithmetic (restated in AVRO_CENSUS_ORACLE):
#   codec   = deflate when d % 2 == 1 else null
#   schema  = record "r{d % 6}" with 1 + d % 4 long fields
#   blocks  = 1 + d % 3; block b carries 2 + (d + b) % 4 records;
#   field values (d + b + f) % 50 zigzag to one varint byte each, so
#   decompressed payload per record == n_fields bytes exactly
#   d % 19 == 7 -> last block's sync marker corrupted (reject leg)


def _write_long(v: int) -> bytes:
    zz = ((-v) << 1) - 1 if v < 0 else v << 1  # zigzag, then 7-bit varint
    out = bytearray()
    while True:
        b = zz & 0x7F
        zz >>= 7
        if zz:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _write_bytes(b: bytes) -> bytes:
    return _write_long(len(b)) + b


def av_n_fields(d: int) -> int:
    return 1 + d % 4


def av_n_blocks(d: int) -> int:
    return 1 + d % 3


def av_block_records(d: int, b: int) -> int:
    return 2 + (d + b) % 4


def synth_avro(d: int) -> bytes:
    n_fields = av_n_fields(d)
    schema = {
        "type": "record",
        "name": f"r{d % 6}",
        "fields": [{"name": f"f{i}", "type": "long"} for i in range(n_fields)],
    }
    codec = "deflate" if d % 2 == 1 else "null"
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    out += _write_long(len(meta))
    for k in sorted(meta):
        out += _write_bytes(k.encode()) + _write_bytes(meta[k])
    out += _write_long(0)
    sync = bytes((d * 7 + i) % 256 for i in range(16))
    out += sync
    n_blocks = av_n_blocks(d)
    for b in range(n_blocks):
        nrec = av_block_records(d, b)
        body = bytearray()
        for _r in range(nrec):
            for f in range(n_fields):
                body += _write_long((d + b + f) % 50)
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            blob = co.compress(bytes(body)) + co.flush()
        else:
            blob = bytes(body)
        out += _write_long(nrec) + _write_long(len(blob)) + blob
        if d % 19 == 7 and b == n_blocks - 1:
            out += bytes(x ^ 0xFF for x in sync)  # corrupt sync: reject leg
        else:
            out += sync
    return bytes(out)


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, codec string, schema_name string, n_fields int, "
    "n_blocks int, n_records int, total_payload bigint"
)
_COLS = [
    "codec",
    "schema_name",
    "n_fields",
    "n_blocks",
    "n_records",
    "total_payload",
]


def avro_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Avro container census over any (id, binary) frame: one
    Arrow-batched narrow map, no shuffle (multimodal/docframes.py)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_avro_blob, _COLS, _SCHEMA, id_col, payload_col)


def avro_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real Avro object-container
    file (record schema, null/deflate codecs, multi-block with real
    sync markers, a corrupted-sync reject leg) is synthesized, walked
    by the from-spec parser, and every census column restated as
    doc_id arithmetic."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_avro, parse_avro_blob, _COLS, _SCHEMA)


AVRO_CENSUS_ORACLE = """
WITH d0 AS (SELECT doc_id, doc_id AS d FROM documents),
blocks AS (
  SELECT doc_id, d, b.b, 2 + (d + b.b) % 4 AS nrec
  FROM d0, generate_series(0, 2) b(b)
  WHERE b.b <= d % 3
),
agg AS (
  SELECT doc_id, d,
         CAST(count(*) AS INT) AS n_blocks,
         CAST(sum(nrec) AS INT) AS n_records,
         CAST(sum(nrec) * (1 + d % 4) AS BIGINT) AS total_payload
  FROM blocks GROUP BY doc_id, d
)
SELECT doc_id,
       CASE WHEN d % 19 = 7 THEN NULL
            WHEN d % 2 = 1 THEN 'deflate' ELSE 'null' END AS codec,
       CASE WHEN d % 19 = 7 THEN NULL
            ELSE 'r' || CAST(d % 6 AS VARCHAR) END AS schema_name,
       CASE WHEN d % 19 = 7 THEN NULL
            ELSE CAST(1 + d % 4 AS INT) END AS n_fields,
       CASE WHEN d % 19 = 7 THEN NULL ELSE n_blocks END AS n_blocks,
       CASE WHEN d % 19 = 7 THEN NULL ELSE n_records END AS n_records,
       CASE WHEN d % 19 = 7 THEN NULL ELSE total_payload END AS total_payload
FROM agg ORDER BY doc_id
"""
