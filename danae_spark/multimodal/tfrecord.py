"""TFRecord census — the TensorFlow training-shard container.

A TFRecord file frames records as
  u64-LE length | masked CRC32C(length bytes) | data | masked CRC32C(data)
with CRC32C (Castagnoli polynomial, reflected) masked per the spec:
  mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8  (mod 2^32).
The CRC table is GENERATED from the polynomial at import (no
transcribed table), and the decode is differentially verifiable
against any reference CRC32C.

Records in training shards are tf.train.Example protos; the census
walks them with the same protobuf wire-format reader the ORC census
certified (orcblob._pb_fields): features (field 1) -> map entries
(key string, Feature) -> the bytes_list/float_list/int64_list oneof,
counting keys and typed features without materializing tensors.

Reject-whole: a CRC mismatch on ANY record (length or data), a torn
tail (a partial frame at EOF), or an Example the wire grammar cannot
walk — a training shard with one corrupt record must be quarantined,
not silently short-counted (the access-log line-stream contract does
NOT apply: TFRecord has no line independence, a bad length
desynchronizes every later frame).

Reference parity note: the reference engine (SURVEY §1) has no tensor
or shard handling; extension surface like multimodal/tensors.py.
"""

from __future__ import annotations

import struct
from typing import Optional

__all__ = [
    "crc32c",
    "masked_crc",
    "parse_tfrecord",
    "synth_tfrecord",
    "tfrecord_census_frame",
    "tfrecord_census_roundtrip",
    "TFRECORD_CENSUS_ORACLE",
]

# CRC32C (Castagnoli, reflected 0x82F63B78) — table generated, not typed
_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (0x82F63B78 if _c & 1 else 0)
    _TABLE.append(_c)
assert _TABLE[1] == 0xF26B8303 and _TABLE[255] == 0xAD7D5351  # spec spots


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = (c >> 8) ^ _TABLE[(c ^ b) & 0xFF]
    return c ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _walk_example(data: bytes) -> Optional[dict]:
    """Feature census of one tf.train.Example via the certified
    protobuf walker; None when the wire grammar does not hold."""
    from danae_spark.multimodal.orcblob import _pb_fields

    keys = []
    n_bytes = n_float = n_int = 0
    try:
        feats = None
        for f, w, v in _pb_fields(data):
            if f == 1 and w == 2:
                feats = v  # Features message
        if feats is None:
            return None
        for f, w, v in _pb_fields(feats):
            if f != 1 or w != 2:
                continue  # map entry
            key = None
            kind = None
            for ef, ew, ev in _pb_fields(v):
                if ef == 1 and ew == 2:
                    key = ev.decode("utf-8")
                elif ef == 2 and ew == 2:
                    for ff, fw, fv in _pb_fields(ev):
                        if ff == 1 and fw == 2:
                            kind = "bytes"
                        elif ff == 2 and fw == 2:
                            kind = "float"
                        elif ff == 3 and fw == 2:
                            kind = "int64"
            if key is None or kind is None:
                return None
            keys.append(key)
            if kind == "bytes":
                n_bytes += 1
            elif kind == "float":
                n_float += 1
            else:
                n_int += 1
    except Exception:
        return None
    return {"keys": keys, "n_bytes": n_bytes, "n_float": n_float,
            "n_int": n_int}


def parse_tfrecord(payload: bytes) -> Optional[dict]:
    p = bytes(payload) if payload is not None else b""
    if len(p) < 16:
        return None
    pos = 0
    n_records = 0
    total_data = 0
    all_keys: set[str] = set()
    n_bytes = n_float = n_int = 0
    while pos < len(p):
        if pos + 12 > len(p):
            return None  # torn tail: a partial frame desynchronizes
        lenb = p[pos : pos + 8]
        (length,) = struct.unpack("<Q", lenb)
        (lcrc,) = struct.unpack("<I", p[pos + 8 : pos + 12])
        if lcrc != masked_crc(lenb):
            return None
        if length > len(p) or pos + 12 + length + 4 > len(p):
            return None
        data = p[pos + 12 : pos + 12 + length]
        (dcrc,) = struct.unpack("<I", p[pos + 12 + length : pos + 16 + length])
        if dcrc != masked_crc(data):
            return None
        ex = _walk_example(data)
        if ex is None:
            return None
        n_records += 1
        total_data += length
        all_keys.update(ex["keys"])
        n_bytes += ex["n_bytes"]
        n_float += ex["n_float"]
        n_int += ex["n_int"]
        pos += 16 + length
    if n_records == 0:
        return None
    return {
        "n_records": n_records,
        "total_data_bytes": total_data,
        "n_features": n_bytes + n_float + n_int,
        "feature_keys": "/".join(sorted(all_keys)),
        "n_bytes_feats": n_bytes,
        "n_float_feats": n_float,
        "n_int_feats": n_int,
    }


# ------------------------------------------------------------- synthesis
#
# Grid (restated in TFRECORD_CENSUS_ORACLE):
#   R = 2 + d % 4 Examples: each has "text" (bytes: 'doc {d} {r}') and
#   "label" (int64: d % 5); records with (d + r) % 2 == 1 add "score"
#   (float: d % 7). total_data_bytes is exact arithmetic (fixed proto
#   overhead + the text's digit count).
#   rejects: d % 17 == 11 data-CRC flip; d % 23 == 19 length-CRC flip;
#   d % 13 == 12 torn tail (truncation)


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(field: int, data: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(data)) + data


def _example(d: int, r: int) -> bytes:
    text = f"doc {d} {r}".encode()
    bytes_list = _ld(1, text)                      # BytesList.value
    int64_list = bytes((0x08,)) + _varint(d % 5)   # Int64List.value (tag f1/w0)
    entries = [
        _ld(1, _ld(1, b"text") + _ld(2, _ld(1, bytes_list))),
        _ld(1, _ld(1, b"label") + _ld(2, _ld(3, int64_list))),
    ]
    if (d + r) % 2 == 1:
        # FloatList.value, tag f1/w5 + 4-byte IEEE float
        float_list = bytes((0x0D,)) + struct.pack("<f", float(d % 7))
        entries.append(_ld(1, _ld(1, b"score") + _ld(2, _ld(2, float_list))))
    return _ld(1, b"".join(entries))


def synth_tfrecord(d: int) -> bytes:
    out = bytearray()
    nr = 2 + d % 4
    for r in range(nr):
        data = _example(d, r)
        lenb = struct.pack("<Q", len(data))
        lcrc = masked_crc(lenb)
        dcrc = masked_crc(data)
        if d % 23 == 19 and r == 0:
            lcrc ^= 0xFF
        if d % 17 == 11 and r == nr - 1:
            dcrc ^= 0xFF
        out += lenb + struct.pack("<I", lcrc) + data + struct.pack("<I", dcrc)
    if d % 13 == 12:
        out = out[:-6]  # torn tail
    return bytes(out)




_COLS = ["n_records", "total_data_bytes", "n_features", "feature_keys",
         "n_bytes_feats", "n_float_feats", "n_int_feats"]
_SCHEMA = (
    "doc_id bigint, n_records int, total_data_bytes bigint, "
    "n_features int, feature_keys string, n_bytes_feats int, "
    "n_float_feats int, n_int_feats int"
)


def tfrecord_census_frame(df, id_col="doc_id", payload_col="payload"):
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_tfrecord, _COLS, _SCHEMA,
                              id_col, payload_col)


def tfrecord_census_roundtrip(spark, sf_dir: str):
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_tfrecord, parse_tfrecord,
                           _COLS, _SCHEMA)

# Wire sizes are exact arithmetic: a no-score Example costs 37 bytes +
# the text's digit count (single-digit r); the score feature adds 18.
TFRECORD_CENSUS_ORACLE = """
WITH d0 AS (
  SELECT doc_id, doc_id AS d FROM documents
  WHERE doc_id % 17 <> 11 AND doc_id % 23 <> 19 AND doc_id % 13 <> 12
),
rec AS (
  SELECT d0.doc_id, d0.d, r.r,
         (d0.d + r.r) % 2 AS has_score,
         37 + length(CAST(d0.d AS VARCHAR)) + 18 * ((d0.d + r.r) % 2)
           AS data_bytes
  FROM d0 JOIN generate_series(0, 5) r(r) ON r.r < 2 + d0.d % 4
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS INT) AS n_records,
         CAST(SUM(data_bytes) AS BIGINT) AS total_data_bytes,
         CAST(SUM(2 + has_score) AS INT) AS n_features,
         CAST(COUNT(*) AS INT) AS n_bytes_feats,
         CAST(SUM(has_score) AS INT) AS n_float_feats,
         CAST(COUNT(*) AS INT) AS n_int_feats
  FROM rec GROUP BY doc_id
)
SELECT d.doc_id,
       agg.n_records,
       agg.total_data_bytes,
       agg.n_features,
       CASE WHEN agg.doc_id IS NULL THEN NULL
            ELSE 'label/score/text' END AS feature_keys,
       agg.n_bytes_feats,
       agg.n_float_feats,
       agg.n_int_feats
FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id
"""
