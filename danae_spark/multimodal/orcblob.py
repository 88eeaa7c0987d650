"""Per-blob ORC census — the third lake container, tail parsed from spec.

Parquet and Avro censuses landed in r14/r15; ORC is the remaining
ubiquitous columnar container. Unlike the parquet census (which reads
the footer through pyarrow, the format's canonical implementation),
this one parses the ORC TAIL FROM THE SPEC — the Apache ORC file
format is protobuf-framed, so the module carries a minimal protobuf
wire-format walker (varint / length-delimited / fixed fields, packed
repeated uint32) plus the ORC compression-chunk framing (3-byte
little-endian header, low bit = stored-original):

  - last byte = postscript length; the (never-compressed) PostScript
    carries footerLength, the compression kind, and the "ORC" magic;
  - the Footer (decompressed per the postscript codec) carries row
    count, stripe list (per-stripe row counts cross-checked against
    the total), and the type tree — the root STRUCT's field names are
    the schema census;
  - codecs decoded FOR REAL: zlib (raw DEFLATE), snappy and lz4
    (from-spec block decoders in this module, differentially verified
    against the reference codecs), and zstd (the from-spec RFC 8878
    decoder, multimodal/zstdcodec). LZO rejects whole — never census
    what you could not read.

Census row: compression, n_rows, n_stripes, n_cols, columns,
content_bytes (footer contentLength), and (r16) the COLUMN-STATISTICS
layer a compaction / data-skipping planner reads from the same tail:
file-level ColumnStatistics (footer field 7 — numberOfValues, hasNull,
Integer/Double/String statistics) surfaced for EVERY data column
(r17: stat_mins/stat_maxs in canonical text form, matching the parquet
census), plus the Metadata section's per-stripe StripeStatistics
groups (postscript metadataLength, field 5) parsed and CROSS-CHECKED
against the file stats (aggregated stripe min/max must reproduce the
file min/max — stripe_stats_consistent). Reject-whole: bad magic,
truncated tail, protobuf overruns, codec failures, stripe-row
mismatch with the footer total.
"""

from __future__ import annotations

import zlib
from typing import Optional

__all__ = [
    "parse_orc_blob",
    "snappy_decode",
    "synth_orc",
    "orc_census_frame",
    "orc_census_roundtrip",
    "ORC_CENSUS_ORACLE",
]

_COMPRESSION = {0: "none", 1: "zlib", 2: "snappy", 3: "lzo", 4: "lz4", 5: "zstd"}
_MAX_DECODED = 64 * 1024 * 1024


class _Bad(Exception):
    pass


# ------------------------------------------------- protobuf wire walk


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        if pos >= len(buf) or shift > 63:
            raise _Bad
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def _pb_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message;
    value is an int for varint/fixed, bytes for length-delimited."""
    pos = 0
    while pos < len(buf):
        key, pos = _varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _varint(buf, pos)
        elif wire == 2:
            n, pos = _varint(buf, pos)
            if pos + n > len(buf):
                raise _Bad
            v = buf[pos : pos + n]
            pos += n
        elif wire == 5:
            if pos + 4 > len(buf):
                raise _Bad
            v = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        elif wire == 1:
            if pos + 8 > len(buf):
                raise _Bad
            v = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        else:
            raise _Bad  # groups/deprecated wire types
        yield field, wire, v


# --------------------------------------------------- snappy (from spec)


def snappy_decode(data: bytes, max_out: int = _MAX_DECODED) -> Optional[bytes]:
    """Raw snappy block format: varint uncompressed length, then a tag
    stream of literals and back-copies. None on malformation."""
    try:
        want, pos = _varint(data, 0)
    except _Bad:
        return None
    if want > max_out:
        return None
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                if pos + extra > n:
                    return None
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                return None
            out += data[pos : pos + ln]
            pos += ln
        else:
            if kind == 1:  # copy, 1-byte offset tail
                ln = ((tag >> 2) & 7) + 4
                if pos >= n:
                    return None
                off = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif kind == 2:  # copy, 2-byte offset
                ln = (tag >> 2) + 1
                if pos + 2 > n:
                    return None
                off = int.from_bytes(data[pos : pos + 2], "little")
                pos += 2
            else:  # copy, 4-byte offset
                ln = (tag >> 2) + 1
                if pos + 4 > n:
                    return None
                off = int.from_bytes(data[pos : pos + 4], "little")
                pos += 4
            if off == 0 or off > len(out):
                return None
            src = len(out) - off
            for _ in range(ln):
                out.append(out[src])
                src += 1
        if len(out) > want:
            return None
    return bytes(out) if len(out) == want else None


def lz4_block_decode(data: bytes, max_out: int = _MAX_DECODED) -> Optional[bytes]:
    """Raw LZ4 block format: token byte (high nibble literal length,
    low nibble match length - 4, 15 => 255-continued extension bytes),
    literals, 2-byte little-endian match offset. None on malformation."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    return None
                b = data[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            return None
        out += data[pos : pos + lit]
        pos += lit
        if len(out) > max_out:
            return None
        if pos == n:
            break  # final sequence carries literals only
        if pos + 2 > n:
            return None
        off = int.from_bytes(data[pos : pos + 2], "little")
        pos += 2
        if off == 0 or off > len(out):
            return None
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    return None
                b = data[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        src = len(out) - off
        for _ in range(mlen):
            out.append(out[src])
            src += 1
        if len(out) > max_out:
            return None
    return bytes(out)


# ------------------------------------------------------ chunk framing


def _orc_decompress(buf: bytes, kind: int) -> bytes:
    """ORC compression framing: 3-byte LE chunk headers, low bit set
    means the chunk is stored original (incompressible)."""
    if kind == 0:
        return buf
    out = bytearray()
    pos = 0
    while pos < len(buf):
        if pos + 3 > len(buf):
            raise _Bad
        hdr = int.from_bytes(buf[pos : pos + 3], "little")
        pos += 3
        orig = hdr & 1
        clen = hdr >> 1
        if pos + clen > len(buf):
            raise _Bad
        chunk = buf[pos : pos + clen]
        pos += clen
        if orig:
            out += chunk
        elif kind == 1:  # zlib = raw DEFLATE, output capped BEFORE expansion
            z = zlib.decompressobj(-15)
            dec = z.decompress(chunk, _MAX_DECODED + 1 - len(out))
            if z.unconsumed_tail or z.unused_data or not z.eof:
                raise _Bad  # over budget, trailing junk, or truncated stream
            out += dec
        elif kind == 2:  # snappy
            dec = snappy_decode(chunk)
            if dec is None:
                raise _Bad
            out += dec
        elif kind == 4:  # lz4 block format
            dec = lz4_block_decode(chunk)
            if dec is None:
                raise _Bad
            out += dec
        elif kind == 5:  # zstd via the from-spec decoder
            from danae_spark.multimodal.zstdcodec import zstd_decode

            dec = zstd_decode(chunk, max_out=_MAX_DECODED)
            if dec is None:
                raise _Bad
            out += dec
        else:
            raise _Bad  # lzo: not shipped — reject whole
        if len(out) > _MAX_DECODED:
            raise _Bad
    return bytes(out)


# ------------------------------------------------------------ parser


def parse_orc_blob(payload: bytes) -> Optional[dict]:
    try:
        return _parse(payload)
    except (_Bad, zlib.error, ValueError, IndexError, UnicodeDecodeError):
        return None


def _parse(payload: bytes) -> Optional[dict]:
    if len(payload) < 8 or payload[:3] != b"ORC":
        return None
    ps_len = payload[-1]
    if ps_len == 0 or 1 + ps_len > len(payload):
        return None
    ps = payload[-1 - ps_len : -1]
    footer_len = None
    meta_len = 0
    kind = 0
    magic = None
    for field, wire, v in _pb_fields(ps):
        if field == 1 and wire == 0:
            footer_len = v
        elif field == 2 and wire == 0:
            kind = v
        elif field == 5 and wire == 0:
            meta_len = v  # Metadata section (stripe-level column stats)
        elif field == 8000 and wire == 2:
            magic = v
    if magic != b"ORC" or footer_len is None:
        raise _Bad
    if kind not in (0, 1, 2, 4, 5):
        return None  # lzo or unknown: not decodable here
    end = len(payload) - 1 - ps_len
    if footer_len + meta_len > end:
        raise _Bad
    footer = _orc_decompress(payload[end - footer_len : end], kind)

    n_rows = None
    content_bytes = None
    stripe_rows: list[int] = []
    root_fields: list[str] = []
    n_types = 0
    file_stats: list[dict] = []
    for field, wire, v in _pb_fields(footer):
        if field == 2 and wire == 0:
            content_bytes = v
        elif field == 3 and wire == 2:  # StripeInformation
            rows = 0
            for sf, sw, sv in _pb_fields(v):
                if sf == 5 and sw == 0:
                    rows = sv
            stripe_rows.append(rows)
        elif field == 4 and wire == 2:  # Type
            n_types += 1
            if n_types == 1:  # the root type carries the column names
                for tf, tw, tv in _pb_fields(v):
                    if tf == 3 and tw == 2:
                        root_fields.append(tv.decode("utf-8"))
        elif field == 6 and wire == 0:
            n_rows = v
        elif field == 7 and wire == 2:  # file-level ColumnStatistics
            file_stats.append(_column_stats(v))
    if n_rows is None or n_types == 0:
        raise _Bad
    if stripe_rows and sum(stripe_rows) != n_rows:
        raise _Bad  # the stripe list lied about the total
    # stripe-level column stats from the Metadata section (the same
    # ~KB tail read): one StripeStatistics group per stripe, each with
    # one ColumnStatistics per type — the data-skipping planner's
    # min/max selectivity input (r16)
    n_stripe_groups = 0
    stripe_consistent = None
    if meta_len:
        meta = _orc_decompress(
            payload[end - footer_len - meta_len : end - footer_len], kind
        )
        stripe_groups: list[list[dict]] = []
        for field, wire, v in _pb_fields(meta):
            if field == 1 and wire == 2:  # StripeStatistics
                stripe_groups.append(
                    [_column_stats(cv) for cf, cw, cv in _pb_fields(v)
                     if cf == 1 and cw == 2]
                )
        n_stripe_groups = len(stripe_groups)
        stripe_consistent = True
        for col_ix, fs in enumerate(file_stats):
            if fs.get("min") is None:
                continue
            per = [g[col_ix] for g in stripe_groups if col_ix < len(g)]
            mins = [s["min"] for s in per if s.get("min") is not None]
            maxs = [s["max"] for s in per if s.get("max") is not None]
            if not mins or min(mins) != fs["min"] or max(maxs) != fs["max"]:
                stripe_consistent = False
    c0 = file_stats[1] if len(file_stats) > 1 else {}
    # r17: the full per-column stats surface (types 1..n are the root
    # struct's fields in order) — same canonical text form as the
    # parquet census so the two lake censuses compare like-for-like
    from danae_spark.multimodal.parquetblob import _fmt_stat

    data_stats = file_stats[1 : 1 + len(root_fields)]
    stat_mins = ";".join(
        f"{n}={_fmt_stat(s.get('min'))}" for n, s in zip(root_fields, data_stats)
    ) if data_stats else None
    stat_maxs = ";".join(
        f"{n}={_fmt_stat(s.get('max'))}" for n, s in zip(root_fields, data_stats)
    ) if data_stats else None
    return {
        "compression": _COMPRESSION[kind],
        "n_rows": n_rows,
        "n_stripes": len(stripe_rows),
        "n_cols": len(root_fields),
        "columns": "/".join(root_fields),
        "content_bytes": content_bytes,
        "n_stat_cols": len(file_stats) or None,
        "c0_min": c0.get("min"),
        "c0_max": c0.get("max"),
        "c0_sum": c0.get("sum"),
        "has_null": c0.get("has_null"),
        "n_stripe_stat_groups": n_stripe_groups if meta_len else None,
        "stripe_stats_consistent": stripe_consistent,
        "stat_mins": stat_mins,
        "stat_maxs": stat_maxs,
    }


def _zigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _column_stats(buf: bytes) -> dict:
    """One ColumnStatistics message: numberOfValues, hasNull, and the
    typed min/max — IntegerStatistics (field 2, sint64 zigzag, + sum),
    DoubleStatistics (field 3, 64-bit IEEE), StringStatistics (field 4,
    UTF-8) — whichever the column carries (r17: all three, so the
    census surfaces every column a data-skipping planner can use)."""
    import struct as _struct

    out: dict = {"n_values": None, "min": None, "max": None, "sum": None,
                 "has_null": None}
    for f, w, v in _pb_fields(buf):
        if f == 1 and w == 0:
            out["n_values"] = v
        elif f == 2 and w == 2:  # IntegerStatistics
            for f2, w2, v2 in _pb_fields(v):
                if f2 == 1 and w2 == 0:
                    out["min"] = _zigzag(v2)
                elif f2 == 2 and w2 == 0:
                    out["max"] = _zigzag(v2)
                elif f2 == 3 and w2 == 0:
                    out["sum"] = _zigzag(v2)
        elif f == 3 and w == 2:  # DoubleStatistics (fixed64 IEEE 754)
            for f2, w2, v2 in _pb_fields(v):
                if f2 == 1 and w2 == 1:
                    out["min"] = _struct.unpack("<d", v2.to_bytes(8, "little"))[0]
                elif f2 == 2 and w2 == 1:
                    out["max"] = _struct.unpack("<d", v2.to_bytes(8, "little"))[0]
        elif f == 4 and w == 2:  # StringStatistics
            for f2, w2, v2 in _pb_fields(v):
                if f2 == 1 and w2 == 2:
                    out["min"] = v2.decode("utf-8")
                elif f2 == 2 and w2 == 2:
                    out["max"] = v2.decode("utf-8")
        elif f == 10 and w == 0:
            out["has_null"] = bool(v)
    return out


# ----------------------------------------------------------- synthesis
#
# Arithmetic shape (restated in ORC_CENSUS_ORACLE); files are written
# by the REFERENCE writer (pyarrow.orc) and parsed by the from-spec
# tail walk above — writer/parser independence is the point:
#   n_rows = 10 + d % 7 ; n_cols = 2 + d % 2 (c0 long, c1 string, +c2)
#   compression = [none, zlib, snappy, zstd, lz4][d % 5]
#   n_stripes = 1 (rows fit one stripe at any writer default)
#   d % 17 == 9 -> postscript length byte corrupted (reject leg)


def orc_n_rows(d: int) -> int:
    return 10 + d % 7


def orc_n_cols(d: int) -> int:
    return 2 + d % 2


def synth_orc(d: int) -> bytes:
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    n = orc_n_rows(d)
    cols = {"c0": pa.array([(d * 3 + i) % 100 for i in range(n)], pa.int64())}
    if orc_n_cols(d) >= 2:
        cols["c1"] = pa.array([f"s{(d + i) % 9}" for i in range(n)])
    if orc_n_cols(d) >= 3:
        cols["c2"] = pa.array([float((d + i) % 5) for i in range(n)])
    buf = io.BytesIO()
    comp = ["UNCOMPRESSED", "ZLIB", "SNAPPY", "ZSTD", "LZ4"][d % 5]
    orc.write_table(pa.table(cols), buf, compression=comp)
    raw = bytearray(buf.getvalue())
    if d % 17 == 9:
        raw[-1] ^= 0xFF  # corrupt the postscript length
    return bytes(raw)


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, compression string, n_rows int, n_stripes int, "
    "n_cols int, columns string, n_stat_cols int, c0_min bigint, "
    "c0_max bigint, c0_sum bigint, has_null boolean, "
    "n_stripe_stat_groups int, stripe_stats_consistent boolean, "
    "stat_mins string, stat_maxs string"
)
_COLS = ["compression", "n_rows", "n_stripes", "n_cols", "columns",
         "n_stat_cols", "c0_min", "c0_max", "c0_sum", "has_null",
         "n_stripe_stat_groups", "stripe_stats_consistent",
         "stat_mins", "stat_maxs"]


def _parse_census(payload: bytes) -> Optional[dict]:
    r = parse_orc_blob(payload)
    if r is None:
        return None
    return {k: r[k] for k in _COLS}


def orc_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """ORC tail census over any (id, binary) frame: one Arrow-batched
    narrow map, no shuffle (multimodal/docframes.py)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, _parse_census, _COLS, _SCHEMA, id_col, payload_col)


def orc_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real ORC file from the
    REFERENCE writer (four codecs incl. snappy and zstd, decompressed
    by this repo's own from-spec decoders) is parsed by the from-spec
    protobuf tail walk, and every census column restated as doc_id
    arithmetic; d % 17 == 9 is the corrupted-postscript reject leg."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_orc, _parse_census, _COLS, _SCHEMA)


ORC_CENSUS_ORACLE = """
WITH d0 AS (SELECT doc_id, doc_id AS d FROM documents),
-- c0 values are (3d + i) % 100 for i < n_rows: min/max/sum restated
c0 AS (
  SELECT d0.doc_id,
         CAST(min((3 * d0.d + i.i) % 100) AS BIGINT) AS c0_min,
         CAST(max((3 * d0.d + i.i) % 100) AS BIGINT) AS c0_max,
         CAST(sum((3 * d0.d + i.i) % 100) AS BIGINT) AS c0_sum
  FROM d0 JOIN generate_series(0, 16) i(i) ON i.i < 10 + d0.d % 7
  WHERE d0.d % 17 <> 9
  GROUP BY d0.doc_id
)
SELECT doc_id,
       CASE WHEN d % 17 = 9 THEN NULL
            ELSE (CASE d % 5 WHEN 0 THEN 'none' WHEN 1 THEN 'zlib'
                             WHEN 2 THEN 'snappy' WHEN 3 THEN 'zstd'
                             ELSE 'lz4' END)
            END AS compression,
       CASE WHEN d % 17 = 9 THEN NULL
            ELSE CAST(10 + d % 7 AS INT) END AS n_rows,
       CASE WHEN d % 17 = 9 THEN NULL ELSE 1 END AS n_stripes,
       CASE WHEN d % 17 = 9 THEN NULL
            ELSE CAST(2 + d % 2 AS INT) END AS n_cols,
       CASE WHEN d % 17 = 9 THEN NULL
            ELSE 'c0/c1' || CASE WHEN d % 2 = 1 THEN '/c2' ELSE '' END
            END AS columns,
       CASE WHEN d % 17 = 9 THEN NULL
            ELSE CAST(3 + d % 2 AS INT) END AS n_stat_cols,
       c0.c0_min, c0.c0_max, c0.c0_sum,
       CASE WHEN d % 17 = 9 THEN NULL ELSE FALSE END AS has_null,
       CASE WHEN d % 17 = 9 THEN NULL ELSE 1 END AS n_stripe_stat_groups,
       CASE WHEN d % 17 = 9 THEN NULL ELSE TRUE END AS stripe_stats_consistent,
       -- r17: all-column stats (c1 strings cover all of s0..s8 and c2
       -- doubles all of 0.0..4.0 because n_rows >= 10 > both moduli)
       CASE WHEN d % 17 = 9 THEN NULL
            ELSE 'c0=' || CAST(c0.c0_min AS VARCHAR) || ';c1=s0'
                 || CASE WHEN d % 2 = 1 THEN ';c2=0.0' ELSE '' END
            END AS stat_mins,
       CASE WHEN d % 17 = 9 THEN NULL
            ELSE 'c0=' || CAST(c0.c0_max AS VARCHAR) || ';c1=s8'
                 || CASE WHEN d % 2 = 1 THEN ';c2=4.0' ELSE '' END
            END AS stat_maxs
FROM d0 LEFT JOIN c0 USING (doc_id) ORDER BY doc_id
"""
