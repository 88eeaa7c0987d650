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
content_bytes (footer contentLength). Reject-whole: bad magic,
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
    kind = 0
    magic = None
    for field, wire, v in _pb_fields(ps):
        if field == 1 and wire == 0:
            footer_len = v
        elif field == 2 and wire == 0:
            kind = v
        elif field == 8000 and wire == 2:
            magic = v
    if magic != b"ORC" or footer_len is None:
        raise _Bad
    if kind not in (0, 1, 2, 4, 5):
        return None  # lzo or unknown: not decodable here
    end = len(payload) - 1 - ps_len
    if footer_len > end:
        raise _Bad
    footer = _orc_decompress(payload[end - footer_len : end], kind)

    n_rows = None
    content_bytes = None
    stripe_rows: list[int] = []
    root_fields: list[str] = []
    n_types = 0
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
    if n_rows is None or n_types == 0:
        raise _Bad
    if stripe_rows and sum(stripe_rows) != n_rows:
        raise _Bad  # the stripe list lied about the total
    return {
        "compression": _COMPRESSION[kind],
        "n_rows": n_rows,
        "n_stripes": len(stripe_rows),
        "n_cols": len(root_fields),
        "columns": "/".join(root_fields),
        "content_bytes": content_bytes,
    }


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
    "n_cols int, columns string"
)
_COLS = ["compression", "n_rows", "n_stripes", "n_cols", "columns"]


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
WITH d0 AS (SELECT doc_id, doc_id AS d FROM documents)
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
            END AS columns
FROM d0 ORDER BY doc_id
"""
