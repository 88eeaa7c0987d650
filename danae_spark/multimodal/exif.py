"""EXIF (TIFF IFD) metadata extraction from crawl JPEGs.

A crawl image corpus carries camera metadata in the JPEG APP1 segment:
a TIFF byte stream (EXIF 2.3 / TIFF 6.0) holding IFD0 (Make, Model,
Orientation), the Exif sub-IFD (DateTimeOriginal, pixel dimensions) and
the GPS sub-IFD — the latter is a PII surface for a training-data
pipeline (a photo with embedded coordinates locates a person the same
way a phone number in text does), so GPS presence and the decoded
coordinates are first-class outputs here, feeding the same visibility
contract as operators/pii.py.

Implemented from the public specs (TIFF 6.0 §2; EXIF 2.3 §4.6):
  - both byte orders (II little / MM big endian), verified 42 magic;
  - IFD entry grammar: tag / type / count / value-or-offset, with the
    value stored IN the 4-byte field when it fits, else at the offset;
  - value types ASCII(2), SHORT(3), LONG(4), RATIONAL(5) with per-type
    sizes and bounds checks against the real buffer;
  - sub-IFD pointers (0x8769 Exif, 0x8825 GPS) followed with offset
    validation and a visited-set so pointer cycles terminate;
  - GPS DMS rationals -> signed decimal degrees via the ref letters;
  - reject-whole: a truncated IFD, an entry reading past the buffer, a
    zero rational denominator, or a bad type size rejects the whole
    EXIF block (None) — never a partial/garbled row (the same contract
    as every other codec in this package).

Reference parity note: the reference (smartdatalake/danae) profiles
tabular metadata only; EXIF is extension surface for the multimodal
columns (no reference counterpart).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

__all__ = [
    "parse_exif",
    "synth_exif_jpeg",
    "exif_frame",
    "image_exif_roundtrip",
    "EXIF_ORACLE",
]

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_TAG_DATETIME_ORIG = 0x9003
_TAG_PX_X = 0xA002
_TAG_PX_Y = 0xA003
_TAG_GPS_LAT_REF = 0x0001
_TAG_GPS_LAT = 0x0002
_TAG_GPS_LON_REF = 0x0003
_TAG_GPS_LON = 0x0004

_MAX_IFD_ENTRIES = 512  # sanity bound: a count field claiming more is garbage


def _read_ifd(tiff: bytes, off: int, end: str, visited: set[int]) -> dict[int, object]:
    """One IFD -> {tag: decoded value}; raises ValueError on malformed."""
    if off in visited:
        raise ValueError("IFD pointer cycle")
    visited.add(off)
    if off + 2 > len(tiff):
        raise ValueError("IFD count past buffer")
    (n,) = struct.unpack_from(end + "H", tiff, off)
    if n > _MAX_IFD_ENTRIES or off + 2 + 12 * n + 4 > len(tiff):
        raise ValueError("IFD entries past buffer")
    out: dict[int, object] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(end + "HHL", tiff, base)
        size = _TYPE_SIZE.get(typ)
        if size is None or count > len(tiff):
            raise ValueError(f"bad IFD entry type {typ}")
        nbytes = size * count
        if nbytes <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(end + "L", tiff, base + 8)
        if voff + nbytes > len(tiff):
            raise ValueError("IFD value past buffer")
        if typ == 2:  # ASCII, NUL-terminated
            raw = tiff[voff : voff + count]
            out[tag] = raw.split(b"\x00")[0].decode("ascii", "strict")
        elif typ == 3:
            out[tag] = struct.unpack_from(end + "H", tiff, voff)[0]
        elif typ == 4:
            out[tag] = struct.unpack_from(end + "L", tiff, voff)[0]
        elif typ == 5:
            vals = []
            for k in range(count):
                num, den = struct.unpack_from(end + "LL", tiff, voff + 8 * k)
                if den == 0:
                    raise ValueError("zero rational denominator")
                vals.append((num, den))
            out[tag] = vals
        # other types (BYTE/UNDEFINED/signed) are skipped, not errors
    return out


def _typed(val, want):
    """A well-known tag carrying the WRONG declared type (an int where
    the spec says ASCII, a rational list where it says SHORT) is a
    malformed block, not a value — reject-whole."""
    if val is not None and not isinstance(val, want):
        raise ValueError(f"tag type mismatch: {type(val).__name__}")
    return val


def _dms_to_degrees(dms: list[tuple[int, int]], ref: str) -> float:
    if not isinstance(dms, list) or not isinstance(ref, str):
        raise ValueError("GPS tags carry wrong types")
    if len(dms) != 3:
        raise ValueError("GPS coordinate needs 3 rationals")
    deg = dms[0][0] / dms[0][1]
    mnt = dms[1][0] / dms[1][1]
    sec = dms[2][0] / dms[2][1]
    val = deg + mnt / 60.0 + sec / 3600.0
    return -val if ref in ("S", "W") else val


def parse_exif(payload: bytes) -> dict | None:
    """Walk the JPEG segment stream for APP1/Exif and decode the TIFF
    block — or, for a BARE TIFF payload (r15: .tif files carry the
    same IFD structure directly, no JPEG wrapper), decode it as-is —
    or, for a WebP container (r16), the VP8X EXIF chunk's TIFF block
    (raw or with the JPEG-style "Exif\\0\\0" prefix some writers keep).
    Returns the metadata dict, {} for a JPEG/WebP without EXIF, None
    for a malformed EXIF block or an unrecognized payload."""
    if len(payload) >= 8 and payload[:4] in (b"II*\x00", b"MM\x00*"):
        return _parse_tiff_block(payload)
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from danae_spark.multimodal.webp import _Bad, _riff_chunks

        try:
            (riff,) = struct.unpack_from("<I", payload, 4)
            end = 8 + riff
            if riff < 4 or end > len(payload):
                return None
            for fcc, body, size in _riff_chunks(payload, 12, end):
                if fcc == b"EXIF":
                    blob = payload[body : body + size]
                    if blob[:6] == b"Exif\x00\x00":
                        blob = blob[6:]
                    return _parse_tiff_block(blob)
        except (_Bad, struct.error):
            return None
        return {}  # a recognized WebP without EXIF metadata
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    tiff = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if seglen < 2 or pos + 2 + seglen > len(payload):
            return None
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            break
        if marker == 0xDA:  # SOS: entropy data follows; no EXIF seen
            break
        pos += 2 + seglen
    if tiff is None:
        return {}
    return _parse_tiff_block(tiff)


def _parse_tiff_block(tiff: bytes) -> dict | None:
    try:
        if len(tiff) < 8:
            raise ValueError("short TIFF header")
        if tiff[:2] == b"II":
            end = "<"
        elif tiff[:2] == b"MM":
            end = ">"
        else:
            raise ValueError("bad TIFF byte order")
        magic, ifd0_off = struct.unpack_from(end + "HL", tiff, 2)
        if magic != 42:
            raise ValueError("bad TIFF magic")
        visited: set[int] = set()
        ifd0 = _read_ifd(tiff, ifd0_off, end, visited)
        out: dict = {
            "endian": "II" if end == "<" else "MM",
            "make": _typed(ifd0.get(_TAG_MAKE), str),
            "model": _typed(ifd0.get(_TAG_MODEL), str),
            "orientation": _typed(ifd0.get(_TAG_ORIENTATION), int),
            "datetime_original": None,
            "px_x": None,
            "px_y": None,
            "has_gps": 0,
            "gps_lat": None,
            "gps_lon": None,
        }
        if _TAG_EXIF_IFD in ifd0:
            sub = _read_ifd(tiff, _typed(ifd0[_TAG_EXIF_IFD], int), end, visited)
            out["datetime_original"] = _typed(sub.get(_TAG_DATETIME_ORIG), str)
            out["px_x"] = _typed(sub.get(_TAG_PX_X), int)
            out["px_y"] = _typed(sub.get(_TAG_PX_Y), int)
        if _TAG_GPS_IFD in ifd0:
            gps = _read_ifd(tiff, _typed(ifd0[_TAG_GPS_IFD], int), end, visited)
            lat, lat_ref = gps.get(_TAG_GPS_LAT), gps.get(_TAG_GPS_LAT_REF)
            lon, lon_ref = gps.get(_TAG_GPS_LON), gps.get(_TAG_GPS_LON_REF)
            if lat is not None and lat_ref and lon is not None and lon_ref:
                out["has_gps"] = 1
                out["gps_lat"] = _dms_to_degrees(lat, lat_ref)
                out["gps_lon"] = _dms_to_degrees(lon, lon_ref)
        return out
    except (ValueError, UnicodeDecodeError, struct.error):
        return None


# ------------------------------------------------------------- synthesis


class _IfdBuilder:
    """Accumulates IFD entries + an out-of-line data area, then renders
    at a given offset (TIFF 6.0 entry layout, both endians)."""

    def __init__(self, end: str):
        self.end = end
        self.entries: list[tuple[int, int, int, bytes]] = []

    def ascii(self, tag: int, text: str) -> None:
        self._add(tag, 2, len(text) + 1, text.encode("ascii") + b"\x00")

    def short(self, tag: int, value: int) -> None:
        self._add(tag, 3, 1, struct.pack(self.end + "H", value))

    def long(self, tag: int, value: int) -> None:
        self._add(tag, 4, 1, struct.pack(self.end + "L", value))

    def rationals(self, tag: int, vals: list[tuple[int, int]]) -> None:
        raw = b"".join(struct.pack(self.end + "LL", n, d) for n, d in vals)
        self._add(tag, 5, len(vals), raw)

    def _add(self, tag: int, typ: int, count: int, raw: bytes) -> None:
        self.entries.append((tag, typ, count, raw))

    def size(self) -> int:
        inline = sum(1 for *_, raw in self.entries if len(raw) <= 4)
        out = sum(len(raw) for *_, raw in self.entries if len(raw) > 4)
        return 2 + 12 * len(self.entries) + 4 + out

    def render(self, at: int) -> bytes:
        entries = sorted(self.entries)  # TIFF requires ascending tag order
        head = struct.pack(self.end + "H", len(entries))
        body = b""
        data = b""
        data_off = at + 2 + 12 * len(entries) + 4
        for tag, typ, count, raw in entries:
            if len(raw) <= 4:
                field = raw + b"\x00" * (4 - len(raw))
            else:
                field = struct.pack(self.end + "L", data_off + len(data))
                data += raw
            body += struct.pack(self.end + "HHL", tag, typ, count) + field
        return head + body + struct.pack(self.end + "L", 0) + data


def _grid(doc_id: int) -> dict:
    """The deterministic synth grid — mirrored verbatim by EXIF_ORACLE."""
    d = int(doc_id)
    g = {
        "carries_exif": d % 7 != 6,
        "malformed": d % 13 == 12,
        "endian": "II" if d % 2 == 0 else "MM",
        "orientation": 1 + (d * 5) % 8,
        "make": f"make {d % 23}",
        "model": f"model {(d * 3) % 31}",
        "datetime_original": "2020:01:%02d %02d:%02d:%02d"
        % (1 + d % 28, d % 24, (d * 7) % 60, (d * 13) % 60),
        "px_x": 16 + d % 32,
        "px_y": 16 + (d * 3) % 32,
        "has_gps": d % 3 == 0,
    }
    if g["has_gps"]:
        lat_dms = [(d % 90, 1), ((d * 7) % 60, 1), (((d * 13) % 60) * 100, 100)]
        lon_dms = [((d * 3) % 180, 1), ((d * 11) % 60, 1), (((d * 17) % 60) * 100, 100)]
        g["lat_dms"], g["lat_ref"] = lat_dms, ("N" if d % 2 == 0 else "S")
        g["lon_dms"], g["lon_ref"] = lon_dms, ("E" if d % 4 < 2 else "W")
    return g


def synth_exif_jpeg(doc_id: int) -> bytes:
    """A real baseline JPEG (jpegcodec.synth_jpeg) with an EXIF APP1
    spliced after SOI: IFD0 (Make/Model/Orientation + both sub-IFD
    pointers), the Exif sub-IFD (DateTimeOriginal, pixel dims), the GPS
    sub-IFD (DMS rationals, 1/100s arc-second precision) on the d%3
    docs; d%7==6 docs carry no EXIF at all, d%13==12 docs carry a
    TRUNCATED TIFF (reject-whole)."""
    from danae_spark.multimodal.jpegcodec import synth_jpeg

    g = _grid(doc_id)
    jpeg = synth_jpeg(np.full((8, 8), 64 + (int(doc_id) * 9) % 128, dtype=np.int64))
    if not g["carries_exif"]:
        return jpeg
    end = "<" if g["endian"] == "II" else ">"

    ifd0 = _IfdBuilder(end)
    ifd0.ascii(_TAG_MAKE, g["make"])
    ifd0.ascii(_TAG_MODEL, g["model"])
    ifd0.short(_TAG_ORIENTATION, g["orientation"])
    sub = _IfdBuilder(end)
    sub.ascii(_TAG_DATETIME_ORIG, g["datetime_original"])
    sub.long(_TAG_PX_X, g["px_x"])
    sub.long(_TAG_PX_Y, g["px_y"])
    gps = None
    if g["has_gps"]:
        gps = _IfdBuilder(end)
        gps.ascii(_TAG_GPS_LAT_REF, g["lat_ref"])
        gps.rationals(_TAG_GPS_LAT, g["lat_dms"])
        gps.ascii(_TAG_GPS_LON_REF, g["lon_ref"])
        gps.rationals(_TAG_GPS_LON, g["lon_dms"])
        ifd0.long(_TAG_GPS_IFD, 0)  # placeholder; offset patched below
    ifd0.long(_TAG_EXIF_IFD, 0)

    # lay out: header(8) | IFD0 | Exif sub-IFD | GPS sub-IFD
    ifd0_off = 8
    sub_off = ifd0_off + ifd0.size()
    gps_off = sub_off + sub.size()
    ifd0.entries = [
        (t, ty, c, struct.pack(end + "L", sub_off) if t == _TAG_EXIF_IFD
         else struct.pack(end + "L", gps_off) if t == _TAG_GPS_IFD else raw)
        for t, ty, c, raw in ifd0.entries
    ]
    tiff = (
        (b"II" if end == "<" else b"MM")
        + struct.pack(end + "HL", 42, ifd0_off)
        + ifd0.render(ifd0_off)
        + sub.render(sub_off)
        + (gps.render(gps_off) if gps else b"")
    )
    if g["malformed"]:
        tiff = tiff[: ifd0_off + 2 + 5]  # cut mid-entry: reads past buffer
    app1_body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(app1_body) + 2) + app1_body
    return jpeg[:2] + app1 + jpeg[2:]


# ----------------------------------------------------------- Spark layer

_COLS = [
    "has_exif", "endian", "orientation", "make", "model",
    "datetime_original", "px_x", "px_y", "has_gps", "gps_lat", "gps_lon",
]
_SCHEMA = (
    "doc_id long, has_exif int, endian string, orientation int, "
    "make string, model string, datetime_original string, px_x int, "
    "px_y int, has_gps int, gps_lat double, gps_lon double"
)


def _row(rid, payload) -> dict:
    c = parse_exif(bytes(payload)) if payload is not None else None
    row = {"doc_id": rid}
    if c:  # parsed with an EXIF block
        row["has_exif"] = 1
        row.update({k: c.get(k) for k in _COLS if k != "has_exif"})
    else:  # {} no-EXIF JPEG, None malformed/not-JPEG: both ship nulls
        row["has_exif"] = 0
        row.update({k: None for k in _COLS if k != "has_exif"})
    return row


def exif_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """EXIF extraction over any (id, binary) frame; has_exif=0 + nulls
    for EXIF-less or malformed payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_row(rid, p) for rid, p in zip(pdf[id_col], pdf[payload_col])]
            yield pd.DataFrame(rows, columns=["doc_id"] + _COLS).rename(
                columns={"doc_id": id_col}
            )

    return df.mapInPandas(batches, schema=_SCHEMA.replace("doc_id", id_col, 1))


def image_exif_roundtrip(spark, sf_dir: str):
    """Oracle-checkable EXIF extraction: per doc a real JPEG with a
    synthesized EXIF APP1 (both endians, GPS on the d%3 docs, no-EXIF
    and truncated-TIFF docs in the grid), decoded by the real TIFF IFD
    walk; the grid is restated in SQL so the value hash covers the
    exact strings, dimensions and signed decimal coordinates."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_row(int(d), synth_exif_jpeg(int(d))) for d in pdf["doc_id"]]
            yield pd.DataFrame(rows, columns=["doc_id"] + _COLS)

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_SCHEMA)
        .orderBy("doc_id")
    )


# GPS decimal degrees re-derive the Python float arithmetic exactly:
# deg + mnt/60.0 + sec/3600.0 over small integers is the same IEEE
# double op sequence on both engines (no rounding needed).
EXIF_ORACLE = """
WITH g AS (
  SELECT doc_id,
         (doc_id % 7 <> 6) AND (doc_id % 13 <> 12) AS ok,
         CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS endian,
         CAST(1 + (doc_id * 5) % 8 AS INT) AS orientation,
         'make ' || CAST(doc_id % 23 AS VARCHAR) AS make,
         'model ' || CAST((doc_id * 3) % 31 AS VARCHAR) AS model,
         '2020:01:' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
           || ' ' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
           || ':' || lpad(CAST((doc_id * 7) % 60 AS VARCHAR), 2, '0')
           || ':' || lpad(CAST((doc_id * 13) % 60 AS VARCHAR), 2, '0')
           AS datetime_original,
         CAST(16 + doc_id % 32 AS INT) AS px_x,
         CAST(16 + (doc_id * 3) % 32 AS INT) AS px_y,
         (doc_id % 3 = 0) AS gps,
         (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END)
           * (CAST(doc_id % 90 AS DOUBLE)
              + CAST((doc_id * 7) % 60 AS DOUBLE) / 60.0
              + CAST((doc_id * 13) % 60 AS DOUBLE) / 3600.0) AS lat,
         (CASE WHEN doc_id % 4 < 2 THEN 1 ELSE -1 END)
           * (CAST((doc_id * 3) % 180 AS DOUBLE)
              + CAST((doc_id * 11) % 60 AS DOUBLE) / 60.0
              + CAST((doc_id * 17) % 60 AS DOUBLE) / 3600.0) AS lon
  FROM documents
)
SELECT doc_id,
       CAST(ok AS INT) AS has_exif,
       CASE WHEN ok THEN endian END AS endian,
       CASE WHEN ok THEN orientation END AS orientation,
       CASE WHEN ok THEN make END AS make,
       CASE WHEN ok THEN model END AS model,
       CASE WHEN ok THEN datetime_original END AS datetime_original,
       CASE WHEN ok THEN px_x END AS px_x,
       CASE WHEN ok THEN px_y END AS px_y,
       CASE WHEN ok THEN CAST(gps AS INT) END AS has_gps,
       CASE WHEN ok AND gps THEN lat END AS gps_lat,
       CASE WHEN ok AND gps THEN lon END AS gps_lon
FROM g ORDER BY doc_id
"""
