"""AVIF/HEIF still-image census — the ISOBMFF `meta`-box item walk.

Modern crawls serve AVIF (AV1-in-HEIF) at double-digit share, and the
same item structure carries HEIC; before r17 every such payload
censused as unknown/corrupt (triage routed all ftyp brands to the
moov/trak video walk, which stills don't have). This module decodes
what a crawl-side image-curation pass needs WITHOUT touching the AV1
sample payloads — the still-image metadata lives entirely in the
`meta` box tree (ISO/IEC 23008-12, public spec):

  ftyp            brand census (avif / avis / heic / heif / mif1)
  meta/hdlr       must be 'pict' (identity-first: a still brand whose
                  handler isn't a picture rejects whole)
  meta/pitm       primary item (v0 u16 / v1 u32 ids)
  meta/iinf/infe  item directory (v2 u16 / v3 u32 ids, item types)
  meta/iloc       item extents (versions 0/1/2, parameterized offset/
                  length/base-offset widths, construction method 0) —
                  every extent validated against the file, so a
                  truncated payload rejects whole
  meta/iprp/ipco  property pool: ispe (dims), pixi (channel bit
                  depths), irot/imir (orientation), av1C, auxC
  meta/iprp/ipma  property associations (1- and 2-byte index forms),
                  indices validated against the pool
  meta/iref       dimg (grid tiles, count cross-checked against the
                  grid descriptor), auxl (alpha plane), cdsc (Exif)
  grid items      derived-image descriptor decoded from its extent
                  (rows/cols/output dims, u16 and u32 field forms)
  Exif items      payload = u32 tiff-header offset + TIFF block,
                  routed through the certified IFD walker
                  (multimodal/exif.py — the same walker the JPEG/TIFF/
                  WebP EXIF entries certify)

WHY AV1 SAMPLE DECODE STAYS OUT OF SCOPE: the av01 item payloads are
AV1 OBU bitstreams whose decode needs the codec's large fixed
probability/transform tables — the exact certifiability boundary
documented for lossy VP8 (webp.py) and MP3 (mp3.py). The item walk,
by contrast, is pure in-band structure: field widths, offsets and
cross-table counts, fully certifiable by a synthesized round trip.

Reference parity: the reference repo has no image pipeline; this is
part of the multimodal-column brief (opaque binary + typed metadata +
real decode where certifiable).
"""

from __future__ import annotations

import struct
from typing import Optional

from danae_spark.multimodal.mp4 import _box, _full, iter_boxes

__all__ = [
    "parse_avif",
    "synth_avif",
    "avif_census_frame",
    "avif_census_roundtrip",
    "AVIF_CENSUS_ORACLE",
    "STILL_BRANDS",
]

STILL_BRANDS = (b"avif", b"avis", b"heic", b"heif", b"mif1")


class _Bad(Exception):
    pass


def _u(buf: bytes, at: int, n: int) -> int:
    if n == 0:
        return 0
    if at + n > len(buf):
        raise _Bad
    return int.from_bytes(buf[at : at + n], "big")


# ------------------------------------------------------------- parsing


def _parse_iloc(b: bytes) -> dict[int, list[tuple[int, int]]]:
    """ItemLocationBox → {item_id: [(abs_offset, length), ...]}.
    Only construction method 0 (file offsets) is supported; method 1
    (idat) or 2 (item) rejects whole — never census what you could not
    locate."""
    version = b[0]
    if version > 2:
        raise _Bad
    sizes = b[4]
    offset_size, length_size = sizes >> 4, sizes & 15
    sizes2 = b[5]
    base_size = sizes2 >> 4
    index_size = (sizes2 & 15) if version in (1, 2) else 0
    if any(s not in (0, 4, 8) for s in (offset_size, length_size, base_size)):
        raise _Bad
    if version < 2:
        count = _u(b, 6, 2)
        pos = 8
    else:
        count = _u(b, 6, 4)
        pos = 10
    out: dict[int, list[tuple[int, int]]] = {}
    for _ in range(count):
        if version < 2:
            item_id = _u(b, pos, 2)
            pos += 2
        else:
            item_id = _u(b, pos, 4)
            pos += 4
        if version in (1, 2):
            method = _u(b, pos, 2) & 0xF
            pos += 2
            if method != 0:
                raise _Bad
        pos += 2  # data_reference_index (0 = this file)
        base = _u(b, pos, base_size)
        pos += base_size
        n_ext = _u(b, pos, 2)
        pos += 2
        exts = []
        for _e in range(n_ext):
            pos += index_size
            off = _u(b, pos, offset_size)
            pos += offset_size
            ln = _u(b, pos, length_size)
            pos += length_size
            exts.append((base + off, ln))
        out[item_id] = exts
    return out


def _parse_iinf(b: bytes) -> dict[int, str]:
    """ItemInfoBox → {item_id: item_type}."""
    version = b[0]
    pos = 6 if version == 0 else 8
    items: dict[int, str] = {}
    for t, eb in iter_boxes(b[pos:]):
        if t != b"infe":
            continue
        ever = eb[0]
        if ever < 2:
            raise _Bad  # pre-HEIF infe has no item_type
        if ever == 2:
            item_id = _u(eb, 4, 2)
            at = 8
        else:
            item_id = _u(eb, 4, 4)
            at = 10
        items[item_id] = eb[at : at + 4].decode("ascii", "replace")
    return items


def _parse_ipco(b: bytes) -> list[tuple]:
    """ItemPropertyContainerBox → ordered property list (1-based in
    ipma). Unknown property boxes are kept as opaque entries so the
    association indices stay aligned."""
    props: list[tuple] = []
    for t, pb in iter_boxes(b):
        if t == b"ispe":
            props.append(("ispe", _u(pb, 4, 4), _u(pb, 8, 4)))
        elif t == b"pixi":
            n = pb[4]
            if 5 + n > len(pb):
                raise _Bad
            props.append(("pixi", list(pb[5 : 5 + n])))
        elif t == b"irot":
            props.append(("irot", pb[0] & 3))
        elif t == b"imir":
            props.append(("imir", pb[0] & 1))
        elif t == b"auxC":
            props.append(("auxC", pb[4:].split(b"\x00", 1)[0].decode("ascii", "replace")))
        else:
            props.append((t.decode("ascii", "replace"), None))
    return props


def _parse_ipma(b: bytes, n_props: int) -> dict[int, list[int]]:
    """ItemPropertyAssociationBox → {item_id: [1-based prop indices]}.
    An index past the pool is structural corruption: reject whole."""
    version, flags = b[0], _u(b, 1, 3)
    count = _u(b, 4, 4)
    pos = 8
    out: dict[int, list[int]] = {}
    for _ in range(count):
        if version == 0:
            item_id = _u(b, pos, 2)
            pos += 2
        else:
            item_id = _u(b, pos, 4)
            pos += 4
        n_assoc = b[pos] if pos < len(b) else None
        if n_assoc is None:
            raise _Bad
        pos += 1
        idxs = []
        for _a in range(n_assoc):
            if flags & 1:
                ix = _u(b, pos, 2) & 0x7FFF
                pos += 2
            else:
                ix = b[pos] & 0x7F
                pos += 1
            if ix > n_props:
                raise _Bad
            if ix:
                idxs.append(ix)
        out[item_id] = idxs
    return out


def _parse_iref(b: bytes) -> dict[str, list[tuple[int, list[int]]]]:
    """ItemReferenceBox → {ref_type: [(from_id, [to_ids])]}."""
    version = b[0]
    w = 2 if version == 0 else 4
    refs: dict[str, list[tuple[int, list[int]]]] = {}
    for t, rb in iter_boxes(b[4:]):
        frm = _u(rb, 0, w)
        n = _u(rb, w, 2)
        tos = [_u(rb, w + 2 + i * w, w) for i in range(n)]
        refs.setdefault(t.decode("ascii", "replace"), []).append((frm, tos))
    return refs


def _item_bytes(payload: bytes, exts: list[tuple[int, int]]) -> bytes:
    out = b""
    for off, ln in exts:
        if off + ln > len(payload):
            raise _Bad
        out += payload[off : off + ln]
    return out


def parse_avif(payload: bytes) -> Optional[dict]:
    """One census row for an AVIF/HEIF still payload, or None for a
    non-still brand / any structural corruption (reject-whole)."""
    try:
        return _parse(bytes(payload))
    except (_Bad, struct.error, IndexError, UnicodeDecodeError):
        return None


def _parse(p: bytes) -> Optional[dict]:
    if len(p) < 16:
        return None
    ftyp = meta = None
    for t, b in iter_boxes(p):
        if t == b"ftyp" and ftyp is None:
            ftyp = b
        elif t == b"meta" and meta is None:
            meta = b
    if ftyp is None or len(ftyp) < 4 or ftyp[:4] not in STILL_BRANDS:
        return None
    brand = ftyp[:4].decode("ascii")
    if meta is None:
        raise _Bad  # claimed the still grammar: no meta tree is corrupt
    mbody = meta[4:]  # meta is a FullBox

    hdlr = pitm = iloc_b = iinf = iprp = iref_b = None
    for t, b in iter_boxes(mbody):
        if t == b"hdlr":
            hdlr = b
        elif t == b"pitm":
            pitm = b
        elif t == b"iloc":
            iloc_b = b
        elif t == b"iinf":
            iinf = b
        elif t == b"iprp":
            iprp = b
        elif t == b"iref":
            iref_b = b
    if hdlr is None or len(hdlr) < 12 or hdlr[8:12] != b"pict":
        raise _Bad
    if pitm is None or iloc_b is None or iinf is None or iprp is None:
        raise _Bad
    primary = _u(pitm, 4, 2) if pitm[0] == 0 else _u(pitm, 4, 4)

    items = _parse_iinf(iinf)
    iloc = _parse_iloc(iloc_b)
    # every located extent must lie inside the file — the truncation
    # reject (validated up front, not lazily per consumed item)
    for exts in iloc.values():
        for off, ln in exts:
            if off + ln > len(p):
                raise _Bad
    ipco_b = ipma_b = None
    for t, b in iter_boxes(iprp):
        if t == b"ipco":
            ipco_b = b
        elif t == b"ipma":
            ipma_b = b
    if ipco_b is None or ipma_b is None:
        raise _Bad
    props = _parse_ipco(ipco_b)
    assoc = _parse_ipma(ipma_b, len(props))
    refs = _parse_iref(iref_b) if iref_b is not None else {}

    if primary not in items:
        raise _Bad

    def item_props(item_id: int) -> list[tuple]:
        return [props[i - 1] for i in assoc.get(item_id, [])]

    width = height = None
    n_channels = bit_depth = None
    rotation = mirror = None
    for pr in item_props(primary):
        if pr[0] == "ispe":
            width, height = pr[1], pr[2]
        elif pr[0] == "pixi":
            n_channels = len(pr[1])
            bit_depth = pr[1][0] if pr[1] else None
        elif pr[0] == "irot":
            rotation = pr[1] * 90
        elif pr[0] == "imir":
            mirror = pr[1]

    grid_rows = grid_cols = None
    if items[primary] == "grid":
        gb = _item_bytes(p, iloc.get(primary, []))
        if len(gb) < 8:
            raise _Bad
        flags = gb[1]
        grid_rows, grid_cols = gb[2] + 1, gb[3] + 1
        fw = 4 if flags & 1 else 2
        out_w, out_h = _u(gb, 4, fw), _u(gb, 4 + fw, fw)
        # the descriptor's output dims must agree with the grid item's
        # ispe property (both are mandatory; disagreement is corruption)
        if width is not None and (out_w, out_h) != (width, height):
            raise _Bad
        tiles = [tos for frm, tos in refs.get("dimg", []) if frm == primary]
        if not tiles or len(tiles[0]) != grid_rows * grid_cols:
            raise _Bad

    has_alpha = any(
        primary in tos for _frm, tos in refs.get("auxl", [])
    )

    n_av01 = sum(1 for t in items.values() if t == "av01")
    av01_bytes = sum(
        ln
        for iid, t in items.items()
        if t == "av01"
        for _off, ln in iloc.get(iid, [])
    )

    exif_orientation = exif_make = None
    for iid, t in items.items():
        if t != "Exif":
            continue
        eb = _item_bytes(p, iloc.get(iid, []))
        if len(eb) < 4:
            raise _Bad
        tiff_off = _u(eb, 0, 4)
        blob = eb[4 + tiff_off :]
        if blob[:6] == b"Exif\x00\x00":
            blob = blob[6:]
        from danae_spark.multimodal.exif import _parse_tiff_block

        ex = _parse_tiff_block(blob)
        if ex is None:
            raise _Bad  # the item claimed the Exif grammar and lied
        exif_orientation = ex.get("orientation")
        exif_make = ex.get("make")
        break

    return {
        "brand": brand,
        "width": width,
        "height": height,
        "n_channels": n_channels,
        "bit_depth": bit_depth,
        "rotation": rotation,
        "mirror": mirror,
        "n_items": len(items),
        "n_av01": n_av01,
        "av01_bytes": av01_bytes,
        "grid_rows": grid_rows,
        "grid_cols": grid_cols,
        "has_alpha": has_alpha,
        "exif_orientation": exif_orientation,
        "exif_make": exif_make,
    }


# ----------------------------------------------------------- synthesis
#
# Doc-arithmetic grid (restated verbatim in AVIF_CENSUS_ORACLE):
#   variant v = d % 4: 0 plain still, 1 still + irot/imir + Exif item,
#                      2 grid-derived image, 3 still + alpha aux item
#   brand = [avif, mif1, avif, heic][v]
#   tile_w = 8·(1 + d % 8); tile_h = 8·(1 + (d // 2) % 8)
#   grid rows = 1 + d % 3; cols = 1 + (d // 3) % 3 (v2 only)
#   width = v2 ? cols·tile_w : tile_w (ditto height with rows)
#   channels = 1 if d % 5 == 0 else 3; bits = [8, 10, 12][d % 3]
#   rotation = (d % 4)·90, mirror = d % 2 (v1 only)
#   exif: orientation = 1 + d % 8, make = 'cam' + (d % 5) (v1 only)
#   av01 payload k: 40 + (d·7 + k·3) % 100 bytes
#   d % 19 == 7: an iloc extent runs past EOF (truncation reject)
#   d % 23 == 11: an ipma index points past the ipco pool (reject)


def _geom(d: int) -> dict:
    v = d % 4
    tile_w, tile_h = 8 * (1 + d % 8), 8 * (1 + (d // 2) % 8)
    rows, cols = 1 + d % 3, 1 + (d // 3) % 3
    return {
        "v": v,
        "brand": [b"avif", b"mif1", b"avif", b"heic"][v],
        "tile_w": tile_w,
        "tile_h": tile_h,
        "rows": rows,
        "cols": cols,
        "width": cols * tile_w if v == 2 else tile_w,
        "height": rows * tile_h if v == 2 else tile_h,
        "channels": 1 if d % 5 == 0 else 3,
        "bits": [8, 10, 12][d % 3],
        "n_av01": {0: 1, 1: 1, 2: rows * cols, 3: 2}[v],
    }


def _av01_len(d: int, k: int) -> int:
    return 40 + (d * 7 + k * 3) % 100


def synth_avif(d: int) -> bytes:
    """Byte-for-byte AVIF/HEIF still: real box framing, versioned
    pitm/iinf/iloc/ipma forms rotating on doc parity, iloc offsets
    addressing the actual mdat bytes (built twice, placeholder first —
    the synth_mp4 pattern), a real TIFF block for the Exif item, and a
    real grid descriptor whose dimg reference list the parser
    cross-checks. Two corruption legs exercise reject-whole."""
    g = _geom(d)
    v = g["v"]

    # ---- item table: (id, type, payload bytes)
    items: list[tuple[int, bytes, bytes]] = []
    k = 0

    def av01() -> bytes:
        nonlocal k
        ln = _av01_len(d, k)
        body = bytes(((d + k + i) % 251 for i in range(ln)))
        k += 1
        return body

    if v == 0:
        items.append((1, b"av01", av01()))
        primary = 1
    elif v == 1:
        items.append((1, b"av01", av01()))
        from danae_spark.multimodal.exif import (
            _IfdBuilder,
            _TAG_MAKE,
            _TAG_ORIENTATION,
        )

        ifd = _IfdBuilder("<")
        ifd.ascii(_TAG_MAKE, f"cam{d % 5}")
        ifd.short(_TAG_ORIENTATION, 1 + d % 8)
        tiff = b"II*\x00" + struct.pack("<L", 8) + ifd.render(8)
        items.append((2, b"Exif", struct.pack(">I", 0) + tiff))
        primary = 1
    elif v == 2:
        grid = bytes((0, 0, g["rows"] - 1, g["cols"] - 1)) + struct.pack(
            ">HH", g["width"], g["height"]
        )
        items.append((1, b"grid", grid))
        for _t in range(g["rows"] * g["cols"]):
            items.append((len(items) + 1, b"av01", av01()))
        primary = 1
    else:
        items.append((1, b"av01", av01()))
        items.append((2, b"av01", av01()))  # the alpha plane
        primary = 1

    # ---- property pool + associations
    props: list[bytes] = [
        _full(b"ispe", 0, struct.pack(">II", g["width"], g["height"])),
        _full(b"pixi", 0, bytes((g["channels"],)) + bytes([g["bits"]] * g["channels"])),
        _box(b"av1C", bytes((0x81, 0, 0, 0))),
    ]
    assoc: dict[int, list[int]] = {primary: [1, 2] if v == 2 else [1, 2, 3]}
    if v == 1:
        props.append(_box(b"irot", bytes((d % 4,))))
        props.append(_box(b"imir", bytes((d % 2,))))
        assoc[primary] = assoc[primary] + [4, 5]
    if v == 2:
        tile_ispe = _full(
            b"ispe", 0, struct.pack(">II", g["tile_w"], g["tile_h"])
        )
        props.append(tile_ispe)
        for iid, t, _pl in items:
            if t == b"av01":
                assoc[iid] = [4, 3]
    if v == 3:
        props.append(_full(b"auxC", 0, b"urn:mpeg:mpegB:cicp:systems:auxiliary:alpha\x00"))
        assoc[2] = [1, 2, 3, 4]

    bad_ipma = d % 23 == 11
    if bad_ipma:
        assoc[primary] = assoc[primary] + [len(props) + 3]  # past the pool

    # ---- boxes (versioned forms rotate on doc parity)
    hdlr = _full(b"hdlr", 0, b"\x00" * 4 + b"pict" + b"\x00" * 13)
    if d % 2 == 0:
        pitm = _full(b"pitm", 0, struct.pack(">H", primary))
    else:
        pitm = _box(b"pitm", bytes((1, 0, 0, 0)) + struct.pack(">I", primary))

    infe_ver = 2 + d % 2
    infes = b""
    for iid, t, _pl in items:
        if infe_ver == 2:
            body = struct.pack(">HH", iid, 0) + t + b"\x00"
        else:
            body = struct.pack(">IH", iid, 0) + t + b"\x00"
        infes += _box(b"infe", bytes((infe_ver, 0, 0, 0)) + body)
    if d % 2 == 0:
        iinf = _full(b"iinf", 0, struct.pack(">H", len(items)) + infes)
    else:
        iinf = _box(
            b"iinf", bytes((1, 0, 0, 0)) + struct.pack(">I", len(items)) + infes
        )

    ipco = _box(b"ipco", b"".join(props))
    wide = d % 2 == 1
    ipma_body = struct.pack(">I", len(assoc))
    for iid in sorted(assoc):
        ipma_body += struct.pack(">H", iid) + bytes((len(assoc[iid]),))
        for ix in assoc[iid]:
            if wide:
                ipma_body += struct.pack(">H", 0x8000 | ix)
            else:
                ipma_body += bytes((0x80 | ix,))
    ipma = _box(b"ipma", bytes((0, 0, 0, 1 if wide else 0)) + ipma_body)
    iprp = _box(b"iprp", ipco + ipma)

    ref_boxes = b""
    if v == 1:
        ref_boxes += _box(b"cdsc", struct.pack(">HHH", 2, 1, 1))
    if v == 2:
        tile_ids = [iid for iid, t, _pl in items if t == b"av01"]
        ref_boxes += _box(
            b"dimg",
            struct.pack(">HH", 1, len(tile_ids))
            + b"".join(struct.pack(">H", t) for t in tile_ids),
        )
    if v == 3:
        ref_boxes += _box(b"auxl", struct.pack(">HHH", 2, 1, 1))
    iref = _box(b"iref", bytes((0, 0, 0, 0)) + ref_boxes) if ref_boxes else b""

    iloc_ver = d % 3
    base_size = 4 if (d // 3) % 2 else 0

    def build_iloc(payload_at: int) -> bytes:
        body = bytes((0x44, base_size << 4))  # offset/length 4; index 0
        if iloc_ver < 2:
            body += struct.pack(">H", len(items))
        else:
            body += struct.pack(">I", len(items))
        off = 0
        for iid, _t, pl in items:
            body += (
                struct.pack(">H", iid) if iloc_ver < 2 else struct.pack(">I", iid)
            )
            if iloc_ver in (1, 2):
                body += struct.pack(">H", 0)  # construction method 0
            body += struct.pack(">H", 0)  # data_reference_index
            if base_size:
                body += struct.pack(">I", payload_at)
                rel = off
            else:
                rel = payload_at + off
            body += struct.pack(">HII", 1, rel, len(pl))
            off += len(pl)
        return _box(b"iloc", bytes((iloc_ver, 0, 0, 0)) + body)

    def build_meta(payload_at: int) -> bytes:
        return _box(
            b"meta",
            bytes(4)
            + hdlr
            + pitm
            + build_iloc(payload_at)
            + iinf
            + iprp
            + iref,
        )

    ftyp = _box(b"ftyp", g["brand"] + struct.pack(">I", 0) + g["brand"] + b"mif1")
    placeholder = build_meta(0)
    payload_at = len(ftyp) + len(placeholder) + 8
    meta = build_meta(payload_at)
    assert len(meta) == len(placeholder)
    blob = b"".join(pl for _iid, _t, pl in items)
    out = ftyp + meta + _box(b"mdat", blob)
    if d % 19 == 7:
        out = out[:-1]  # the last item's extent now runs past EOF
    return out


# ---------------------------------------------------- Spark entry points

_SCHEMA = (
    "doc_id bigint, brand string, width int, height int, n_channels int, "
    "bit_depth int, rotation int, mirror int, n_items int, n_av01 int, "
    "av01_bytes bigint, grid_rows int, grid_cols int, has_alpha boolean, "
    "exif_orientation int, exif_make string"
)
_COLS = [
    "brand", "width", "height", "n_channels", "bit_depth", "rotation",
    "mirror", "n_items", "n_av01", "av01_bytes", "grid_rows", "grid_cols",
    "has_alpha", "exif_orientation", "exif_make",
]


def avif_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """AVIF/HEIF census over any (id, binary) frame: one Arrow-batched
    narrow map, no shuffle (multimodal/docframes.py)."""
    from danae_spark.multimodal.docframes import blob_extract_frame

    return blob_extract_frame(df, parse_avif, _COLS, _SCHEMA, id_col, payload_col)


def avif_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable roundtrip: per doc a real ISOBMFF still is
    synthesized (four variants: plain / orientation+Exif / grid /
    alpha; versioned pitm/iinf/iloc/ipma forms; iloc offsets
    addressing the real mdat bytes), the meta-box walk decodes it with
    extent/association/grid validation on, and every census column is
    restated as doc_id arithmetic. d % 19 == 7 truncates an extent and
    d % 23 == 11 corrupts an ipma index — both reject whole."""
    from danae_spark.multimodal.docframes import synth_roundtrip

    return synth_roundtrip(spark, sf_dir, synth_avif, parse_avif, _COLS, _SCHEMA)


AVIF_CENSUS_ORACLE = """
WITH d0 AS (
  SELECT doc_id, doc_id AS d, doc_id % 4 AS v,
         CASE WHEN doc_id % 19 = 7 OR doc_id % 23 = 11 THEN 1 ELSE 0 END AS rej,
         8 * (1 + doc_id % 8) AS tile_w,
         8 * (1 + (doc_id // 2) % 8) AS tile_h,
         1 + doc_id % 3 AS rows_, 1 + (doc_id // 3) % 3 AS cols_
  FROM documents
),
g AS (
  SELECT *,
         CASE v WHEN 2 THEN cols_ * tile_w ELSE tile_w END AS width,
         CASE v WHEN 2 THEN rows_ * tile_h ELSE tile_h END AS height,
         CASE v WHEN 0 THEN 1 WHEN 1 THEN 1
                WHEN 2 THEN rows_ * cols_ ELSE 2 END AS n_av01,
         CASE v WHEN 0 THEN 1 WHEN 1 THEN 2
                WHEN 2 THEN 1 + rows_ * cols_ ELSE 2 END AS n_items
  FROM d0
),
ab AS (
  SELECT g.doc_id,
         CAST(sum(40 + (g.d * 7 + k.k * 3) % 100) AS BIGINT) AS av01_bytes
  FROM g JOIN generate_series(0, 8) k(k) ON k.k < g.n_av01
  WHERE g.rej = 0
  GROUP BY g.doc_id
)
SELECT g.doc_id,
       CASE WHEN rej = 1 THEN NULL
            ELSE (CASE v WHEN 0 THEN 'avif' WHEN 1 THEN 'mif1'
                         WHEN 2 THEN 'avif' ELSE 'heic' END) END AS brand,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(width AS INT) END AS width,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(height AS INT) END AS height,
       CASE WHEN rej = 1 THEN NULL
            ELSE CAST(CASE WHEN d % 5 = 0 THEN 1 ELSE 3 END AS INT)
            END AS n_channels,
       CASE WHEN rej = 1 THEN NULL
            ELSE CAST(CASE d % 3 WHEN 0 THEN 8 WHEN 1 THEN 10 ELSE 12 END AS INT)
            END AS bit_depth,
       CASE WHEN rej = 1 OR v <> 1 THEN NULL
            ELSE CAST((d % 4) * 90 AS INT) END AS rotation,
       CASE WHEN rej = 1 OR v <> 1 THEN NULL
            ELSE CAST(d % 2 AS INT) END AS mirror,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(n_items AS INT) END AS n_items,
       CASE WHEN rej = 1 THEN NULL ELSE CAST(n_av01 AS INT) END AS n_av01,
       ab.av01_bytes,
       CASE WHEN rej = 1 OR v <> 2 THEN NULL
            ELSE CAST(rows_ AS INT) END AS grid_rows,
       CASE WHEN rej = 1 OR v <> 2 THEN NULL
            ELSE CAST(cols_ AS INT) END AS grid_cols,
       CASE WHEN rej = 1 THEN NULL ELSE v = 3 END AS has_alpha,
       CASE WHEN rej = 1 OR v <> 1 THEN NULL
            ELSE CAST(1 + d % 8 AS INT) END AS exif_orientation,
       CASE WHEN rej = 1 OR v <> 1 THEN NULL
            ELSE 'cam' || CAST(d % 5 AS VARCHAR) END AS exif_make
FROM g LEFT JOIN ab USING (doc_id) ORDER BY g.doc_id
"""
