"""WebM / Matroska structural census — EBML (RFC 8794) element walk.

Crawl-scale video that isn't ISO-BMFF is overwhelmingly WebM (VP8/VP9/
AV1 + Opus/Vorbis in a Matroska EBML envelope); the MP4 walkers see
none of it. This decodes the container for real:

  - EBML primitives (RFC 8794 §4): variable-length element IDs (marker
    bit kept) and sizes (marker stripped), unknown-size elements
    (permitted for Segment, treated as to-EOF), unsigned/float payload
    parsing (4- and 8-byte IEEE big-endian), and the skip-unknown
    contract that gives EBML its forward compatibility;
  - document layer (Matroska v4 / WebM): EBML header DocType check,
    Segment → Info (TimestampScale, float Duration), Tracks →
    TrackEntry (number, type, CodecID, Video PixelWidth/PixelHeight,
    Audio SamplingFrequency/Channels), Cluster → Timestamp +
    SimpleBlock (VINT track ref, signed 16-bit relative timestamp,
    keyframe flag) with ALL THREE lacing schemes (§Matroska block
    structure): Xiph 255-chain size tables, fixed-size lacing
    (even-division check), and EBML lacing (unsigned first size +
    signed-VINT deltas) — laced Opus/Vorbis-in-WebM audio is routine
    in real files, and an unlaced-only reader rejects all of it;
  - integrity: element sizes must land inside their parent and the
    file, every SimpleBlock's track VINT must reference a declared
    TrackEntry, the Info Duration must equal the last block timestamp
    plus its cluster base (the same container-vs-content cross-check
    as the Ogg granule validation). Violations reject the file whole.

Codec (frame payload) decode shares the MP4/MP3 boundary: VP9/AV1/
Opus bitstream decode is out of scope; the container structure is
fully in-band and certifiable.

Reference parity note: the reference (smartdatalake/danae profiler)
treats non-tabular files as opaque; this is mandated multimodal
extension surface.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

__all__ = [
    "parse_webm",
    "parse_mkv_tags",
    "synth_webm",
    "synth_webm_tagged",
    "webm_census_frame",
    "webm_census_roundtrip",
    "mkv_tags_frame",
    "mkv_tags_roundtrip",
    "WEBM_CENSUS_ORACLE",
    "MKV_TAGS_ORACLE",
]

# element IDs (marker bit kept, as they appear on the wire)
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_AUDIO = 0xE1
_SAMPLING = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675
_TIMESTAMP = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_BLOCK_DURATION = 0x9B
_REFERENCE_BLOCK = 0xFB
_TAGS = 0x1254C367
_TAG = 0x7373
_SIMPLE_TAG = 0x67C8
_TAG_NAME = 0x45A3
_TAG_STRING = 0x4487
_TAG_LANGUAGE = 0x447A
_TAG_DEFAULT = 0x4484


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int] | None:
    """(value, new_pos); None on truncation or a zero lead byte (no
    marker bit in the first 8 bits — invalid per RFC 8794 §4)."""
    if pos >= len(data):
        return None
    b0 = data[pos]
    if b0 == 0:
        return None
    length = 8 - b0.bit_length() + 1
    if pos + length > len(data):
        return None
    v = b0 if keep_marker else b0 & (0xFF >> length)
    for i in range(1, length):
        v = (v << 8) | data[pos + i]
    return v, pos + length


def _read_element(data: bytes, pos: int, end: int) -> tuple[int, int, int, int] | None:
    """(element_id, payload_start, payload_end, unknown_size_flag<0|1>)
    with payload_end clamped to `end` for unknown-size elements."""
    rid = _read_vint(data, pos, keep_marker=True)
    if rid is None:
        return None
    eid, pos = rid
    if pos >= len(data):
        return None
    b0 = data[pos]
    if b0 == 0:
        return None
    length = 8 - b0.bit_length() + 1
    if pos + length > len(data):
        return None
    size = b0 & (0xFF >> length)
    all_ones = size == (0xFF >> length)
    for i in range(1, length):
        size = (size << 8) | data[pos + i]
        all_ones = all_ones and data[pos + i] == 0xFF
    pos += length
    if all_ones:  # unknown size: runs to the end of the parent
        return eid, pos, end, 1
    if pos + size > end:
        return None
    return eid, pos, pos + size, 0


def _uint(data: bytes) -> int:
    v = 0
    for b in data:
        v = (v << 8) | b
    return v


def _lace_sizes(payload: bytes, dpos: int, ce: int, lace_type: int) -> list[int] | None:
    """Decode a SimpleBlock's lacing size table starting at the lace
    count byte; returns the full per-frame size list (the last Xiph/
    EBML frame is the remainder). None on any structural violation."""
    if dpos >= ce:
        return None
    n_lace = payload[dpos] + 1  # stored as count - 1
    dpos += 1
    sizes: list[int] = []
    if lace_type == 1:  # Xiph: 255-chains for frames 0..n-2
        for _ in range(n_lace - 1):
            sz = 0
            while True:
                if dpos >= ce:
                    return None
                b = payload[dpos]
                dpos += 1
                sz += b
                if b < 255:
                    break
            sizes.append(sz)
    elif lace_type == 3:  # EBML: unsigned first size, signed deltas
        rv = _read_vint(payload, dpos, keep_marker=False)
        if rv is None or rv[1] > ce:
            return None
        prev, dpos = rv
        sizes.append(prev)
        for _ in range(n_lace - 2):
            rv = _read_vint(payload, dpos, keep_marker=False)
            if rv is None or rv[1] > ce:
                return None
            v, npos = rv
            ln = npos - dpos
            prev += v - ((1 << (7 * ln - 1)) - 1)  # signed-VINT bias
            if prev < 0:
                return None
            sizes.append(prev)
            dpos = npos
    else:  # fixed: no size table, the data must divide evenly
        total = ce - dpos
        if n_lace == 0 or total % n_lace:
            return None
        return [total // n_lace] * n_lace
    rem = (ce - dpos) - sum(sizes)
    if rem < 0:
        return None
    sizes.append(rem)  # the last frame is whatever remains
    return sizes


def _float(data: bytes) -> float | None:
    if len(data) == 4:
        return struct.unpack(">f", data)[0]
    if len(data) == 8:
        return struct.unpack(">d", data)[0]
    return None


def _children(data: bytes, start: int, end: int):
    pos = start
    while pos < end:
        el = _read_element(data, pos, end)
        if el is None:
            raise ValueError("malformed element")
        yield el
        pos = el[2]


def _parse_block(
    payload: bytes, cs: int, ce: int, tracks: dict, simple: bool
) -> tuple[int, int, int, int] | None:
    """Decode a SimpleBlock/Block body: (rel_ts, flags, frame_bytes,
    n_frames) with lacing resolved. A Block (inside a BlockGroup) must
    have the SimpleBlock-only keyframe bit clear. None on violations."""
    rtn = _read_vint(payload, cs, keep_marker=False)
    if rtn is None:
        return None
    track_no, bpos = rtn
    if track_no not in tracks:
        return None
    if bpos + 3 > ce:
        return None
    rel = struct.unpack(">h", payload[bpos : bpos + 2])[0]
    flags = payload[bpos + 2]
    if not simple and flags & 0x80:
        return None  # keyframe bit is SimpleBlock-only
    lace_type = (flags >> 1) & 0x03
    if lace_type == 0:
        return rel, flags, ce - (bpos + 3), 1
    sizes = _lace_sizes(payload, bpos + 3, ce, lace_type)
    if sizes is None:
        return None
    return rel, flags, sum(sizes), len(sizes)


def parse_webm(payload: bytes) -> dict | None:
    """Walk a WebM/Matroska file into one census row:

      doc_type, timescale_ns, duration_ms
      n_tracks, n_video, n_audio, width, height (first video track),
      audio_rate, audio_channels (first audio track)
      n_clusters, n_blocks, n_frames (laced frames counted
      individually), n_keyframes, media_bytes (frame payload bytes,
      lacing size tables excluded)

    Unknown elements are skipped per the EBML contract; structural
    violations (truncated VINTs, sizes escaping parents, SimpleBlocks
    referencing undeclared tracks, malformed lacing tables, a Duration
    that contradicts the last block timestamp) reject the file whole."""
    try:
        return _parse_webm_inner(payload)
    except (IndexError, ValueError, struct.error):
        return None


def _parse_webm_inner(payload: bytes) -> dict | None:
    n = len(payload)
    top = _read_element(payload, 0, n)
    if top is None or top[0] != _EBML:
        return None
    doc_type = None
    for eid, s, e, _u in _children(payload, top[1], top[2]):
        if eid == _DOCTYPE:
            doc_type = payload[s:e].rstrip(b"\x00").decode("ascii", "replace")
    if doc_type not in ("webm", "matroska"):
        return None

    seg = _read_element(payload, top[2], n)
    if seg is None or seg[0] != _SEGMENT:
        return None

    timescale = 1_000_000  # ns per tick (Matroska default)
    duration_ticks: float | None = None
    tracks: dict[int, dict] = {}
    n_clusters = 0
    n_blocks = 0
    n_frames = 0
    n_keyframes = 0
    media_bytes = 0
    last_ts: int | None = None

    for eid, s, e, _u in _children(payload, seg[1], seg[2]):
        if eid == _INFO:
            for cid, cs, ce, _cu in _children(payload, s, e):
                if cid == _TS_SCALE:
                    timescale = _uint(payload[cs:ce])
                elif cid == _DURATION:
                    duration_ticks = _float(payload[cs:ce])
                    if duration_ticks is None:
                        return None
        elif eid == _TRACKS:
            for cid, cs, ce, _cu in _children(payload, s, e):
                if cid != _TRACK_ENTRY:
                    continue
                t: dict = {}
                for tid, ts_, te, _tu in _children(payload, cs, ce):
                    if tid == _TRACK_NUMBER:
                        t["number"] = _uint(payload[ts_:te])
                    elif tid == _TRACK_TYPE:
                        t["type"] = _uint(payload[ts_:te])
                    elif tid == _CODEC_ID:
                        t["codec"] = payload[ts_:te].decode("ascii", "replace")
                    elif tid == _VIDEO:
                        for vid, vs, ve, _vu in _children(payload, ts_, te):
                            if vid == _PIXEL_W:
                                t["width"] = _uint(payload[vs:ve])
                            elif vid == _PIXEL_H:
                                t["height"] = _uint(payload[vs:ve])
                    elif tid == _AUDIO:
                        for aid, as_, ae, _au in _children(payload, ts_, te):
                            if aid == _SAMPLING:
                                f = _float(payload[as_:ae])
                                if f is None:
                                    return None
                                t["rate"] = int(f)
                            elif aid == _CHANNELS:
                                t["channels"] = _uint(payload[as_:ae])
                if "number" not in t or "type" not in t:
                    return None
                tracks[t["number"]] = t
        elif eid == _CLUSTER:
            n_clusters += 1
            cluster_ts = 0
            for cid, cs, ce, _cu in _children(payload, s, e):
                if cid == _TIMESTAMP:
                    cluster_ts = _uint(payload[cs:ce])
                elif cid == _SIMPLE_BLOCK:
                    blk = _parse_block(payload, cs, ce, tracks, simple=True)
                    if blk is None:
                        return None
                    rel, flags, frame_bytes, block_frames = blk
                    n_blocks += 1
                    n_frames += block_frames
                    if flags & 0x80:
                        n_keyframes += 1
                    media_bytes += frame_bytes
                    ts = cluster_ts + rel
                    if last_ts is None or ts > last_ts:
                        last_ts = ts
                elif cid == _BLOCK_GROUP:
                    # BlockGroup wraps a Block (same wire layout, no
                    # keyframe bit) + optional BlockDuration; the block
                    # is a keyframe iff NO ReferenceBlock child exists
                    blk = None
                    has_ref = False
                    for gid, gs, ge, _gu in _children(payload, cs, ce):
                        if gid == _BLOCK:
                            if blk is not None:
                                return None  # exactly one Block per group
                            blk = _parse_block(
                                payload, gs, ge, tracks, simple=False
                            )
                            if blk is None:
                                return None
                        elif gid == _REFERENCE_BLOCK:
                            has_ref = True
                    if blk is None:
                        return None
                    rel, _flags, frame_bytes, block_frames = blk
                    n_blocks += 1
                    n_frames += block_frames
                    if not has_ref:
                        n_keyframes += 1
                    media_bytes += frame_bytes
                    ts = cluster_ts + rel
                    if last_ts is None or ts > last_ts:
                        last_ts = ts

    if not tracks or n_blocks == 0 or last_ts is None:
        return None
    # container-vs-content cross-check (the Ogg-granule analogue):
    # declared Duration must equal the last block timestamp
    if duration_ticks is not None and round(duration_ticks) != last_ts:
        return None

    videos = [t for t in tracks.values() if t.get("type") == 1]
    audios = [t for t in tracks.values() if t.get("type") == 2]
    v0 = min(videos, key=lambda t: t["number"]) if videos else {}
    a0 = min(audios, key=lambda t: t["number"]) if audios else {}
    return {
        "doc_type": doc_type,
        "timescale_ns": timescale,
        "duration_ms": last_ts * timescale // 1_000_000,
        "n_tracks": len(tracks),
        "n_video": len(videos),
        "n_audio": len(audios),
        "width": v0.get("width"),
        "height": v0.get("height"),
        "audio_rate": a0.get("rate"),
        "audio_channels": a0.get("channels"),
        "n_clusters": n_clusters,
        "n_blocks": n_blocks,
        "n_frames": n_frames,
        "n_keyframes": n_keyframes,
        "media_bytes": media_bytes,
    }


# ------------------------------------------------- Tags (SimpleTag) walk
# The Matroska metadata analogue of ID3 / VorbisComment: Segment →
# Tags → Tag → SimpleTag(TagName, TagString[, nested SimpleTags]).


def parse_mkv_tags(payload: bytes) -> dict | None:
    """Extract Matroska Tags metadata into one census row:

      n_tags (Tag elements), n_simple_tags (SimpleTags, nested
      included), title, artist, album, tag_date (TagNames TITLE/
      ARTIST/ALBUM/DATE_RELEASED, case-insensitive, first wins),
      n_tag_chars (Σ TagString lengths)

    Strict UTF-8 on TagName/TagString and a SimpleTag without a
    TagName reject the file whole; None when no Tags element or no
    SimpleTag exists. Unknown children (TagLanguage, TagDefault,
    Targets, …) are skipped per the EBML contract."""
    try:
        return _parse_mkv_tags_inner(payload)
    except (IndexError, ValueError, struct.error, UnicodeDecodeError):
        return None


def _parse_mkv_tags_inner(payload: bytes) -> dict | None:
    n = len(payload)
    top = _read_element(payload, 0, n)
    if top is None or top[0] != _EBML:
        return None
    doc_type = None
    for eid, s, e, _u in _children(payload, top[1], top[2]):
        if eid == _DOCTYPE:
            doc_type = payload[s:e].rstrip(b"\x00").decode("ascii", "replace")
    if doc_type not in ("webm", "matroska"):
        return None
    seg = _read_element(payload, top[2], n)
    if seg is None or seg[0] != _SEGMENT:
        return None

    state = {"n_simple": 0, "n_chars": 0}
    fields: dict[str, str] = {}

    def walk_simple(s: int, e: int, depth: int) -> None:
        if depth > 4:
            raise ValueError("SimpleTag nesting too deep")
        name = value = None
        for tid, ts_, te, _tu in _children(payload, s, e):
            if tid == _TAG_NAME:
                name = payload[ts_:te].decode("utf-8")  # strict: garbled→reject
            elif tid == _TAG_STRING:
                value = payload[ts_:te].decode("utf-8")
            elif tid == _SIMPLE_TAG:
                walk_simple(ts_, te, depth + 1)
        if name is None:
            raise ValueError("SimpleTag without TagName")
        state["n_simple"] += 1
        if value is not None:
            state["n_chars"] += len(value)
            k = name.lower()
            if k in ("title", "artist", "album", "date_released") and k not in fields:
                fields[k] = value

    found = False
    n_tags = 0
    for eid, s, e, _u in _children(payload, seg[1], seg[2]):
        if eid != _TAGS:
            continue
        found = True
        for cid, cs, ce, _cu in _children(payload, s, e):
            if cid == _TAG:
                n_tags += 1
                for tid, ts_, te, _tu in _children(payload, cs, ce):
                    if tid == _SIMPLE_TAG:
                        walk_simple(ts_, te, 1)
    if not found or state["n_simple"] == 0:
        return None
    return {
        "n_tags": n_tags,
        "n_simple_tags": state["n_simple"],
        "title": fields.get("title"),
        "artist": fields.get("artist"),
        "album": fields.get("album"),
        "tag_date": fields.get("date_released"),
        "n_tag_chars": state["n_chars"],
    }


# ------------------------------------------------------------- synthesis


def _vint_size(size: int) -> bytes:
    """Encode a size VINT in the fewest bytes (marker bit in the first
    byte)."""
    for length in range(1, 9):
        if size < (1 << (7 * length)) - 1:  # avoid the all-ones pattern
            marker = 1 << (7 * length)
            v = marker | size
            return v.to_bytes(length, "big")
    raise ValueError("size too large")


def _eid(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _vint_signed(diff: int) -> bytes:
    """EBML-lacing signed size delta: diff + (2^(7·len-1) - 1) encoded
    as a VINT of the smallest sufficient length."""
    for length in range(1, 9):
        bias = (1 << (7 * length - 1)) - 1
        if -bias <= diff <= bias:
            return ((1 << (7 * length)) | (diff + bias)).to_bytes(length, "big")
    raise ValueError("delta too large")


def _el(eid: int, body: bytes) -> bytes:
    return _eid(eid) + _vint_size(len(body)) + body


def _uint_body(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def _doc_geometry(doc_id: int) -> dict:
    return {
        "has_audio": doc_id % 2 == 1,
        "width": 320 + (doc_id % 5) * 64,
        "height": 180 + (doc_id % 5) * 36,
        "audio_rate": 8000 + (doc_id % 8) * 1000,
        "audio_channels": 1 + (doc_id % 2),
        "n_clusters": 2 + (doc_id % 4),
        "blocks_per_cluster": 3 + (doc_id % 3),
        "key_step": 2 + (doc_id % 3),
        "cluster_step": 400 + (doc_id % 7) * 40,
    }


def _block_size(doc_id: int, c: int, b: int) -> int:
    return 30 + ((doc_id + c * 17 + b * 5) % 400)


def _block_rel(doc_id: int, b: int) -> int:
    return b * 30 + (doc_id % 9)


# lacing geometry: every third block (b % 3 == 2) is laced; the lace
# type cycles Xiph/fixed/EBML per (doc_id + c); frames are equal-sized
# (valid for all three schemes — fixed requires it, Xiph/EBML sizes up
# to 400+ exercise 255-chains and multi-byte VINTs)
def _block_laced(b: int) -> bool:
    return b % 3 == 2


def _lace_kind(doc_id: int, c: int) -> int:  # 1=Xiph, 2=fixed, 3=EBML
    return 1 + (doc_id + c) % 3


def _lace_n(doc_id: int, c: int, b: int) -> int:
    return 2 + (doc_id + c + b) % 3


def _lace_frame_size(doc_id: int, c: int, b: int) -> int:
    return 25 + ((doc_id * 3 + c + b * 7) % 400)


_V_CODECS = ("V_VP8", "V_VP9", "V_AV1")


def _mkv_meta(doc_id: int) -> dict:
    """Doc-deterministic Matroska tag metadata — restated verbatim in
    MKV_TAGS_ORACLE. TagName case alternates per doc to pin the
    case-insensitive matching in the value check."""
    return {
        "title": f"title {doc_id % 89} cut {(doc_id * 5) % 47}",
        "artist": f"artist {(doc_id * 7) % 71}",
        "album": f"album {(doc_id * 17) % 61}",
        "date": str(1980 + doc_id % 45),
        "description": "m" * (150 + doc_id % 83),
        "comment": f"comment {doc_id % 13}",
        "upper": doc_id % 2 == 0,
    }


def _simple_tag(name: str, value: str, nested: bytes = b"") -> bytes:
    return _el(
        _SIMPLE_TAG,
        _el(_TAG_NAME, name.encode())
        + _el(_TAG_LANGUAGE, b"und") + _el(_TAG_DEFAULT, b"\x01")
        + _el(_TAG_STRING, value.encode()) + nested,
    )


def _tags_element(m: dict) -> bytes:
    def k(name: str) -> str:
        return name.upper() if m["upper"] else name.lower()

    tag1 = _el(
        _TAG,
        _el(0x63C0, b"")  # empty Targets: whole-segment scope
        + _simple_tag(k("TITLE"), m["title"])
        + _simple_tag(k("ARTIST"), m["artist"])
        + _simple_tag(k("ALBUM"), m["album"])
        + _simple_tag(k("DATE_RELEASED"), m["date"]),
    )
    nested = _simple_tag(k("COMMENT"), m["comment"])
    tag2 = _el(_TAG, _simple_tag(k("DESCRIPTION"), m["description"], nested))
    return _el(_TAGS, tag1 + tag2)


def synth_webm_tagged(doc_id: int) -> bytes:
    """synth_webm with a REAL Matroska Tags element (nested SimpleTags,
    Targets, language/default children the walker must skip)."""
    return synth_webm(doc_id, tags=_mkv_meta(doc_id))


def synth_webm(doc_id: int, tags: dict | None = None) -> bytes:
    """Doc-deterministic WebM: EBML header, Segment with Info (scale +
    8-byte-float Duration on even docs / 4-byte on odd), Tracks (video
    VP8/VP9/AV1 cycling + optional Opus audio), Void elements the
    walker must skip, and Clusters of SimpleBlocks with a deterministic
    keyframe stride — every third block LACED, the scheme cycling
    Xiph / fixed / EBML per cluster (255-chains and multi-byte VINT
    deltas appear across the grid). Duration = last block timestamp,
    so the parser's cross-check holds."""
    g = _doc_geometry(doc_id)

    ebml = _el(
        _EBML,
        _el(0x4286, b"\x01") + _el(0x42F7, b"\x01")
        + _el(0x42F2, b"\x04") + _el(0x42F3, b"\x08")
        + _el(_DOCTYPE, b"webm") + _el(0x4287, b"\x04") + _el(0x4285, b"\x02"),
    )

    last_c = g["n_clusters"] - 1
    last_b = g["blocks_per_cluster"] - 1
    last_ts = last_c * g["cluster_step"] + _block_rel(doc_id, last_b)
    dur = (
        struct.pack(">d", float(last_ts))
        if doc_id % 2 == 0
        else struct.pack(">f", float(last_ts))
    )
    # 4-byte float is exact for these magnitudes (< 2^24)
    info = _el(
        _INFO,
        _el(_TS_SCALE, _uint_body(1_000_000)) + _el(_DURATION, dur),
    )

    video = _el(
        _TRACK_ENTRY,
        _el(_TRACK_NUMBER, b"\x01") + _el(0x73C5, _uint_body(doc_id + 1))
        + _el(_TRACK_TYPE, b"\x01")
        + _el(_CODEC_ID, _V_CODECS[doc_id % 3].encode())
        + _el(_VIDEO, _el(_PIXEL_W, _uint_body(g["width"]))
              + _el(_PIXEL_H, _uint_body(g["height"]))),
    )
    entries = video
    if g["has_audio"]:
        entries += _el(
            _TRACK_ENTRY,
            _el(_TRACK_NUMBER, b"\x02") + _el(0x73C5, _uint_body(doc_id + 2))
            + _el(_TRACK_TYPE, b"\x02") + _el(_CODEC_ID, b"A_OPUS")
            + _el(_AUDIO, _el(_SAMPLING, struct.pack(">f", float(g["audio_rate"])))
                  + _el(_CHANNELS, _uint_body(g["audio_channels"]))),
        )
    tracks = _el(_TRACKS, entries)

    clusters = b""
    for c in range(g["n_clusters"]):
        body = _el(_TIMESTAMP, _uint_body(c * g["cluster_step"]))
        for b in range(g["blocks_per_cluster"]):
            track = 2 if (g["has_audio"] and b % 2 == 1) else 1
            rel = _block_rel(doc_id, b)
            key = 0x80 if b % g["key_step"] == 0 else 0
            if _block_laced(b):
                kind = _lace_kind(doc_id, c)
                n_lace = _lace_n(doc_id, c, b)
                fsz = _lace_frame_size(doc_id, c, b)
                frames = [
                    bytes((doc_id + c + b + f + i) % 251 for i in range(fsz))
                    for f in range(n_lace)
                ]
                table = bytes([n_lace - 1])
                if kind == 1:  # Xiph 255-chains for all but the last
                    for fr in frames[:-1]:
                        sz = len(fr)
                        chain = b""
                        while sz >= 255:
                            chain += bytes([255])
                            sz -= 255
                        table += chain + bytes([sz])
                elif kind == 3:  # EBML: first size + zero deltas
                    table += _vint_size(len(frames[0]))
                    for _ in frames[1:-1]:
                        table += _vint_signed(0)
                blk = (
                    bytes([0x80 | track]) + struct.pack(">h", rel)
                    + bytes([key | (kind << 1)]) + table + b"".join(frames)
                )
            elif b == 1:
                # BlockGroup path: a Block (no keyframe bit) + a
                # BlockDuration; keyframe-ness signaled the Matroska
                # way — by OMITTING ReferenceBlock (odd clusters)
                size = _block_size(doc_id, c, b)
                frame = bytes((doc_id + c + b + i) % 251 for i in range(size))
                inner = (
                    bytes([0x80 | track]) + struct.pack(">h", rel)
                    + bytes([0]) + frame
                )
                grp = _el(_BLOCK, inner) + _el(_BLOCK_DURATION, _uint_body(30))
                if c % 2 == 0:  # non-key: references the previous frame
                    grp += _el(_REFERENCE_BLOCK, b"\xff")
                body += _el(_BLOCK_GROUP, grp)
                continue
            else:
                size = _block_size(doc_id, c, b)
                frame = bytes((doc_id + c + b + i) % 251 for i in range(size))
                blk = (
                    bytes([0x80 | track]) + struct.pack(">h", rel)
                    + bytes([key]) + frame
                )
            body += _el(_SIMPLE_BLOCK, blk)
        clusters += _el(_CLUSTER, body)

    void = _el(0xEC, b"\x00" * (10 + doc_id % 20))  # walker must skip this
    tags_el = _tags_element(tags) if tags is not None else b""
    segment = _el(_SEGMENT, info + void + tracks + tags_el + clusters)
    return ebml + segment


# ----------------------------------------------------- Spark entry points

_CENSUS_COLS = [
    "doc_type", "timescale_ns", "duration_ms", "n_tracks", "n_video",
    "n_audio", "width", "height", "audio_rate", "audio_channels",
    "n_clusters", "n_blocks", "n_frames", "n_keyframes", "media_bytes",
]

_CENSUS_SCHEMA = (
    "doc_id bigint, doc_type string, timescale_ns bigint, duration_ms bigint, "
    "n_tracks int, n_video int, n_audio int, width int, height int, "
    "audio_rate int, audio_channels int, n_clusters int, n_blocks int, "
    "n_frames int, n_keyframes int, media_bytes bigint"
)


def webm_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """WebM census over any (id, binary) frame; nulls for undecodable
    payloads, never executor errors."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = parse_webm(bytes(payload)) if payload is not None else None
                row = {id_col: rid}
                row.update({k: (c.get(k) if c else None) for k in _CENSUS_COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + _CENSUS_COLS)

    return df.mapInPandas(batches, schema=_CENSUS_SCHEMA.replace("doc_id", id_col, 1))


def webm_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable WebM census: per doc a real EBML/Matroska
    stream synthesized byte-for-byte, walked by the real parser
    (structure validation + the Duration-vs-last-block cross-check
    active), and the census restated as doc_id arithmetic."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                c = parse_webm(synth_webm(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in _CENSUS_COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + _CENSUS_COLS)

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_CENSUS_SCHEMA)
        .orderBy("doc_id")
    )


_TAGS_COLS = [
    "n_tags", "n_simple_tags", "title", "artist", "album", "tag_date",
    "n_tag_chars",
]

_TAGS_SCHEMA = (
    "doc_id bigint, n_tags int, n_simple_tags int, title string, "
    "artist string, album string, tag_date string, n_tag_chars int"
)


def mkv_tags_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Matroska Tags extraction over any (id, binary) frame; nulls for
    untagged/garbled payloads, never executor errors."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = parse_mkv_tags(bytes(payload)) if payload is not None else None
                row = {id_col: rid}
                row.update({k: (c.get(k) if c else None) for k in _TAGS_COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + _TAGS_COLS)

    return df.mapInPandas(batches, schema=_TAGS_SCHEMA.replace("doc_id", id_col, 1))


def mkv_tags_roundtrip(spark, sf_dir: str):
    """Oracle-checkable Matroska Tags extraction (the C58/C60 pattern):
    per doc a real tagged WebM stream (two Tag elements, a nested
    SimpleTag, Targets/language/default children the walker must
    skip), decoded by the real EBML walk, the metadata STRINGS
    restated in SQL."""
    from danae_spark.catalog import load_table
    from danae_spark.session import stage_parallelism
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                c = parse_mkv_tags(synth_webm_tagged(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in _TAGS_COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + _TAGS_COLS)

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_TAGS_SCHEMA)
        .orderBy("doc_id")
    )


MKV_TAGS_ORACLE = """
WITH m AS (
  SELECT doc_id,
         'title ' || CAST(doc_id % 89 AS VARCHAR) || ' cut '
           || CAST((doc_id * 5) % 47 AS VARCHAR) AS title,
         'artist ' || CAST((doc_id * 7) % 71 AS VARCHAR) AS artist,
         'album ' || CAST((doc_id * 17) % 61 AS VARCHAR) AS album,
         CAST(1980 + doc_id % 45 AS VARCHAR) AS tag_date,
         150 + doc_id % 83 AS desc_len,
         'comment ' || CAST(doc_id % 13 AS VARCHAR) AS comment
  FROM documents
)
SELECT doc_id,
       CAST(2 AS INT) AS n_tags,
       CAST(6 AS INT) AS n_simple_tags,
       title, artist, album, tag_date,
       CAST(length(title) + length(artist) + length(album)
            + length(tag_date) + desc_len + length(comment) AS INT)
         AS n_tag_chars
FROM m
ORDER BY doc_id
"""


WEBM_CENSUS_ORACLE = """
WITH g AS (
  SELECT doc_id,
         doc_id % 2 = 1 AS has_audio,
         CAST(2 + doc_id % 4 AS INT) AS n_clusters,
         CAST(3 + doc_id % 3 AS INT) AS blocks_per_cluster,
         2 + doc_id % 3 AS key_step,
         400 + (doc_id % 7) * 40 AS cluster_step
  FROM documents
),
-- every third block (b % 3 = 2) is laced: n_lace equal-sized frames
-- (_block_laced/_lace_n/_lace_frame_size restated verbatim)
blk AS (
  SELECT g.doc_id, c.c, b.b,
         CASE WHEN b.b % 3 = 2
              THEN CAST(2 + (g.doc_id + c.c + b.b) % 3 AS INT)
              ELSE 1 END AS n_lace,
         CASE WHEN b.b % 3 = 2
              THEN (2 + (g.doc_id + c.c + b.b) % 3)
                   * (25 + (g.doc_id * 3 + c.c + b.b * 7) % 400)
              ELSE 30 + (g.doc_id + c.c * 17 + b.b * 5) % 400
         END AS size_bytes,
         -- b=1 rides in a BlockGroup: keyframe iff no ReferenceBlock,
         -- which the synth omits on odd clusters
         CASE WHEN b.b = 1 THEN c.c % 2
              WHEN b.b % g.key_step = 0 THEN 1 ELSE 0 END AS is_key
  FROM g, generate_series(0, 5) c(c), generate_series(0, 5) b(b)
  WHERE c.c < g.n_clusters AND b.b < g.blocks_per_cluster
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS INT) AS n_blocks,
         CAST(sum(n_lace) AS INT) AS n_frames,
         CAST(sum(is_key) AS INT) AS n_keyframes,
         CAST(sum(size_bytes) AS BIGINT) AS media_bytes
  FROM blk GROUP BY doc_id
)
SELECT g.doc_id,
       'webm' AS doc_type,
       CAST(1000000 AS BIGINT) AS timescale_ns,
       CAST((g.n_clusters - 1) * g.cluster_step
            + (g.blocks_per_cluster - 1) * 30 + g.doc_id % 9 AS BIGINT)
         AS duration_ms,
       CAST(CASE WHEN g.has_audio THEN 2 ELSE 1 END AS INT) AS n_tracks,
       CAST(1 AS INT) AS n_video,
       CAST(CASE WHEN g.has_audio THEN 1 ELSE 0 END AS INT) AS n_audio,
       CAST(320 + (g.doc_id % 5) * 64 AS INT) AS width,
       CAST(180 + (g.doc_id % 5) * 36 AS INT) AS height,
       CAST(CASE WHEN g.has_audio THEN 8000 + (g.doc_id % 8) * 1000 END AS INT)
         AS audio_rate,
       CAST(CASE WHEN g.has_audio THEN 1 + g.doc_id % 2 END AS INT)
         AS audio_channels,
       g.n_clusters,
       a.n_blocks, a.n_frames, a.n_keyframes, a.media_bytes
FROM g JOIN agg a USING (doc_id)
ORDER BY g.doc_id
"""
