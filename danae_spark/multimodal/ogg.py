"""Ogg container (RFC 3533) structural census — Opus and Vorbis streams.

Crawl-scale audio is heavily Ogg (Opus for voice/WebRTC rips, Vorbis
for legacy web audio), and none of it is visible to the WAV/MP3/FLAC
paths. This module walks the container for real:

  - page layer (RFC 3533 §6): capture pattern, version, header-type
    flags (continued / BOS / EOS), 64-bit granule positions, serials,
    page sequence numbers, the page CRC-32 (poly 0x04C11DB7, init 0,
    no reflection, no final xor — verified per page; pinned in tests
    against the CRC-32/POSIX published check value, of which the Ogg
    variant is the un-complemented form), and lacing-value packet
    reassembly including 255-continuation across pages;
  - codec identification from the BOS packet: OpusHead (RFC 7845 §5.1
    — version, channels, pre-skip, input rate) and \\x01vorbis
    (Vorbis I §A.2 — channels, rate, blocksizes);
  - Opus packet TOC parse (RFC 6716 §3.1): all four frame-count codes
    (single, two-equal, two-different with 1/2-byte length, code-3
    count byte with VBR/padding incl. 255-chains), config → frame
    duration table, the 120 ms packet-duration cap — so per-packet
    sample counts are decoded from real in-band bits;
  - integrity: every page CRC must verify, sequence numbers must be
    contiguous, BOS must be first / nothing after EOS, continuation
    flags must match carry-over state, the Opus granule of the last
    page must equal pre-skip + Σ TOC-decoded samples. Any violation
    rejects the file whole (None), the crawl-triage contract shared
    with the WAV/MP4/FLAC validators.

Vorbis per-packet durations need the codebook setup header (a full
codec decode) — the granule position is the container-level truth and
is what the census reports; that boundary matches the MP4 sample-table
census (structure fully decoded, codec frames opaque).

Reference parity note: the reference (smartdatalake/danae profiler)
treats non-tabular files as opaque; this is mandated multimodal
extension surface.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

__all__ = [
    "ogg_crc",
    "parse_opus_packet",
    "parse_ogg",
    "parse_ogg_tags",
    "synth_ogg",
    "synth_ogg_tagged",
    "ogg_census_frame",
    "ogg_census_roundtrip",
    "ogg_tags_frame",
    "ogg_tags_roundtrip",
    "OGG_CENSUS_ORACLE",
    "OGG_TAGS_ORACLE",
]


def _make_crc_table() -> list[int]:
    tbl = []
    for b in range(256):
        r = b << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 else (r << 1) & 0xFFFFFFFF
        tbl.append(r)
    return tbl


_CRC_TABLE = _make_crc_table()


def ogg_crc(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((r >> 24) ^ b) & 0xFF]
    return r


# Opus config → samples per frame at 48 kHz (RFC 6716 §3.1 Table 2)
_OPUS_FRAME_SAMPLES = (
    # SILK NB / MB / WB: 10, 20, 40, 60 ms
    [480, 960, 1920, 2880] * 3
    # Hybrid SWB / FB: 10, 20 ms
    + [480, 960] * 2
    # CELT NB / WB / SWB / FB: 2.5, 5, 10, 20 ms
    + [120, 240, 480, 960] * 4
)
assert len(_OPUS_FRAME_SAMPLES) == 32


def parse_opus_packet(data: bytes) -> tuple[int, int] | None:
    """(n_frames, total_samples@48k) from an Opus packet's TOC byte and
    frame-count code (RFC 6716 §3.1). None for malformed packets
    (empty, bad code-2 length, code-3 cap violation, truncated
    padding chain)."""
    if not data:
        return None
    toc = data[0]
    config = toc >> 3
    fsamp = _OPUS_FRAME_SAMPLES[config]
    code = toc & 0x3
    if code == 0:
        n_frames = 1
    elif code == 1:
        if (len(data) - 1) % 2 != 0:
            return None
        n_frames = 2
    elif code == 2:
        # two different-size frames; first length is 1 or 2 bytes
        if len(data) < 2:
            return None
        l0 = data[1]
        off = 2
        if l0 >= 252:
            if len(data) < 3:
                return None
            l0 = l0 + data[2] * 4
            off = 3
        if l0 > len(data) - off:
            return None
        n_frames = 2
    else:
        if len(data) < 2:
            return None
        v = data[1]
        n_frames = v & 0x3F
        if n_frames == 0:
            return None
        pos = 2
        if v & 0x40:  # padding: length bytes, 255 chains
            pad = 0
            while True:
                if pos >= len(data):
                    return None
                b = data[pos]
                pos += 1
                pad += b if b < 255 else 254
                if b < 255:
                    break
            if pad > len(data) - pos:
                return None
    samples = n_frames * fsamp
    if samples > 5760:  # 120 ms packet cap (§3.1)
        return None
    return n_frames, samples


def parse_ogg(payload: bytes) -> dict | None:
    """Walk an Ogg file into one census row:

      codec ('opus' | 'vorbis'), channels, sample_rate
      n_pages, n_packets, payload_bytes (audio packets, header packets
      excluded), duration_ms (final granule minus Opus pre-skip, over
      the codec clock — 48 kHz for Opus, the ID-header rate for
      Vorbis), opus_frames (Σ TOC frame counts; None for Vorbis)

    Single logical stream (the common crawl case); multiplexed files,
    CRC/sequence/flag violations, unknown BOS codecs, and an Opus
    final granule that contradicts Σ TOC samples + pre-skip all
    return None."""
    try:
        return _parse_ogg_inner(payload)
    except (IndexError, ValueError, struct.error):
        return None


def _walk_pages(payload: bytes) -> tuple[list[bytes], int, int | None] | None:
    """The RFC 3533 page walk shared by the census and the comment
    extractor: (packets, n_pages, last_granule) after full validation —
    per-page CRC, contiguous sequence numbers, BOS-first/EOS-last,
    continuation flags matching carry-over state, single logical
    stream. None on any violation."""
    pos = 0
    n = len(payload)
    pages = 0
    packets: list[bytes] = []
    carry = b""
    carry_open = False
    serial = None
    expect_seq = 0
    saw_bos = False
    saw_eos = False
    last_granule = None

    while pos < n:
        if saw_eos:
            return None  # data after EOS
        if n - pos < 27 or payload[pos : pos + 4] != b"OggS" or payload[pos + 4] != 0:
            return None
        flags = payload[pos + 5]
        granule = struct.unpack("<q", payload[pos + 6 : pos + 14])[0]
        pserial = struct.unpack("<I", payload[pos + 14 : pos + 18])[0]
        pseq = struct.unpack("<I", payload[pos + 18 : pos + 22])[0]
        pcrc = struct.unpack("<I", payload[pos + 22 : pos + 26])[0]
        nseg = payload[pos + 26]
        seg_end = pos + 27 + nseg
        if seg_end > n:
            return None
        lacing = payload[pos + 27 : seg_end]
        body_len = sum(lacing)
        page_end = seg_end + body_len
        if page_end > n:
            return None

        # CRC over the page with the CRC field zeroed (RFC 3533 §6)
        zeroed = bytearray(payload[pos:page_end])
        zeroed[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(zeroed)) != pcrc:
            return None

        if serial is None:
            serial = pserial
            if not flags & 0x02:
                return None  # first page must be BOS
            saw_bos = True
        elif pserial != serial:
            return None  # multiplexed: out of subset
        elif flags & 0x02:
            return None  # second BOS in one stream
        if pseq != expect_seq:
            return None
        expect_seq += 1
        if bool(flags & 0x01) != carry_open:
            return None  # continuation flag must match carry-over state
        if flags & 0x04:
            saw_eos = True
        if granule != -1:
            last_granule = granule

        body = payload[seg_end:page_end]
        off = 0
        for lv in lacing:
            carry += body[off : off + lv]
            off += lv
            if lv < 255:
                packets.append(carry)
                carry = b""
        # carry stays open iff the last lacing value was 255 (or a
        # zero-segment page left an open carry untouched)
        carry_open = len(carry) > 0
        pages += 1
        pos = page_end

    if not saw_bos or not saw_eos or carry_open or not packets:
        return None
    return packets, pages, last_granule


def _parse_ogg_inner(payload: bytes) -> dict | None:
    walked = _walk_pages(payload)
    if walked is None:
        return None
    packets, pages, last_granule = walked

    first = packets[0]
    if first[:8] == b"OpusHead":
        if len(first) < 19 or first[8] != 1:
            return None
        channels = first[9]
        pre_skip = struct.unpack("<H", first[10:12])[0]
        rate = struct.unpack("<I", first[12:16])[0]
        n_header = 2  # OpusHead + OpusTags
        if len(packets) < 2 or packets[1][:8] != b"OpusTags":
            return None
        codec = "opus"
        clock = 48000
    elif first[:7] == b"\x01vorbis":
        if len(first) < 30 or struct.unpack("<I", first[7:11])[0] != 0:
            return None
        channels = first[11]
        rate = struct.unpack("<I", first[12:16])[0]
        pre_skip = 0
        n_header = 3  # ID + comment + setup
        if (
            len(packets) < 3
            or packets[1][:7] != b"\x03vorbis"
            or packets[2][:7] != b"\x05vorbis"
        ):
            return None
        codec = "vorbis"
        clock = rate
    else:
        return None
    if channels == 0 or rate == 0 or clock == 0:
        return None

    audio = packets[n_header:]
    payload_bytes = sum(len(p) for p in audio)

    opus_frames = None
    if codec == "opus":
        opus_frames = 0
        total_samples = 0
        for p in audio:
            parsed = parse_opus_packet(p)
            if parsed is None:
                return None
            f, s = parsed
            opus_frames += f
            total_samples += s
        # container/codec cross-check: final granule must account for
        # every TOC-decoded sample plus the declared pre-skip
        if last_granule is None or last_granule != pre_skip + total_samples:
            return None
        duration_ms = total_samples * 1000 // 48000
    else:
        if last_granule is None or last_granule < 0:
            return None
        duration_ms = last_granule * 1000 // clock

    return {
        "codec": codec,
        "channels": channels,
        "sample_rate": rate,
        "n_pages": pages,
        "n_packets": len(audio),
        "payload_bytes": payload_bytes,
        "duration_ms": duration_ms,
        "opus_frames": opus_frames,
    }


# --------------------------------------------- comment-header extraction
# (VorbisComment / OpusTags — the id3_extract analogue for Ogg audio:
# artist/title metadata lands here, and these strings feed the same
# BM25 / tf-idf search stack)


def _parse_comment_block(data: bytes, framing: bool) -> tuple[str, list[str]] | None:
    """Decode the shared VorbisComment structure (Vorbis I §5 /
    RFC 7845 §5.2): vendor length+string, comment count, then
    length-prefixed UTF-8 'KEY=value' entries; Vorbis adds a framing
    bit. Strict: lengths in bounds, valid UTF-8, '=' present, key
    chars in 0x20..0x7D minus '=', no trailing bytes (the RFC 7845
    binary-suffix allowance is a declared boundary — reject whole
    rather than silently ignore bytes)."""
    try:
        pos = 0
        vlen = struct.unpack("<I", data[pos : pos + 4])[0]
        pos += 4
        if pos + vlen > len(data):
            return None
        vendor = data[pos : pos + vlen].decode("utf-8")
        pos += vlen
        n = struct.unpack("<I", data[pos : pos + 4])[0]
        pos += 4
        if n > 1_000_000:
            return None
        comments: list[str] = []
        for _ in range(n):
            clen = struct.unpack("<I", data[pos : pos + 4])[0]
            pos += 4
            if pos + clen > len(data):
                return None
            s = data[pos : pos + clen].decode("utf-8")
            pos += clen
            key, sep, _val = s.partition("=")
            if not sep or not key:
                return None
            if any(not (0x20 <= ord(ch) <= 0x7D) or ch == "=" for ch in key):
                return None
            comments.append(s)
        if framing:
            if pos >= len(data) or not data[pos] & 1:
                return None
            pos += 1
        if pos != len(data):
            return None
        return vendor, comments
    except (struct.error, UnicodeDecodeError, IndexError):
        return None


_TAG_KEYS = ("title", "artist", "album", "date")


def parse_ogg_tags(payload: bytes) -> dict | None:
    """Extract the comment header of an Ogg Opus/Vorbis stream into one
    census row:

      codec, vendor, n_comments, title, artist, album, tag_date
      (first occurrence each, keys case-insensitive per spec),
      n_tag_chars (Σ value lengths over ALL comments)

    The FULL page-walk validation applies (CRC / sequence /
    continuation / BOS-EOS) — comment packets routinely span pages via
    255-lacing continuation, so the extractor exercises exactly the
    reassembly path. None for non-Ogg payloads or malformed comment
    structures."""
    try:
        walked = _walk_pages(payload)
    except (IndexError, ValueError, struct.error):
        return None
    if walked is None:
        return None
    packets, _pages, _gr = walked
    first = packets[0]
    if first[:8] == b"OpusHead":
        if len(packets) < 2 or packets[1][:8] != b"OpusTags":
            return None
        codec, block, framing = "opus", packets[1][8:], False
    elif first[:7] == b"\x01vorbis":
        if len(packets) < 2 or packets[1][:7] != b"\x03vorbis":
            return None
        codec, block, framing = "vorbis", packets[1][7:], True
    else:
        return None
    parsed = _parse_comment_block(block, framing)
    if parsed is None:
        return None
    vendor, comments = parsed
    fields: dict[str, str] = {}
    n_chars = 0
    for c in comments:
        key, _, val = c.partition("=")
        n_chars += len(val)
        k = key.lower()
        if k in _TAG_KEYS and k not in fields:
            fields[k] = val
    return {
        "codec": codec,
        "vendor": vendor,
        "n_comments": len(comments),
        "title": fields.get("title"),
        "artist": fields.get("artist"),
        "album": fields.get("album"),
        "tag_date": fields.get("date"),
        "n_tag_chars": n_chars,
    }


# ------------------------------------------------------------- synthesis


def _raw_page(
    serial: int, seq: int, granule: int, flags: int, lacing: list[int], body: bytes
) -> bytes:
    hdr = b"OggS" + bytes([0, flags]) + struct.pack("<q", granule)
    hdr += struct.pack("<II", serial, seq)
    hdr += b"\x00\x00\x00\x00"  # CRC placeholder
    hdr += bytes([len(lacing)]) + bytes(lacing)
    page = bytearray(hdr + body)
    crc = ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def _page(
    serial: int, seq: int, granule: int, segments: list[bytes], flags: int
) -> bytes:
    lacing: list[int] = []
    body = bytearray()
    for seg in segments:
        body += seg
        size = len(seg)
        while size >= 255:
            lacing.append(255)
            size -= 255
        lacing.append(size)
    return _raw_page(serial, seq, granule, flags, lacing, bytes(body))


def _doc_params(doc_id: int) -> dict:
    codec = "opus" if doc_id % 2 == 0 else "vorbis"
    return {
        "codec": codec,
        "channels": 1 + (doc_id % 2),
        "rate": 8000 + (doc_id % 8) * 1000,
        "pre_skip": 312 + (doc_id % 100),
        "n_packets": 5 + (doc_id % 7),
    }


def _packet_size(doc_id: int, p: int) -> int:
    return 20 + ((doc_id + p * 13) % 600)


def _opus_config(doc_id: int, p: int) -> int:
    return (doc_id + p) % 32


def _vorbis_granule_step(doc_id: int, p: int) -> int:
    return 128 + ((doc_id + p) % 4) * 64


def _comment_packet(magic: bytes, vendor: str, comments: list[str], framing: bool) -> bytes:
    out = magic + struct.pack("<I", len(vendor.encode())) + vendor.encode()
    out += struct.pack("<I", len(comments))
    for c in comments:
        enc = c.encode("utf-8")
        out += struct.pack("<I", len(enc)) + enc
    if framing:
        out += bytes([1])
    return out


def synth_ogg(doc_id: int, comments: "tuple[str, list[str]] | None" = None) -> bytes:
    """Doc-deterministic Ogg stream: Opus on even docs (code-0 TOC
    packets whose configs cycle the full RFC 6716 table; granule =
    pre-skip + Σ samples), Vorbis on odd (ID/comment/setup header
    triple; granule from the deterministic step sum). Packet sizes up
    to 620 bytes exercise 255-lacing spans; audio pages carry 3
    packets each; EOS on the last page.

    `comments` = (vendor, ["KEY=value", ...]) replaces the stub
    comment header with a REAL VorbisComment/OpusTags block — and the
    comment packet is deliberately split ACROSS pages (255-lacing
    carry + continuation flag), the layout real tagged files use.
    Default None keeps the byte-identical census stream."""
    d = _doc_params(doc_id)
    serial = 0x1000 + (doc_id % 251)
    pages: list[bytes] = []
    seq = 0

    if d["codec"] == "opus":
        head = b"OpusHead" + bytes([1, d["channels"]])
        head += struct.pack("<H", d["pre_skip"])
        head += struct.pack("<I", d["rate"])
        head += struct.pack("<h", 0) + bytes([0])  # gain, mapping family
        if comments is None:
            tags = b"OpusTags" + struct.pack("<I", 5) + b"danae" + struct.pack("<I", 0)
        else:
            tags = _comment_packet(b"OpusTags", comments[0], comments[1], False)
        pages.append(_page(serial, seq, 0, [head], 0x02))
        seq += 1
        tail: list[bytes] = []
    else:
        ident = b"\x01vorbis" + struct.pack("<I", 0) + bytes([d["channels"]])
        ident += struct.pack("<I", d["rate"])
        ident += struct.pack("<iii", 0, 0, 0)
        ident += bytes([0x66]) + bytes([1])  # blocksizes nibble, framing bit
        if comments is None:
            tags = b"\x03vorbis" + struct.pack("<I", 5) + b"danae" + struct.pack("<I", 0) + bytes([1])
        else:
            tags = _comment_packet(b"\x03vorbis", comments[0], comments[1], True)
        setup = b"\x05vorbis" + bytes((doc_id + i) % 251 for i in range(40)) + bytes([1])
        pages.append(_page(serial, seq, 0, [ident], 0x02))
        seq += 1
        tail = [setup]

    if comments is None:
        pages.append(_page(serial, seq, 0, [tags] + tail, 0))
        seq += 1
    else:
        # split the comment packet across TWO pages: the first carries
        # only all-255 lacing values (packet unterminated), the second
        # sets the continuation flag and finishes it (+ any tail
        # packets) — the cross-page reassembly real tagged files need
        cut = 255 * max(1, min((len(tags) - 1) // 255, 2))
        pages.append(
            _raw_page(serial, seq, -1, 0, [255] * (cut // 255), tags[:cut])
        )
        seq += 1
        segs = [tags[cut:]] + tail
        lacing: list[int] = []
        body = b""
        for s in segs:
            body += s
            sz = len(s)
            while sz >= 255:
                lacing.append(255)
                sz -= 255
            lacing.append(sz)
        pages.append(_raw_page(serial, seq, 0, 0x01, lacing, body))
        seq += 1

    granule = d["pre_skip"] if d["codec"] == "opus" else 0
    audio: list[bytes] = []
    for p in range(d["n_packets"]):
        size = _packet_size(doc_id, p)
        if d["codec"] == "opus":
            toc = (_opus_config(doc_id, p) << 3) | 0  # code 0: one frame
            body = bytes([toc]) + bytes((doc_id + p + i) % 251 for i in range(size - 1))
            granule += _OPUS_FRAME_SAMPLES[_opus_config(doc_id, p)]
        else:
            body = bytes([0]) + bytes((doc_id + p + i) % 251 for i in range(size - 1))
            granule += _vorbis_granule_step(doc_id, p)
        audio.append(body)

    for i in range(0, len(audio), 3):
        chunk = audio[i : i + 3]
        last = i + 3 >= len(audio)
        flags = 0x04 if last else 0
        # granule of a page = cumulative position after its last packet
        gpos = d["pre_skip"] if d["codec"] == "opus" else 0
        for p in range(min(i + 3, len(audio))):
            if d["codec"] == "opus":
                gpos += _OPUS_FRAME_SAMPLES[_opus_config(doc_id, p)]
            else:
                gpos += _vorbis_granule_step(doc_id, p)
        pages.append(_page(serial, seq, gpos, chunk, flags))
        seq += 1

    return b"".join(pages)


def _ogg_meta(doc_id: int) -> tuple[str, list[str]]:
    """Doc-deterministic metadata — restated verbatim in
    OGG_TAGS_ORACLE. Key case alternates per doc to pin the spec's
    case-insensitive key matching in the value check; DESCRIPTION
    (200+ chars) forces the comment packet past one page."""
    title = f"title {doc_id % 97} track {(doc_id * 7) % 51}"
    artist = f"artist {(doc_id * 11) % 89}"
    album = f"album {(doc_id * 13) % 83}"
    date = str(1970 + doc_id % 55)
    desc = "x" * (200 + doc_id % 97)
    upper = doc_id % 2 == 0
    keys = ("TITLE", "ARTIST", "ALBUM", "DATE", "DESCRIPTION") if upper else (
        "title", "artist", "album", "date", "description")
    vals = (title, artist, album, date, desc)
    return f"danae {doc_id % 31}", [f"{k}={v}" for k, v in zip(keys, vals)]


def synth_ogg_tagged(doc_id: int) -> bytes:
    """synth_ogg with a REAL comment header (VorbisComment/OpusTags)
    split across pages via 255-lacing continuation."""
    return synth_ogg(doc_id, comments=_ogg_meta(doc_id))


# ----------------------------------------------------- Spark entry points

_CENSUS_COLS = [
    "codec", "channels", "sample_rate", "n_pages", "n_packets",
    "payload_bytes", "duration_ms", "opus_frames",
]

_CENSUS_SCHEMA = (
    "doc_id bigint, codec string, channels int, sample_rate int, "
    "n_pages int, n_packets int, payload_bytes bigint, "
    "duration_ms bigint, opus_frames int"
)


def ogg_census_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Ogg census over any (id, binary) frame; nulls for undecodable
    payloads, never executor errors."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = parse_ogg(bytes(payload)) if payload is not None else None
                row = {id_col: rid}
                row.update(
                    {k: (c.get(k) if c else None) for k in _CENSUS_COLS}
                )
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + _CENSUS_COLS)

    return df.mapInPandas(batches, schema=_CENSUS_SCHEMA.replace("doc_id", id_col, 1))


def ogg_census_roundtrip(spark, sf_dir: str):
    """Oracle-checkable Ogg census: per doc a real Opus or Vorbis Ogg
    stream is synthesized byte-for-byte (pages CRC'd with the real Ogg
    polynomial), walked by the real parser (CRC / sequence /
    continuation / granule-vs-TOC validation active), and the census
    restated as doc_id arithmetic in DuckDB — including the Σ over the
    32-entry Opus frame-duration table."""
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
                c = parse_ogg(synth_ogg(d))
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
    "codec", "vendor", "n_comments", "title", "artist", "album",
    "tag_date", "n_tag_chars",
]

_TAGS_SCHEMA = (
    "doc_id bigint, codec string, vendor string, n_comments int, "
    "title string, artist string, album string, tag_date string, "
    "n_tag_chars int"
)


def ogg_tags_frame(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Comment-header extraction over any (id, binary) frame; nulls for
    non-Ogg / malformed payloads, never executor errors."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                c = parse_ogg_tags(bytes(payload)) if payload is not None else None
                row = {id_col: rid}
                row.update({k: (c.get(k) if c else None) for k in _TAGS_COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + _TAGS_COLS)

    return df.mapInPandas(batches, schema=_TAGS_SCHEMA.replace("doc_id", id_col, 1))


def ogg_tags_roundtrip(spark, sf_dir: str):
    """Oracle-checkable Ogg comment extraction (the C57/C58 pattern):
    per doc a real tagged Opus/Vorbis stream — the comment packet
    genuinely SPANS pages via 255-lacing continuation — is walked by
    the full page validator, the comment block strictly decoded, and
    the title/artist/album/date STRINGS restated in SQL so the value
    hash covers the exact metadata text the search stack would
    index."""
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
                c = parse_ogg_tags(synth_ogg_tagged(d))
                row = {"doc_id": d}
                row.update({k: (c.get(k) if c else None) for k in _TAGS_COLS})
                rows.append(row)
            yield pd.DataFrame(rows, columns=["doc_id"] + _TAGS_COLS)

    return (
        docs.repartition(stage_parallelism(docs.sparkSession), "doc_id")
        .mapInPandas(batches, schema=_TAGS_SCHEMA)
        .orderBy("doc_id")
    )


OGG_TAGS_ORACLE = """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'opus' ELSE 'vorbis' END AS codec,
         'danae ' || CAST(doc_id % 31 AS VARCHAR) AS vendor,
         'title ' || CAST(doc_id % 97 AS VARCHAR) || ' track '
           || CAST((doc_id * 7) % 51 AS VARCHAR) AS title,
         'artist ' || CAST((doc_id * 11) % 89 AS VARCHAR) AS artist,
         'album ' || CAST((doc_id * 13) % 83 AS VARCHAR) AS album,
         CAST(1970 + doc_id % 55 AS VARCHAR) AS tag_date,
         200 + doc_id % 97 AS desc_len
  FROM documents
)
SELECT doc_id, codec, vendor,
       CAST(5 AS INT) AS n_comments,
       title, artist, album, tag_date,
       CAST(length(title) + length(artist) + length(album)
            + length(tag_date) + desc_len AS INT) AS n_tag_chars
FROM m
ORDER BY doc_id
"""


# the 32-entry Opus config table as SQL: three SILK groups, two hybrid,
# four CELT groups (RFC 6716 §3.1 Table 2)
_OPUS_SQL_SAMPLES = (
    "CASE WHEN cfg < 12 THEN (CASE cfg % 4 WHEN 0 THEN 480 WHEN 1 THEN 960 "
    "WHEN 2 THEN 1920 ELSE 2880 END) "
    "WHEN cfg < 16 THEN (CASE cfg % 2 WHEN 0 THEN 480 ELSE 960 END) "
    "ELSE (CASE cfg % 4 WHEN 0 THEN 120 WHEN 1 THEN 240 WHEN 2 THEN 480 "
    "ELSE 960 END) END"
)

OGG_CENSUS_ORACLE = f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'opus' ELSE 'vorbis' END AS codec,
         CAST(1 + doc_id % 2 AS INT) AS channels,
         CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
         CAST(5 + doc_id % 7 AS INT) AS n_packets
  FROM documents
),
pk AS (
  SELECT p.doc_id, p.codec, g.i AS pkt,
         20 + (p.doc_id + g.i * 13) % 600 AS size_bytes,
         (p.doc_id + g.i) % 32 AS cfg,
         128 + ((p.doc_id + g.i) % 4) * 64 AS vorbis_step
  FROM p, generate_series(0, 11) g(i)
  WHERE g.i < p.n_packets
),
agg AS (
  SELECT doc_id,
         CAST(sum(size_bytes) AS BIGINT) AS payload_bytes,
         CAST(sum({_OPUS_SQL_SAMPLES}) AS BIGINT) AS opus_samples,
         CAST(count(*) AS INT) AS opus_frames_cnt,
         CAST(sum(vorbis_step) AS BIGINT) AS vorbis_samples
  FROM pk GROUP BY doc_id
)
SELECT p.doc_id, p.codec, p.channels, p.sample_rate,
       CAST(2 + CAST(ceil(p.n_packets / 3.0) AS INT) AS INT) AS n_pages,
       p.n_packets, a.payload_bytes,
       CAST(CASE WHEN p.codec = 'opus'
                 THEN a.opus_samples * 1000 // 48000
                 ELSE a.vorbis_samples * 1000 // p.sample_rate END AS BIGINT)
         AS duration_ms,
       CAST(CASE WHEN p.codec = 'opus' THEN a.opus_frames_cnt END AS INT)
         AS opus_frames
FROM p JOIN agg a USING (doc_id)
ORDER BY p.doc_id
"""
