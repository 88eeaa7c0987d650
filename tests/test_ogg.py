"""Ogg container census (multimodal/ogg.py): page walk, Opus TOC parse,
CRC/structure validation, cross-page packet continuation."""

import struct

import pytest

from danae_spark.multimodal.ogg import (
    ogg_crc,
    parse_ogg,
    parse_opus_packet,
    synth_ogg,
    _doc_params,
    _opus_config,
    _packet_size,
    _page,
    _vorbis_granule_step,
    _OPUS_FRAME_SAMPLES,
)


def test_crc_pin():
    """The Ogg page CRC (poly 0x04C11DB7, init 0, no reflect, no final
    xor) is the un-complemented CRC-32/POSIX — pinned against that
    variant's published '123456789' check value 0x765E7680."""
    assert ogg_crc(b"123456789") == (0x765E7680 ^ 0xFFFFFFFF)


def test_census_roundtrip_doc_grid():
    for d in range(28):
        c = parse_ogg(synth_ogg(d))
        assert c is not None, d
        p = _doc_params(d)
        assert c["codec"] == p["codec"]
        assert c["channels"] == p["channels"]
        assert c["sample_rate"] == p["rate"]
        assert c["n_packets"] == p["n_packets"]
        assert c["n_pages"] == 2 + -(-p["n_packets"] // 3)
        assert c["payload_bytes"] == sum(
            _packet_size(d, i) for i in range(p["n_packets"])
        )
        if p["codec"] == "opus":
            samples = sum(
                _OPUS_FRAME_SAMPLES[_opus_config(d, i)]
                for i in range(p["n_packets"])
            )
            assert c["duration_ms"] == samples * 1000 // 48000
            assert c["opus_frames"] == p["n_packets"]
        else:
            s = sum(_vorbis_granule_step(d, i) for i in range(p["n_packets"]))
            assert c["duration_ms"] == s * 1000 // p["rate"]
            assert c["opus_frames"] is None


# ------------------------------------------------------ Opus TOC parse


def test_opus_toc_codes():
    # code 0: single frame; config 15 = hybrid FB 20 ms = 960 samples
    assert parse_opus_packet(bytes([15 << 3]) + b"x" * 10) == (1, 960)
    # code 1: two equal frames — payload after TOC must be even
    assert parse_opus_packet(bytes([(15 << 3) | 1]) + b"x" * 10) == (2, 1920)
    assert parse_opus_packet(bytes([(15 << 3) | 1]) + b"x" * 9) is None
    # code 2: two different frames, 1-byte first length
    assert parse_opus_packet(bytes([(15 << 3) | 2, 4]) + b"x" * 8) == (2, 1920)
    # code 2 with 2-byte length: 252 + 1*4 = 256
    pkt = bytes([(15 << 3) | 2, 252, 1]) + b"x" * 300
    assert parse_opus_packet(pkt) == (2, 1920)
    # code 2 first-frame length exceeding payload
    assert parse_opus_packet(bytes([(15 << 3) | 2, 100]) + b"x" * 3) is None
    # code 3 CBR: config 30 = CELT FB 10 ms = 480; M = 3 frames
    assert parse_opus_packet(bytes([(30 << 3) | 3, 3]) + b"x" * 9) == (3, 1440)
    # code 3 with padding chain: 255 -> 254 + next byte 2 -> 256 pad bytes
    pkt = bytes([(30 << 3) | 3, 0x40 | 2, 255, 2]) + b"p" * 256 + b"x" * 4
    assert parse_opus_packet(pkt) == (2, 960)
    # padding longer than remaining payload rejects
    assert parse_opus_packet(bytes([(30 << 3) | 3, 0x40 | 2, 50]) + b"x" * 3) is None
    # 120 ms cap: config 3 = SILK 60 ms (2880); 3 frames = 8640 > 5760
    assert parse_opus_packet(bytes([(3 << 3) | 3, 3]) + b"x" * 9) is None
    # M = 0 frames invalid
    assert parse_opus_packet(bytes([(30 << 3) | 3, 0]) + b"x") is None
    assert parse_opus_packet(b"") is None


# ---------------------------------------- cross-page packet continuation


def _opus_header_pages(serial=7, channels=1, pre_skip=0, rate=8000):
    head = b"OpusHead" + bytes([1, channels])
    head += struct.pack("<H", pre_skip) + struct.pack("<I", rate)
    head += struct.pack("<h", 0) + bytes([0])
    tags = b"OpusTags" + struct.pack("<I", 0) + struct.pack("<I", 0)
    return [_page(serial, 0, 0, [head], 0x02), _page(serial, 1, 0, [tags], 0)]


def test_packet_spanning_pages():
    """A 300-byte packet split across two pages: first page ends with
    lacing 255 (no terminator), second page carries the continued flag
    and the remaining 45 bytes."""
    serial = 7
    toc = bytes([15 << 3])  # 960 samples
    body = toc + bytes(i % 251 for i in range(299))
    pages = _opus_header_pages(serial)
    # hand-split: page 2 carries first 255 bytes with a single 255
    # lacing value (no terminating segment)
    hdr = b"OggS" + bytes([0, 0]) + struct.pack("<q", -1)
    hdr += struct.pack("<II", serial, 2) + b"\x00" * 4 + bytes([1, 255])
    pg = bytearray(hdr + body[:255])
    pg[22:26] = struct.pack("<I", ogg_crc(bytes(pg)))
    pages.append(bytes(pg))
    # page 3: continued flag, EOS, granule = 960, remaining 45 bytes
    hdr = b"OggS" + bytes([0, 0x01 | 0x04]) + struct.pack("<q", 960)
    hdr += struct.pack("<II", serial, 3) + b"\x00" * 4 + bytes([1, 45])
    pg = bytearray(hdr + body[255:])
    pg[22:26] = struct.pack("<I", ogg_crc(bytes(pg)))
    pages.append(bytes(pg))

    c = parse_ogg(b"".join(pages))
    assert c is not None
    assert c["n_packets"] == 1 and c["payload_bytes"] == 300
    assert c["duration_ms"] == 960 * 1000 // 48000

    # same stream but with the continued flag missing on page 3 → reject
    bad = bytearray(pages[3])
    bad[5] = 0x04
    bad[22:26] = b"\x00" * 4
    crc = ogg_crc(bytes(bad))
    bad[22:26] = struct.pack("<I", crc)
    assert parse_ogg(b"".join(pages[:3]) + bytes(bad)) is None


# ------------------------------------------------------------- rejection


def _good() -> bytes:
    return synth_ogg(4)  # opus, 2 channels


def _repatch_crc(page_start: int, payload: bytearray) -> None:
    """Recompute one page's CRC in place (page boundaries via lacing)."""
    nseg = payload[page_start + 26]
    seg = payload[page_start + 27 : page_start + 27 + nseg]
    end = page_start + 27 + nseg + sum(seg)
    payload[page_start + 22 : page_start + 26] = b"\x00" * 4
    crc = ogg_crc(bytes(payload[page_start:end]))
    payload[page_start + 22 : page_start + 26] = struct.pack("<I", crc)


def test_rejects_crc_corruption():
    p = bytearray(_good())
    p[40] ^= 0x01
    assert parse_ogg(bytes(p)) is None


def test_rejects_sequence_gap():
    p = bytearray(_good())
    p[18] ^= 0x04  # page 0 sequence number
    _repatch_crc(0, p)
    assert parse_ogg(bytes(p)) is None


def test_rejects_missing_bos_and_granule_mismatch():
    p = bytearray(_good())
    p[5] = 0x00  # strip BOS flag from the first page
    _repatch_crc(0, p)
    assert parse_ogg(bytes(p)) is None

    # Opus: final granule must equal pre-skip + Σ TOC samples — bump it
    # (with a valid CRC) and the cross-check must reject
    q = bytearray(_good())
    starts = []
    i = 0
    while i < len(q):
        starts.append(i)
        nseg = q[i + 26]
        i += 27 + nseg + sum(q[i + 27 : i + 27 + nseg])
    last = starts[-1]
    g = struct.unpack("<q", q[last + 6 : last + 14])[0]
    q[last + 6 : last + 14] = struct.pack("<q", g + 1)
    _repatch_crc(last, q)
    assert parse_ogg(bytes(q)) is None


def test_rejects_truncation_and_garbage():
    p = _good()
    for cut in (0, 3, 26, 30, len(p) // 2, len(p) - 1):
        assert parse_ogg(p[:cut]) is None
    assert parse_ogg(b"") is None
    assert parse_ogg(b"RIFF" + p[4:]) is None


def test_mutation_sweep_never_raises():
    p = bytearray(_good())
    for off in range(0, len(p), 5):
        q = bytearray(p)
        q[off] ^= 0x55
        parse_ogg(bytes(q))  # must not raise


# --------------------------------------------------------- Spark plumbing


def test_ogg_frame_nulls_for_garbage(spark):
    from danae_spark.multimodal.ogg import ogg_census_frame

    rows = [
        (1, bytearray(b"definitely not ogg")),
        (2, bytearray(synth_ogg(2))),
        (3, bytearray(synth_ogg(3))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in ogg_census_frame(df).collect()}
    assert out[1]["codec"] is None
    assert out[2]["codec"] == "opus" and out[2]["opus_frames"] is not None
    assert out[3]["codec"] == "vorbis" and out[3]["opus_frames"] is None


# ------------------------------------------------- r10: comment headers


def test_ogg_tags_roundtrip_grid():
    from danae_spark.multimodal.ogg import (
        _ogg_meta,
        parse_ogg,
        parse_ogg_tags,
        synth_ogg,
        synth_ogg_tagged,
    )

    for d in range(24):
        c = parse_ogg_tags(synth_ogg_tagged(d))
        assert c is not None, d
        vendor, comments = _ogg_meta(d)
        assert c["codec"] == ("opus" if d % 2 == 0 else "vorbis")
        assert c["vendor"] == vendor
        assert c["n_comments"] == 5
        assert c["title"] == f"title {d % 97} track {(d * 7) % 51}"
        assert c["artist"] == f"artist {(d * 11) % 89}"
        assert c["album"] == f"album {(d * 13) % 83}"
        assert c["tag_date"] == str(1970 + d % 55)
        assert c["n_tag_chars"] == sum(
            len(s.partition("=")[2]) for s in comments
        )
        # the tagged stream still passes the census page validator
        assert parse_ogg(synth_ogg_tagged(d)) is not None, d
        # the untagged census stream has an empty (but valid) comment block
        c0 = parse_ogg_tags(synth_ogg(d))
        assert c0 is not None and c0["n_comments"] == 0 and c0["title"] is None


def test_ogg_tags_comment_packet_spans_pages():
    """The comment packet must genuinely cross a page boundary: the
    tags page carries ONLY 255-lacing values (no packet terminates on
    it) and the next page sets the continuation flag."""
    import struct as _s

    from danae_spark.multimodal.ogg import synth_ogg_tagged

    p = synth_ogg_tagged(6)
    # walk raw pages
    pos, pages = 0, []
    while pos < len(p):
        nseg = p[pos + 26]
        lacing = p[pos + 27 : pos + 27 + nseg]
        flags = p[pos + 5]
        body_len = sum(lacing)
        pages.append((flags, list(lacing)))
        pos = pos + 27 + nseg + body_len
    # page 1 (after the BOS header page) is the partial tags page
    flags1, lace1 = pages[1]
    assert all(v == 255 for v in lace1) and len(lace1) >= 1
    flags2, _lace2 = pages[2]
    assert flags2 & 0x01  # continuation flag set


def test_ogg_tags_rejections():
    import struct as _s

    from danae_spark.multimodal.ogg import (
        _comment_packet,
        _page,
        parse_ogg_tags,
        synth_ogg_tagged,
    )

    good = synth_ogg_tagged(3)  # vorbis
    assert parse_ogg_tags(b"") is None
    assert parse_ogg_tags(b"OggS garbage") is None
    assert parse_ogg_tags(good[: len(good) // 2]) is None  # no EOS

    # malformed comment blocks, each wrapped in a fresh valid stream
    def tagged_with(block_comments, framing_ok=True):
        from danae_spark.multimodal.ogg import synth_ogg

        return synth_ogg(2, comments=("v", block_comments))

    # a comment with no '=' must reject the tag whole
    bad = tagged_with(["TITLE=ok", "no separator here"])
    assert parse_ogg_tags(bad) is None
    # an '=' with an empty key
    assert parse_ogg_tags(tagged_with(["=value"])) is None
    # a key with out-of-range chars
    assert parse_ogg_tags(tagged_with(["TI\tLE=x"])) is None
    # byte-level: flip a byte inside the comment packet -> CRC breaks -> None
    q = bytearray(good)
    q[len(q) // 3] ^= 0x40
    parse_ogg_tags(bytes(q))  # never raises; page CRC rejects silently


def test_ogg_tags_frame_over_spark(spark):
    from danae_spark.multimodal.ogg import ogg_tags_frame, synth_ogg_tagged

    rows = [
        (1, bytearray(synth_ogg_tagged(2))),
        (2, None),
        (3, bytearray(b"not ogg")),
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    out = {
        r["media_id"]: r
        for r in ogg_tags_frame(df, id_col="media_id", payload_col="blob").collect()
    }
    assert out[1]["title"] == "title 2 track 14"
    assert out[2]["codec"] is None and out[3]["codec"] is None


def test_ogg_tags_registered_oracle_matches_duckdb(spark, sf_dir):
    import os

    import duckdb

    from danae_spark.catalog import table_path
    from danae_spark.multimodal.ogg import OGG_TAGS_ORACLE
    from danae_spark.queries import load_all

    fn = load_all()["ogg_tags_extract"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(OGG_TAGS_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want
