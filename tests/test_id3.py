"""ID3v2 metadata extraction (multimodal/id3.py)."""

import pytest

from danae_spark.multimodal.id3 import (
    parse_id3,
    synth_id3_mp3,
    _frame,
    _meta_strings,
)


def test_roundtrip_doc_grid_both_versions():
    for d in range(24):
        c = parse_id3(synth_id3_mp3(d))
        assert c is not None, d
        m = _meta_strings(d)
        assert (c["title"], c["artist"], c["album"], c["year"]) == (
            m["title"], m["artist"], m["album"], m["year"]
        )
        assert c["version"] == (4 if d % 2 == 0 else 3)


def test_all_four_encodings_decode():
    """Hand-built v2.4 tag with one frame per encoding — each must
    decode to the same string."""
    frames = (
        _frame(4, b"TIT2", 0, "same text")
        + _frame(4, b"TPE1", 1, "same text")
        + _frame(4, b"TALB", 2, "same text")
        + _frame(4, b"TDRC", 3, "same text")
    )
    hdr = b"ID3" + bytes([4, 0, 0])
    hdr += bytes(((len(frames) >> s) & 0x7F) for s in (21, 14, 7, 0))
    c = parse_id3(hdr + frames)
    assert c is not None
    assert c["title"] == c["artist"] == c["album"] == c["year"] == "same text"


def test_syncsafe_vs_plain_size_arithmetic():
    """A frame body of 200 bytes: v2.4 syncsafe encodes it 0x00 0x00
    0x01 0x48; reading that with v2.3 plain arithmetic gives 0x148 =
    328 — the walker must use the version's arithmetic (the grid pins
    both, this pins the boundary explicitly)."""
    text = "x" * 199  # body = enc byte + 199 = 200 bytes
    f4 = _frame(4, b"TIT2", 3, text)
    assert f4[4:8] == bytes([0, 0, 1, 0x48])
    f3 = _frame(3, b"TIT2", 3, text)
    assert f3[4:8] == bytes([0, 0, 0, 200])


def test_rejections():
    good = synth_id3_mp3(2)
    # bad magic / version / flags
    assert parse_id3(b"IDX" + good[3:]) is None
    assert parse_id3(b"ID3" + bytes([5, 0, 0]) + good[6:]) is None
    assert parse_id3(b"ID3" + bytes([4, 0, 0x0F]) + good[6:]) is None
    # frame escaping the tag: declare a huge frame size
    frames = b"TIT2" + bytes([0, 0, 7, 0x7F]) + b"\x00\x00" + bytes([3]) + b"hi"
    hdr = b"ID3" + bytes([4, 0, 0]) + bytes(((len(frames) >> s) & 0x7F) for s in (21, 14, 7, 0))
    assert parse_id3(hdr + frames) is None
    # invalid encoding byte
    frames = b"TIT2" + bytes([0, 0, 0, 3]) + b"\x00\x00" + bytes([9]) + b"hi"
    hdr = b"ID3" + bytes([4, 0, 0]) + bytes(((len(frames) >> s) & 0x7F) for s in (21, 14, 7, 0))
    assert parse_id3(hdr + frames) is None
    # undecodable UTF-8
    frames = b"TIT2" + bytes([0, 0, 0, 3]) + b"\x00\x00" + bytes([3]) + b"\xff\xfe"
    hdr = b"ID3" + bytes([4, 0, 0]) + bytes(((len(frames) >> s) & 0x7F) for s in (21, 14, 7, 0))
    assert parse_id3(hdr + frames) is None
    # no tag at all
    assert parse_id3(b"") is None
    assert parse_id3(b"\xff\xfb\x90\x00" * 10) is None


def test_mutation_sweep_never_raises():
    p = bytearray(synth_id3_mp3(3))
    for off in range(0, min(len(p), 400), 3):
        q = bytearray(p)
        q[off] ^= 0x2A
        parse_id3(bytes(q))  # must not raise


def test_id3_frame_over_spark(spark):
    from danae_spark.multimodal.id3 import id3_frame

    rows = [
        (1, bytearray(synth_id3_mp3(1))),
        (2, bytearray(b"untagged bytes")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in id3_frame(df).collect()}
    assert out[1]["title"] == _meta_strings(1)["title"]
    assert out[2]["title"] is None


# ---------------------------------------------------------------- r10:
# unsynchronisation, extended headers, footer, frame format flags, v2.2


def _syncsafe4(n: int) -> bytes:
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def _tag(version: int, body: bytes, flags: int = 0, footer: bool = False) -> bytes:
    hdr = b"ID3" + bytes([version, 0, flags]) + _syncsafe4(len(body))
    out = hdr + body
    if footer:
        out += b"3DI" + bytes([version, 0, flags]) + _syncsafe4(len(body))
    return out


def _stuff(data: bytes) -> bytes:
    """Unsynchronisation encoder: stuff 0x00 after every 0xFF (a valid
    superset of the spec's only-when-needed rule; the decoder removes
    every FF 00 pair either way)."""
    return data.replace(b"\xff", b"\xff\x00")


def test_v23_tag_level_unsync_no_mojibake():
    """An unsynced v2.3 tag with UTF-16 BOMs (FF FE on the wire) must
    decode the exact strings — the pre-r10 walker treated the stuffed
    stream as frame data and could emit mojibake that latin-1 decoding
    never rejects."""
    frames = (
        _frame(3, b"TIT2", 1, "tëst title ÿ")  # BOM FF FE -> stuffed
        + _frame(3, b"TPE1", 0, "artist ÿellow")  # latin-1 0xFF -> stuffed
    )
    stuffed = _stuff(frames)
    assert stuffed != frames  # the fixture is GENUINELY unsynced
    c = parse_id3(_tag(3, stuffed, flags=0x80))
    assert c is not None
    assert c["title"] == "tëst title ÿ"
    assert c["artist"] == "artist ÿellow"
    assert c["n_frames"] == 2


def test_v24_per_frame_unsync_flag():
    body = bytes([1]) + "über ÿ".encode("utf-16")  # BOM FF FE
    stuffed = _stuff(body)
    frame = b"TIT2" + _syncsafe4(len(stuffed)) + b"\x00\x02" + stuffed
    c = parse_id3(_tag(4, frame))
    assert c is not None and c["title"] == "über ÿ"
    # the tag-level hint alone (no frame flag) must also de-stuff
    frame2 = b"TIT2" + _syncsafe4(len(stuffed)) + b"\x00\x00" + stuffed
    c2 = parse_id3(_tag(4, frame2, flags=0x80))
    assert c2 is not None and c2["title"] == "über ÿ"


def test_extended_headers_skipped():
    frames = _frame(3, b"TIT2", 0, "plain")
    # v2.3: 4-byte size EXCLUDING itself (6 = flags 2 + padding size 4)
    ext3 = b"\x00\x00\x00\x06" + b"\x00\x00" + b"\x00\x00\x00\x00"
    c = parse_id3(_tag(3, ext3 + frames, flags=0x40))
    assert c is not None and c["title"] == "plain"
    # v2.4: syncsafe size INCLUDING itself (min 6)
    frames4 = _frame(4, b"TIT2", 3, "plain")
    ext4 = _syncsafe4(6) + bytes([1, 0])
    c4 = parse_id3(_tag(4, ext4 + frames4, flags=0x40))
    assert c4 is not None and c4["title"] == "plain"


def test_v24_footer_verified_and_counted():
    frames = _frame(4, b"TIT2", 3, "footed")
    c = parse_id3(_tag(4, frames, flags=0x10, footer=True))
    assert c is not None and c["title"] == "footed"
    assert c["tag_bytes"] == 10 + len(frames) + 10
    # flag set but no 3DI magic after the tag: reject
    assert parse_id3(_tag(4, frames, flags=0x10, footer=False)) is None


def test_frame_format_flags_read_not_ignored():
    # grouping byte stripped (v2.3 flag 0x20, v2.4 flag 0x40)
    body = bytes([0xAA, 0]) + b"grouped"
    f3 = b"TIT2" + len(body).to_bytes(4, "big") + b"\x00\x20" + body
    c3 = parse_id3(_tag(3, f3))
    assert c3 is not None and c3["title"] == "grouped"
    f4 = b"TIT2" + _syncsafe4(len(body)) + b"\x00\x40" + body
    c4 = parse_id3(_tag(4, f4))
    assert c4 is not None and c4["title"] == "grouped"
    # v2.4 data-length indicator stripped
    inner = bytes([3]) + b"dli text"
    body4 = _syncsafe4(len(inner)) + inner
    fd = b"TIT2" + _syncsafe4(len(body4)) + b"\x00\x01" + body4
    cd = parse_id3(_tag(4, fd))
    assert cd is not None and cd["title"] == "dli text"
    # compressed / encrypted frames reject the tag whole
    raw = bytes([0]) + b"zz"
    for ver, fmt in ((3, 0x80), (3, 0x40), (4, 0x08), (4, 0x04)):
        size = (
            len(raw).to_bytes(4, "big") if ver == 3 else _syncsafe4(len(raw))
        )
        fr = b"TIT2" + size + bytes([0, fmt]) + raw
        assert parse_id3(_tag(ver, fr)) is None, (ver, fmt)


def test_v22_legacy_tags():
    def f22(fid: bytes, text: str) -> bytes:
        body = bytes([0]) + text.encode("latin-1")
        return fid + len(body).to_bytes(3, "big") + body

    frames = (
        f22(b"TT2", "old title") + f22(b"TP1", "old artist")
        + f22(b"TAL", "old album") + f22(b"TYE", "1979")
    )
    c = parse_id3(_tag(2, frames))
    assert c is not None
    assert (c["version"], c["title"], c["artist"], c["album"], c["year"]) == (
        2, "old title", "old artist", "old album", "1979"
    )
    # unsynced v2.2 (tag-level, like v2.3)
    u = f22(b"TT2", "ÿear zero")
    cu = parse_id3(_tag(2, _stuff(u), flags=0x80))
    assert cu is not None and cu["title"] == "ÿear zero"
    # the v2.2 whole-tag compression bit is a declared boundary
    assert parse_id3(_tag(2, frames, flags=0x40)) is None


def test_unsync_mutation_sweep_never_raises():
    frames = _stuff(_frame(3, b"TIT2", 1, "tëst ÿ"))
    p = bytearray(_tag(3, frames, flags=0x80))
    for off in range(len(p)):
        q = bytearray(p)
        q[off] ^= 0x55
        parse_id3(bytes(q))  # must not raise
