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
