"""MPEG-1 Layer III structural decode (multimodal/mp3.py): bit-exact
side-info parse, frame walk, reservoir accounting, and the clean
rejection contract for everything outside the structural subset."""

from __future__ import annotations

import struct

from danae_spark.multimodal.mp3 import (
    _BITRATES_KBPS,
    _SAMPLE_RATES,
    _granule_fields,
    _stream_params,
    frame_length,
    parse_mp3_stream,
    parse_sideinfo_bits,
    synth_mp3_stream,
)


def test_synth_parse_roundtrip_all_fields():
    for d in range(0, 60):
        agg = parse_mp3_stream(synth_mp3_stream(d))
        assert agg is not None, d
        nf, ch, bi, ri = _stream_params(d)
        assert agg["n_frames"] == nf
        assert agg["channels"] == ch
        assert agg["bitrate_kbps"] == _BITRATES_KBPS[bi]
        assert agg["sample_rate"] == _SAMPLE_RATES[ri]
        assert agg["duration_ms"] == nf * 1152 * 1000 // _SAMPLE_RATES[ri]
        fields = [
            _granule_fields(d, f, g, c)
            for f in range(nf)
            for g in range(2)
            for c in range(ch)
        ]
        assert agg["main_bits"] == sum(f[0] for f in fields)
        assert agg["big_values_sum"] == sum(f[1] for f in fields)
        assert agg["gain_sum"] == sum(f[2] for f in fields)
        assert agg["n_short_granules"] == sum(f[3] for f in fields)
        assert agg["max_reservoir"] == max((d * 3 + f * 29) % 512 for f in range(nf))


def test_sideinfo_bit_layout_mono_and_stereo():
    """The parser consumes exactly 136/256 bits and fields land where
    the spec puts them: craft a side-info block by hand and read it."""
    from danae_spark.multimodal.mp3 import _BitWriter

    for channels in (1, 2):
        w = _BitWriter()
        w.write(257, 9)  # main_data_begin
        w.write(0, 5 if channels == 1 else 3)
        for _ in range(channels):
            w.write(0b1010, 4)  # scfsi
        for g in range(2):
            for c in range(channels):
                w.write(1000 + g * 100 + c, 12)  # part2_3_length
                w.write(288 + g, 9)
                w.write(200 + c, 8)
                w.write(7, 4)
                w.write(0, 1)  # long blocks
                for t in (3, 7, 11):
                    w.write(t, 5)
                w.write(5, 4)
                w.write(2, 3)
                w.write(1, 1)  # preflag
                w.write(0, 1)
                w.write(1, 1)
        si = parse_sideinfo_bits(w.flush(), channels)
        assert si["main_data_begin"] == 257
        assert si["scfsi"] == [[1, 0, 1, 0]] * channels
        for g in range(2):
            for c in range(channels):
                gr = si["granules"][g][c]
                assert gr["part2_3_length"] == 1000 + g * 100 + c
                assert gr["big_values"] == 288 + g
                assert gr["global_gain"] == 200 + c
                assert gr["scalefac_compress"] == 7
                assert gr["block_type"] == 0
                assert gr["table_select"] == [3, 7, 11]
                assert gr["region0_count"] == 5
                assert gr["region1_count"] == 2
                assert gr["preflag"] == 1
                assert gr["count1table_select"] == 1


def test_crc_protected_frames_skip_the_crc16():
    """protection=0 inserts a 2-byte CRC between header and side info;
    the walker must skip it (real encoders emit both variants)."""
    raw = bytearray(synth_mp3_stream(4))
    agg0 = parse_mp3_stream(bytes(raw))
    # rebuild the stream with protection=0 + dummy CRC in every frame,
    # stealing 2 bytes from the fill so frame lengths stay valid
    nf, ch, bi, ri = _stream_params(4)
    kbps, rate = _BITRATES_KBPS[bi], _SAMPLE_RATES[ri]
    out = bytearray()
    i = 0
    for f in range(nf):
        fl = frame_length(kbps, rate, f % 2)
        frame = bytearray(raw[i : i + fl])
        frame[1] &= 0xFE  # protection=0
        si_len = 17 if ch == 1 else 32
        frame = frame[:4] + b"\xde\xad" + frame[4 : fl - 2]
        assert len(frame) == fl
        out += frame
        i += fl
    agg1 = parse_mp3_stream(bytes(out))
    assert agg1 == agg0


def test_id3v2_prefix_is_skipped():
    body = synth_mp3_stream(7)
    tag = b"ID3" + bytes((4, 0, 0)) + bytes((0, 0, 0, 10)) + b"x" * 10
    assert parse_mp3_stream(tag + body) == parse_mp3_stream(body)


def test_out_of_subset_rejected():
    good = bytearray(synth_mp3_stream(3))
    assert parse_mp3_stream(b"") is None
    assert parse_mp3_stream(b"\xff\xfb") is None  # truncated header
    assert parse_mp3_stream(bytes(good[:-1])) is None  # truncated last frame
    # free-format (bitrate_idx 0) and bad bitrate/rate indices
    for b2 in (0x00, 0xF0, 0x0C):
        p = bytearray(good)
        p[2] = b2
        assert parse_mp3_stream(bytes(p)) is None
    # MPEG-2 / Layer II sync is not MPEG-1 Layer III
    p = bytearray(good)
    p[1] = 0xF3  # MPEG-2
    assert parse_mp3_stream(bytes(p)) is None
    p = bytearray(good)
    p[1] = 0xFD  # Layer II
    assert parse_mp3_stream(bytes(p)) is None
    # garbage after a valid frame (a crawl tail) rejects the stream
    assert parse_mp3_stream(bytes(good) + b"\x00\x01\x02\x03") is None


def test_mid_stream_reconfiguration_rejected():
    a = synth_mp3_stream(0)   # stereo? doc 0: channels 1
    b = synth_mp3_stream(1)   # channels 2
    assert parse_mp3_stream(a + b) is None


def test_short_block_granules_parse_window_switching_path():
    # _granule_fields plants short blocks whenever (d+f+g+ch)%5==0 — at
    # least one stream in 0..9 exercises the window-switching layout
    total_short = sum(
        parse_mp3_stream(synth_mp3_stream(d))["n_short_granules"]
        for d in range(10)
    )
    assert total_short > 0
