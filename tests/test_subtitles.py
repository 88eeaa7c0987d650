"""Subtitle extraction (multimodal/subtitles.py): SRT + WebVTT."""

import pytest

from danae_spark.multimodal.subtitles import (
    parse_subtitles,
    synth_subtitles,
    _cue_geometry,
    _cue_words,
)


def test_roundtrip_doc_grid():
    for d in range(24):
        c = parse_subtitles(synth_subtitles(d))
        assert c is not None, d
        g = _cue_geometry(d)
        assert c["format"] == g["fmt"] and c["n_cues"] == g["n_cues"]
        exp = "\n".join(" ".join(_cue_words(d, i)) for i in range(g["n_cues"]))
        assert c["text"] == exp


def test_srt_hand_fixture():
    srt = (
        "1\n00:00:01,000 --> 00:00:02,500\nhello there\n\n"
        "2\n00:00:03,000 --> 00:01:00,250\nsecond cue\nwith two lines\n"
    ).encode()
    c = parse_subtitles(srt)
    assert c["format"] == "srt" and c["n_cues"] == 2
    assert c["total_cue_ms"] == 1500 + (60_250 - 3000)
    assert c["span_ms"] == 60_250 - 1000
    assert c["text"] == "hello there\nsecond cue\nwith two lines"
    assert c["n_words"] == 7


def test_vtt_hand_fixture_with_notes_ids_settings():
    vtt = (
        "WEBVTT\n\nNOTE a comment\nspanning lines\n\n"
        "intro-cue\n00:00.000 --> 00:05.000 align:start\nshort clock form\n\n"
        "01:02:03.500 --> 01:02:04.000\nfull clock form\n"
    ).encode()
    c = parse_subtitles(vtt)
    assert c["format"] == "vtt" and c["n_cues"] == 2
    assert c["total_cue_ms"] == 5000 + 500
    assert c["text"] == "short clock form\nfull clock form"


def test_rejections():
    # SRT index gap
    assert parse_subtitles(
        b"1\n00:00:01,000 --> 00:00:02,000\na\n\n3\n00:00:03,000 --> 00:00:04,000\nb\n"
    ) is None
    # end <= start
    assert parse_subtitles(b"1\n00:00:02,000 --> 00:00:02,000\na\n") is None
    # non-monotonic starts
    assert parse_subtitles(
        b"1\n00:00:05,000 --> 00:00:06,000\na\n\n2\n00:00:01,000 --> 00:00:02,000\nb\n"
    ) is None
    # malformed timestamp (minutes >= 60, wrong separator in srt)
    assert parse_subtitles(b"1\n00:75:01,000 --> 00:76:02,000\na\n") is None
    assert parse_subtitles(b"1\n00:00:01.000 --> 00:00:02.000\na\n") is None
    # empty cue text
    assert parse_subtitles(b"1\n00:00:01,000 --> 00:00:02,000\n") is None
    # not utf-8 / not subtitles
    assert parse_subtitles(b"\xff\xfe\x00 garbage") is None
    assert parse_subtitles(b"just some prose, no cues") is None
    assert parse_subtitles(b"") is None


def test_mutation_sweep_never_raises():
    p = bytearray(synth_subtitles(5))
    for off in range(0, len(p), 3):
        q = bytearray(p)
        q[off] ^= 0x15
        parse_subtitles(bytes(q))  # must not raise


def test_subtitle_frame_feeds_text_ops(spark):
    """The extracted text column flows into a plain Spark text op —
    the multimodal → text-curation bridge."""
    from pyspark.sql import functions as F

    from danae_spark.multimodal.subtitles import subtitle_frame

    rows = [
        (1, bytearray(synth_subtitles(1))),
        (2, bytearray(b"not a subtitle file")),
        (3, bytearray(synth_subtitles(4))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = subtitle_frame(df)
    toks = out.filter(F.col("text").isNotNull()).select(
        "doc_id", F.size(F.split("text", r"\s+")).alias("tokens")
    )
    got = {r["doc_id"]: r["tokens"] for r in toks.collect()}
    assert set(got) == {1, 3}
    exp1 = sum(len(_cue_words(1, i)) for i in range(_cue_geometry(1)["n_cues"]))
    assert got[1] == exp1
