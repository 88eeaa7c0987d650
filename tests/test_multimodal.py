"""Multimodal plumbing: batch shapes, schemas, determinism of the
stubbed decode pipeline."""

from __future__ import annotations

import pytest

from danae_spark.multimodal import transforms
from danae_spark.multimodal.binary import decode_image


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        transforms._require_codecs()
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_resize_schema_and_determinism(spark, sf_dir):
    p = transforms.document_payloads(spark, sf_dir)
    out1 = {r["doc_id"]: r["content_hash"] for r in transforms.resize_images(p).collect()}
    out2 = {r["doc_id"]: r["content_hash"] for r in transforms.resize_images(p).collect()}
    assert out1 == out2
    assert len(out1) == p.count()


def test_frame_sampling_explodes_rows(spark, sf_dir):
    p = transforms.document_payloads(spark, sf_dir)
    n = p.count()
    frames = transforms.sample_frames(p, n_frames=4)
    assert frames.count() == 4 * n
    one = frames.filter("doc_id = 0").collect()
    assert sorted(r["frame_index"] for r in one) == [0, 1, 2, 3]
    offs = [r["frame_offset_bytes"] for r in sorted(one, key=lambda r: r["frame_index"])]
    assert offs == sorted(offs)


def test_features_normalized(spark, sf_dir):
    p = transforms.document_payloads(spark, sf_dir)
    feats = transforms.extract_features(p).collect()
    by_doc = {}
    for r in feats:
        by_doc.setdefault(r["doc_id"], 0.0)
        by_doc[r["doc_id"]] += r["feature"]
    for doc, total in by_doc.items():
        assert total == pytest.approx(1.0, abs=1e-3)


def test_media_near_dup_end_to_end(spark, sf_dir):
    """payload → features → LSH bucket → cosine pairs: sound vs a
    brute-force numpy check, and catches the exact-duplicate docs."""
    import numpy as np

    from danae_spark.multimodal import transforms


    out = {(r["d1"], r["d2"]): r["cosine"] for r in
           transforms.media_near_dup(spark, sf_dir).collect()}
    assert out, "no near-dup media pairs found"

    # brute force over the same features
    feats = transforms.extract_features(
        transforms.document_payloads(spark, sf_dir)
    ).collect()
    vecs = {}
    for r in feats:
        vecs.setdefault(r["doc_id"], [0.0] * 8)[r["dim"]] = r["feature"]
    ids = sorted(vecs)
    mat = np.array([vecs[i] for i in ids])
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / np.outer(norms, norms)
    brute = {}
    for i_idx, i in enumerate(ids):
        for j_idx in range(i_idx + 1, len(ids)):
            c = np.floor(sims[i_idx, j_idx] * 1e6 + 0.5001) / 1e6
            if c >= 0.999:
                brute[(i, ids[j_idx])] = c
    # LSH output is a subset of brute force with identical cosines
    for k, c in out.items():
        assert k in brute and abs(brute[k] - c) < 1e-9
    # identical feature vectors share a bucket by construction, so every
    # brute-force pair at cosine 1.0 MUST be recalled by the LSH path
    for k, c in brute.items():
        if c >= 1.0:
            assert k in out, k


# ---------------------------------------------- stdlib image-header decode


def _png(w=640, h=360, color_type=6, bit_depth=8):
    import struct
    import zlib

    ihdr = struct.pack(">II5B", w, h, bit_depth, color_type, 0, 0, 0)
    chunk = struct.pack(">I", 13) + b"IHDR" + ihdr
    crc = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    return b"\x89PNG\r\n\x1a\n" + chunk + crc


def _jpeg(w=640, h=480, ncomp=3):
    import struct

    # APP0 length counts the 2 length bytes + 14 content bytes = 16
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 8 + 3 * ncomp)
        + bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([ncomp])
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"[: 3 * ncomp]
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif(w=320, h=200):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 4


def test_parse_image_headers():
    from danae_spark.multimodal import binary

    png = binary.parse_image_header(_png())
    assert png == {
        "format": "png", "width": 640, "height": 360, "channels": 4, "bit_depth": 8
    }
    jpg = binary.parse_image_header(_jpeg())
    assert (jpg["format"], jpg["width"], jpg["height"], jpg["channels"]) == (
        "jpeg", 640, 480, 3
    )
    gif = binary.parse_image_header(_gif())
    assert (gif["format"], gif["width"], gif["height"]) == ("gif", 320, 200)
    # non-image bytes fall through to the declared fake path
    assert binary.parse_image_header(b"hello world, not an image") is None
    assert binary.parse_image_header(b"") is None
    # pixel decode stays stubbed
    import pytest

    with pytest.raises(NotImplementedError):
        binary.decode_image(_png())


def test_meta_pipeline_uses_real_headers(spark):
    """Genuine image payloads flow through the SAME mapInPandas plumbing
    and come out with their true dimensions."""
    from danae_spark.multimodal import binary

    rows = [(1, _png(101, 55)), (2, _jpeg(320, 240)), (3, b"plain text payload")]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r.doc_id: r for r in df.mapInPandas(
        binary._extract_meta, schema=binary.META_SCHEMA
    ).collect()}
    assert (out[1].width, out[1].height, out[1].channels) == (101, 55, 4)
    assert (out[2].width, out[2].height, out[2].channels) == (320, 240, 3)
    # text payload keeps the deterministic fake metadata
    fake = binary.fake_decode_meta(b"plain text payload")
    assert (out[3].width, out[3].height) == (fake["width"], fake["height"])


def _wav_payload(sample_rate=16000, channels=1, bits=16, n_samples=16000):
    import struct

    byte_rate = sample_rate * channels * bits // 8
    data = b"\x00" * (n_samples * channels * bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * bits // 8, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _mp3_payload(with_id3=False):
    # 0xFF 0xFB: sync + MPEG1 + Layer III; 0x90: bitrate idx 9 (128 kbps),
    # 44100 Hz; 0x00: stereo
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 64
    if with_id3:
        import struct as _s
        tag_body = b"\x00" * 37  # syncsafe size 37 fits in one byte
        return b"ID3\x04\x00\x00" + bytes([0, 0, 0, len(tag_body)]) + tag_body + frame
    return frame


def test_parse_audio_headers():
    from danae_spark.multimodal.binary import parse_audio_header

    wav = parse_audio_header(_wav_payload())
    assert wav == {
        "format": "wav", "sample_rate": 16000, "channels": 1, "bit_depth": 16,
        "duration_ms": 1000, "bitrate_kbps": 256,
    }
    stereo = parse_audio_header(_wav_payload(sample_rate=44100, channels=2, n_samples=44100))
    assert stereo["channels"] == 2 and stereo["duration_ms"] == 1000

    mp3 = parse_audio_header(_mp3_payload())
    assert mp3["format"] == "mp3" and mp3["sample_rate"] == 44100
    assert mp3["bitrate_kbps"] == 128 and mp3["channels"] == 2

    # ID3v2-tagged stream: the tag is skipped to the first frame sync
    tagged = parse_audio_header(_mp3_payload(with_id3=True))
    assert tagged is not None and tagged["sample_rate"] == 44100

    assert parse_audio_header(b"not audio at all") is None
    assert parse_audio_header(b"RIFF\x00\x00\x00\x00WAVEjunk") is None


def test_parse_audio_header_flac():
    from danae_spark.multimodal.binary import parse_audio_header
    from danae_spark.multimodal.flac import synth_flac_pcm, _flac_params

    for d in (0, 1, 5):
        rate, bits, channels, _m = _flac_params(d)
        h = parse_audio_header(synth_flac_pcm(d, 512))
        assert h["format"] == "flac"
        assert h["sample_rate"] == rate and h["channels"] == channels
        assert h["bit_depth"] == bits
        assert h["duration_ms"] == 512 * 1000 // rate
    # truncated STREAMINFO rejects
    assert parse_audio_header(b"fLaC" + b"\x00" * 38) is None


def test_parse_audio_header_ogg_and_video_header_webm():
    from danae_spark.multimodal.binary import parse_audio_header, parse_video_header
    from danae_spark.multimodal.ogg import synth_ogg, _doc_params
    from danae_spark.multimodal.webm import synth_webm, _doc_geometry

    for d in (2, 3):
        p = _doc_params(d)
        h = parse_audio_header(synth_ogg(d))
        assert h["format"] == "ogg-" + p["codec"]
        assert h["sample_rate"] == p["rate"] and h["channels"] == p["channels"]
        assert h["duration_ms"] is not None
    assert parse_audio_header(b"OggS" + b"\x00" * 30) is None

    g = _doc_geometry(4)
    v = parse_video_header(synth_webm(4))
    assert v["format"] == "webm" and v["n_tracks"] == 1
    assert v["width"] == g["width"] and v["height"] == g["height"]
    assert parse_video_header(b"\x1a\x45\xdf\xa3" + b"\x00" * 20) is None


def test_audio_meta_frame_over_spark(spark):
    from danae_spark.multimodal.binary import audio_meta_frame

    rows = [
        (1, bytearray(_wav_payload())),
        (2, bytearray(_mp3_payload())),
        (3, bytearray(b"opaque non-audio payload")),
    ]
    df = spark.createDataFrame(rows, "k bigint, blob binary")
    out = {r["doc_id"]: r for r in
           audio_meta_frame(df, id_col="k", payload_col="blob").collect()}
    assert out[1]["format"] == "wav" and out[1]["sample_rate"] == 16000
    assert out[1]["duration_ms"] == 1000
    assert out[2]["format"] == "mp3" and out[2]["bitrate_kbps"] == 128
    assert out[3]["format"] is None and out[3]["byte_size"] == 24
    import hashlib as _h
    assert out[3]["sha256"] == _h.sha256(b"opaque non-audio payload").hexdigest()


def test_parse_video_header_v0_and_v1():
    from danae_spark.multimodal.binary import parse_video_header, synth_mp4

    p = synth_mp4("isom", 600, 1800, 2, 640, 480)
    hdr = parse_video_header(p)
    assert hdr == {
        "format": "mp4", "brand": "isom", "timescale": 600,
        "duration_ms": 3000, "n_tracks": 2, "width": 640, "height": 480,
    }
    # v1 mvhd (64-bit times/duration): hand-build the box layout
    def box(btype, body):
        return (8 + len(body)).to_bytes(4, "big") + btype + body

    mvhd_v1 = (
        b"\x01\x00\x00\x00"
        + (0).to_bytes(8, "big") * 2  # creation/modification 64-bit
        + (1000).to_bytes(4, "big")  # timescale
        + (2500).to_bytes(8, "big")  # duration 64-bit
    )
    p1 = box(b"ftyp", b"mp42" + b"\x00" * 4 + b"isom") + box(
        b"moov", box(b"mvhd", mvhd_v1)
    )
    hdr1 = parse_video_header(p1)
    assert hdr1["timescale"] == 1000 and hdr1["duration_ms"] == 2500
    assert hdr1["brand"] == "mp42" and hdr1["n_tracks"] == 0


def test_parse_video_header_rejects_garbage():
    from danae_spark.multimodal.binary import parse_video_header, synth_mp4

    assert parse_video_header(b"not a video at all") is None
    assert parse_video_header(b"") is None
    # truncated mid-box: the walk stops without raising; ftyp survives
    p = synth_mp4("isom", 600, 600, 1, 320, 240)
    hdr = parse_video_header(p[:40])
    assert hdr is not None and hdr["brand"] == "isom"
    assert hdr["timescale"] is None


def test_video_meta_frame_plumbing(spark):
    from danae_spark.multimodal.binary import synth_mp4, video_meta_frame

    rows = [
        (1, bytearray(synth_mp4("isom", 600, 1200, 1, 320, 240))),
        (2, bytearray(b"garbage payload")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in video_meta_frame(df).collect()}
    assert out[1].brand == "isom" and out[1].duration_ms == 2000
    assert out[1].width == 320 and out[1].n_tracks == 1
    assert out[2].format is None and out[2].byte_size == 15
