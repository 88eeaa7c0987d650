"""MJPEG-in-AVI real frame decode (multimodal/avi.py, r15)."""

from __future__ import annotations

import random
import struct

import numpy as np

from danae_spark.multimodal.avi import (
    mj_block_luma,
    parse_avi_mjpeg,
    synth_mjpeg_avi,
)
from danae_spark.multimodal.pixels import dhash_bits


def _grid(d: int, f: int) -> np.ndarray:
    return np.array(
        [[mj_block_luma(d, f, y // 4, x // 4) for x in range(8)] for y in range(8)],
        dtype=np.int64,
    )


def test_roundtrip_and_frame_digests():
    for d in (0, 1, 2, 3, 4, 6, 11, 12, 22, 46):
        r = parse_avi_mjpeg(synth_mjpeg_avi(d))
        assert r is not None, d
        assert (r["width"], r["height"]) == (16, 16)
        assert r["channels"] == (3 if d % 2 else 1)
        assert r["n_frames"] == 2 + d % 3
        assert r["us_per_frame"] == 40000 + (d % 7) * 1000
        acc = 0
        for f in range(r["n_frames"]):
            acc ^= dhash_bits(_grid(d, f))
        assert r["dhash_first"] == dhash_bits(_grid(d, 0))
        assert r["dhash_xor"] == acc


def test_truncated_frame_rejects_whole():
    assert parse_avi_mjpeg(synth_mjpeg_avi(5)) is None  # d % 23 == 5 leg
    assert parse_avi_mjpeg(synth_mjpeg_avi(28)) is None


def test_non_mjpg_codec_rejects():
    blob = bytearray(synth_mjpeg_avi(2))
    i = blob.find(b"vidsMJPG")
    assert i != -1
    blob[i + 4 : i + 8] = b"H264"  # other codecs: documented boundary
    assert parse_avi_mjpeg(bytes(blob)) is None


def test_idx1_frame_count_mismatch_rejects():
    blob = bytearray(synth_mjpeg_avi(2))
    i = blob.rfind(b"00dc")  # the last idx1 entry's fourcc
    blob[i : i + 4] = b"01wb"
    assert parse_avi_mjpeg(bytes(blob)) is None


def test_bad_magic_and_truncation():
    blob = synth_mjpeg_avi(4)
    assert parse_avi_mjpeg(b"RIFX" + blob[4:]) is None
    assert parse_avi_mjpeg(blob[:40]) is None
    assert parse_avi_mjpeg(b"") is None


def test_fuzz_never_raises():
    rng = random.Random(21)
    blob = synth_mjpeg_avi(9)
    for _ in range(800):
        buf = bytearray(blob)
        i = rng.randrange(len(buf) * 8)
        buf[i >> 3] ^= 1 << (i & 7)
        parse_avi_mjpeg(bytes(buf))
    for _ in range(300):
        parse_avi_mjpeg(bytes(rng.randrange(256) for _ in range(rng.randrange(1, 100))))


def test_frame_api(spark):
    from danae_spark.multimodal.avi import mjpeg_frames_frame

    df = spark.createDataFrame(
        [(d, bytearray(synth_mjpeg_avi(d))) for d in (1, 2, 5)] + [(9, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in mjpeg_frames_frame(df).collect()}
    assert got[1]["n_frames"] == 3 and got[2]["n_frames"] == 4
    assert got[5]["n_frames"] is None and got[9]["n_frames"] is None
    plan = mjpeg_frames_frame(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow Arrow map, the census contract


def test_triage_recognizes_avi_and_tiff():
    import numpy as np

    from danae_spark.multimodal.tiff import synth_tiff
    from danae_spark.multimodal.triage import triage_payload

    t = triage_payload(synth_tiff(np.arange(64).reshape(8, 8) % 256, "tiff_pack"))
    assert t == {"media_class": "image", "format": "tiff", "duration_ms": None}
    a = triage_payload(synth_mjpeg_avi(4))
    assert a["media_class"] == "video" and a["format"] == "avi-mjpeg"
    assert a["duration_ms"] == (2 + 4 % 3) * (40000 + (4 % 7) * 1000) // 1000
    assert triage_payload(synth_mjpeg_avi(5)) is None  # truncated frame
