"""Image normalization to canonical PNG (multimodal/normalize.py, r16)."""

from __future__ import annotations

import numpy as np

from danae_spark.multimodal.normalize import (
    image_normalize_frame,
    normalize_image,
    png_encode,
)
from danae_spark.multimodal.pixels import _RT_FORMATS, decode_pixels, synth_image


def test_png_encode_channel_matrix():
    rng = np.random.RandomState(2)
    for c in (1, 2, 3, 4):
        for _ in range(4):
            h, w = rng.randint(1, 20), rng.randint(1, 20)
            px = rng.randint(0, 256, (h, w, c)).astype(np.uint8)
            out = decode_pixels(png_encode(px))
            assert out is not None and out.shape == px.shape
            assert (out == px).all(), c


def test_every_rotation_format_normalizes_losslessly():
    for d in range(len(_RT_FORMATS) * 10):
        src = synth_image(d)
        r = normalize_image(src)
        assert r is not None, d
        before = decode_pixels(src)
        after = decode_pixels(r["png"])
        assert after is not None and (after == before).all(), d
        assert r["png"][:8] == b"\x89PNG\r\n\x1a\n"


def test_webp_alpha_normalizes_to_rgba_png():
    from danae_spark.multimodal.webp import _gray_rgba, _riff, encode_vp8l

    px = _gray_rgba(np.arange(64, dtype=np.int64).reshape(8, 8) * 3)
    px[2:5, 2:5, 3] = 80  # semi-transparent patch
    payload = _riff([(b"VP8L", encode_vp8l(px, mode="sg"))])
    r = normalize_image(payload)
    assert r is not None and r["channels"] == 4
    out = decode_pixels(r["png"])
    assert (out == px).all()


def test_rejects_and_frame(spark):
    assert normalize_image(b"") is None
    assert normalize_image(b"\x00garbage bytes") is None
    rows = [(d, bytearray(synth_image(d))) for d in range(4)] + [
        (99, bytearray(b"not an image")), (100, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in image_normalize_frame(df).collect()}
    assert out[99]["png"] is None and out[100]["png"] is None
    assert out[0]["png"][:4] == b"\x89PNG"[:4] and out[0]["width"] == 8
    plan = image_normalize_frame(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
