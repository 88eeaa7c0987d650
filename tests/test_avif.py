"""AVIF/HEIF meta-box walk: roundtrip grid, structural rejects, fuzz,
and the triage routing that closes the pre-r17 "every AVIF censuses as
unknown" gap."""

import random
import struct

import pytest

from danae_spark.multimodal.avif import (
    STILL_BRANDS,
    _av01_len,
    _geom,
    parse_avif,
    synth_avif,
)
from danae_spark.multimodal.mp4 import _box, _full


def test_roundtrip_grid():
    for d in range(160):
        r = parse_avif(synth_avif(d))
        if d % 19 == 7 or d % 23 == 11:
            assert r is None, d
            continue
        g = _geom(d)
        assert r is not None, d
        assert r["brand"] == g["brand"].decode()
        assert (r["width"], r["height"]) == (g["width"], g["height"])
        assert r["n_channels"] == g["channels"]
        assert r["bit_depth"] == g["bits"]
        assert r["n_av01"] == g["n_av01"]
        assert r["av01_bytes"] == sum(
            _av01_len(d, k) for k in range(g["n_av01"])
        )
        v = g["v"]
        assert r["has_alpha"] == (v == 3)
        if v == 1:
            assert r["rotation"] == (d % 4) * 90
            assert r["mirror"] == d % 2
            assert r["exif_orientation"] == 1 + d % 8
            assert r["exif_make"] == f"cam{d % 5}"
        else:
            assert r["rotation"] is None and r["exif_orientation"] is None
        if v == 2:
            assert (r["grid_rows"], r["grid_cols"]) == (g["rows"], g["cols"])
        else:
            assert r["grid_rows"] is None


def _clean_doc(variant: int) -> int:
    """A doc id of the given variant hitting neither reject leg."""
    for d in range(variant, 400, 4):
        if d % 19 != 7 and d % 23 != 11:
            return d
    raise AssertionError


def test_non_still_brand_is_none():
    # a regular MP4 (isom brand) must NOT be claimed by the still walk
    from danae_spark.multimodal.mp4 import synth_mp4

    assert parse_avif(synth_mp4(3)) is None


def test_brand_claim_without_meta_rejects():
    raw = _box(b"ftyp", b"avif" + struct.pack(">I", 0) + b"avifmif1")
    assert parse_avif(raw + _box(b"mdat", b"x" * 32)) is None


def test_hdlr_must_be_pict():
    d = _clean_doc(0)
    raw = bytearray(synth_avif(d))
    ix = raw.find(b"pict")
    raw[ix : ix + 4] = b"vide"
    assert parse_avif(bytes(raw)) is None


def test_grid_tile_count_mismatch_rejects():
    d = _clean_doc(2)
    raw = bytearray(synth_avif(d))
    # shrink the dimg reference_count by one: the grid descriptor's
    # rows*cols no longer matches the reference list
    ix = raw.find(b"dimg")
    n = struct.unpack_from(">H", raw, ix + 6)[0]
    g = _geom(d)
    assert n == g["rows"] * g["cols"]
    if n > 1:
        struct.pack_into(">H", raw, ix + 6, n - 1)
        assert parse_avif(bytes(raw)) is None


def test_grid_descriptor_ispe_disagreement_rejects():
    d = _clean_doc(2)
    raw = bytearray(synth_avif(d))
    ix = raw.find(b"ispe")
    struct.pack_into(">I", raw, ix + 8, 9999)  # lie about the width
    assert parse_avif(bytes(raw)) is None


def test_corrupt_exif_item_rejects():
    d = _clean_doc(1)
    raw = bytearray(synth_avif(d))
    ix = raw.find(b"II*\x00")
    raw[ix + 2] = 99  # TIFF magic != 42
    assert parse_avif(bytes(raw)) is None


def test_truncation_and_ipma_reject_legs():
    assert parse_avif(synth_avif(7)) is None  # 7 % 19 == 7
    assert parse_avif(synth_avif(11)) is None  # 11 % 23 == 11


def test_fuzz_never_raises():
    rng = random.Random(170)
    for trial in range(400):
        d = rng.randrange(200)
        raw = bytearray(synth_avif(d))
        op = trial % 3
        if op == 0:
            raw = raw[: rng.randrange(len(raw))]
        elif op == 1:
            for _ in range(rng.randrange(1, 6)):
                raw[rng.randrange(len(raw))] = rng.randrange(256)
        else:
            i = rng.randrange(len(raw))
            raw = raw[:i] + bytes(rng.randbytes(rng.randrange(1, 16))) + raw[i:]
        r = parse_avif(bytes(raw))
        assert r is None or isinstance(r, dict)


def test_triage_routes_stills():
    from danae_spark.multimodal.triage import triage_payload

    d = _clean_doc(0)
    t = triage_payload(synth_avif(d))
    assert t == {"media_class": "image", "format": "avif", "duration_ms": None}
    d3 = _clean_doc(3)  # heic brand
    t3 = triage_payload(synth_avif(d3))
    assert t3 == {"media_class": "image", "format": "heif", "duration_ms": None}
    # reject legs triage to None, and plain MP4s still reach the video walk
    assert triage_payload(synth_avif(7)) is None
    from danae_spark.multimodal.mp4 import synth_mp4

    assert triage_payload(synth_mp4(4))["media_class"] == "video"


def test_still_brands_cover_judge_list():
    for b in (b"avif", b"avis", b"heic", b"mif1"):
        assert b in STILL_BRANDS


@pytest.mark.usefixtures("spark")
def test_census_frame_over_binary_column(spark):
    from danae_spark.multimodal.avif import avif_census_frame

    rows = [(d, synth_avif(d)) for d in (0, 1, 2, 3, 7, 20)]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r["doc_id"]: r for r in avif_census_frame(df).collect()}
    assert out[7]["brand"] is None  # reject leg
    assert out[2]["grid_rows"] == _geom(2)["rows"]
    assert out[3]["has_alpha"] is True
