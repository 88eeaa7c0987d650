"""EXIF/TIFF IFD extraction: grid parity, reject-whole robustness."""

from __future__ import annotations

import struct

import duckdb
import pytest

from danae_spark.catalog import table_path
from danae_spark.multimodal import exif
from danae_spark.multimodal.exif import parse_exif, synth_exif_jpeg


def test_exif_roundtrip_matches_oracle(spark, sf_dir):
    from danae_spark.multimodal.exif import image_exif_roundtrip, EXIF_ORACLE

    out = image_exif_roundtrip(spark, sf_dir)
    s_rows = [tuple(r) for r in out.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{table_path(sf_dir, 'documents')}'"
    )
    d_rows = [tuple(r) for r in con.execute(EXIF_ORACLE).fetchall()]
    con.close()
    assert s_rows == d_rows and len(s_rows) > 0
    # the grid exercises every leg: both endians, GPS, no-EXIF, malformed
    by_col = list(zip(*s_rows))
    assert {"II", "MM"} <= set(by_col[2])
    assert 0 in by_col[1] and 1 in by_col[1]
    assert any(v is not None and v < 0 for v in by_col[10])  # southern lat


def test_exif_both_endians_decode_identically():
    a, b = parse_exif(synth_exif_jpeg(10)), parse_exif(synth_exif_jpeg(11))
    assert a["endian"] == "II" and b["endian"] == "MM"
    for d in (22, 23):  # 20 is a no-EXIF (d%7==6) grid doc
        c = parse_exif(synth_exif_jpeg(d))
        g = exif._grid(d)
        assert (c["make"], c["model"], c["orientation"]) == (
            g["make"], g["model"], g["orientation"]
        )


def test_exif_gps_sign_conventions():
    # d=18: even -> N (positive), d%4=2 -> W (negative longitude)
    c = parse_exif(synth_exif_jpeg(18))
    assert c["has_gps"] == 1 and c["gps_lat"] > 0 and c["gps_lon"] < 0
    # d=15: odd -> S (negative), d%4=3 -> W
    c = parse_exif(synth_exif_jpeg(15))
    assert c["gps_lat"] <= 0 and c["gps_lon"] < 0


def test_exif_reject_whole_on_corruption():
    base = synth_exif_jpeg(0)  # II, GPS-bearing
    assert parse_exif(base)["has_gps"] == 1
    # truncating anywhere inside the APP1 never yields garbled metadata:
    # every prefix parses to None (reject) or a structurally earlier
    # verdict -- never an exception
    (seglen,) = struct.unpack_from(">H", base, 4)
    for cut in range(2, 2 + 2 + seglen):
        parse_exif(base[:cut])
    # zero rational denominator rejects
    bad = bytearray(base)
    pos = bad.find(struct.pack("<HHL", 0x0002, 5, 3))  # GPS lat entry (II)
    assert pos > 0
    (voff,) = struct.unpack_from("<L", bad, pos + 8)
    tiff_base = 2 + 4 + 6  # SOI + APP1 marker/len + Exif\0\0
    struct.pack_into("<L", bad, tiff_base + voff + 4, 0)  # first denominator
    assert parse_exif(bytes(bad)) is None
    # bad TIFF byte-order mark rejects
    bad = bytearray(base)
    bad[tiff_base : tiff_base + 2] = b"XX"
    assert parse_exif(bytes(bad)) is None
    # non-JPEG payload
    assert parse_exif(b"not a jpeg at all") is None


def test_exif_pointer_cycle_terminates():
    # hand-build a TIFF whose IFD0 Exif pointer points back at IFD0
    end = "<"
    ifd0_off = 8
    entry = struct.pack(end + "HHL", 0x8769, 4, 1) + struct.pack(end + "L", ifd0_off)
    ifd0 = struct.pack(end + "H", 1) + entry + struct.pack(end + "L", 0)
    tiff = b"II" + struct.pack(end + "HL", 42, ifd0_off) + ifd0
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    jpeg = b"\xff\xd8" + app1 + b"\xff\xd9"
    assert parse_exif(jpeg) is None  # cycle detected, not a hang


def test_exif_frame_over_binary_column(spark):
    rows = [(d, synth_exif_jpeg(d)) for d in range(12)] + [(99, None), (98, b"junk")]
    df = spark.createDataFrame(rows, "img_id long, payload binary")
    out = {r["img_id"]: r for r in exif.exif_frame(df, id_col="img_id").collect()}
    assert len(out) == 14
    assert out[0]["has_exif"] == 1 and out[0]["has_gps"] == 1
    assert out[6]["has_exif"] == 0  # d%7==6: no EXIF
    assert out[99]["has_exif"] == 0 and out[98]["has_exif"] == 0
    # the carrier is still a DECODABLE real JPEG
    from danae_spark.multimodal.jpegcodec import decode_jpeg

    assert decode_jpeg(synth_exif_jpeg(5)) is not None


@pytest.mark.parametrize("seed", range(4))
def test_exif_fuzz_bitflips_never_crash(seed):
    import random

    rng = random.Random(seed)
    base = bytearray(synth_exif_jpeg(seed * 3))
    for _ in range(200):
        b = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        parse_exif(bytes(b))  # any verdict, never an exception


def test_corpus_pii_report_matches_oracle_and_all_actions(spark, sf_dir):
    from danae_spark.operators import pii

    out = pii.corpus_pii_report(spark, sf_dir)
    s_rows = [tuple(r) for r in out.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{table_path(sf_dir, 'documents')}'"
    )
    d_rows = [tuple(r) for r in con.execute(pii.corpus_pii_report_oracle()).fetchall()]
    con.close()
    assert s_rows == d_rows and len(s_rows) > 0
    actions = {r[4] for r in s_rows}
    assert actions == {"publish", "redact_text", "strip_exif", "redact_and_strip"}
    for doc_id, n_pii, _rl, has_gps, action in s_rows:
        assert action == {
            (True, True): "redact_and_strip",
            (True, False): "redact_text",
            (False, True): "strip_exif",
            (False, False): "publish",
        }[(n_pii > 0, has_gps == 1)]


def test_bare_tiff_payloads_decode():
    """r15: .tif files carry the IFD structure without a JPEG wrapper —
    parse_exif reads them directly (same walker, same typed-tag
    rejects)."""
    import struct

    import numpy as np

    from danae_spark.multimodal.exif import parse_exif, synth_exif_jpeg
    from danae_spark.multimodal.tiff import synth_tiff

    # a pixel TIFF has no EXIF tags: metadata dict with empty fields
    r = parse_exif(synth_tiff(np.arange(64).reshape(8, 8) % 256, "tiff_gray"))
    assert r is not None and r["has_gps"] == 0 and r["make"] is None

    # the APP1 TIFF block extracted from a synth JPEG, fed bare: the
    # full metadata (incl. the GPS PII signal) must match the JPEG path
    blob = synth_exif_jpeg(0)
    i = blob.find(b"Exif\x00\x00")
    seg = blob.rfind(b"\xff\xe1", 0, i)
    (seglen,) = struct.unpack_from(">H", blob, seg + 2)
    tiff = blob[seg + 4 + 6 : seg + 2 + seglen]
    bare = parse_exif(tiff)
    wrapped = parse_exif(blob)
    assert bare == wrapped and bare["has_gps"] == 1

    # truncated bare TIFF rejects
    assert parse_exif(tiff[:10]) is None


def test_webp_exif_chunk_routes_to_tiff_parse():
    """r16: a WebP's VP8X EXIF chunk (raw TIFF or with the Exif\\0\\0
    prefix) parses to the SAME metadata as the JPEG APP1 carrying the
    identical block; a WebP without EXIF is {} (recognized, empty)."""
    import struct as _struct

    import numpy as np

    from danae_spark.multimodal.exif import parse_exif, synth_exif_jpeg
    from danae_spark.multimodal.webp import (
        _gray_rgba,
        _riff,
        _vp8x_body,
        encode_vp8l,
    )

    d = 1  # carries EXIF (d%7 != 6), intact TIFF (d%13 != 12)
    jpeg = synth_exif_jpeg(d)
    want = parse_exif(jpeg)
    assert want and want.get("make")
    # lift the TIFF block out of the APP1 segment
    ix = jpeg.find(b"Exif\x00\x00")
    assert ix > 0
    (seglen,) = _struct.unpack_from(">H", jpeg, ix - 2)
    tiff = jpeg[ix + 6 : ix - 2 + seglen]
    img = encode_vp8l(_gray_rgba(np.zeros((8, 8), np.int64)), mode="sg")
    for blob in (tiff, b"Exif\x00\x00" + tiff):
        webp = _riff([(b"VP8X", _vp8x_body(0x08, 8, 8)), (b"VP8L", img),
                      (b"EXIF", blob)])
        assert parse_exif(webp) == want
    # no EXIF chunk: recognized container, no metadata
    plain = _riff([(b"VP8X", _vp8x_body(0, 8, 8)), (b"VP8L", img)])
    assert parse_exif(plain) == {}
    # corrupt TIFF block in the chunk: reject
    bad = _riff([(b"VP8X", _vp8x_body(0x08, 8, 8)), (b"VP8L", img),
                 (b"EXIF", tiff[: 6])])
    assert parse_exif(bad) is None
    # lying RIFF size: reject
    lying = plain[:4] + _struct.pack("<I", len(plain) + 64) + plain[8:]
    assert parse_exif(lying) is None
