"""r16 robustness fixes (ADVICE r15): AVI nested-LIST recursion,
zlib bomb guards capped BEFORE expansion (orc/avro), GIF pixels*frames
work budget, triage oracle generated from the Python rotation."""

from __future__ import annotations

import struct
import zlib

import pytest

from danae_spark.multimodal import avroblob, gifanim, orcblob
from danae_spark.multimodal.avi import parse_avi_mjpeg
from danae_spark.multimodal.avroblob import parse_avro_blob
from danae_spark.multimodal.gifanim import parse_gif_frames
from danae_spark.multimodal.orcblob import _Bad, _orc_decompress


# ------------------------------------------------------------- AVI


def test_avi_nested_list_tower_rejects_whole():
    """A ~36KB tower of nested LIST chunks must reject (None), not
    escape as an uncaught RecursionError from the Spark task."""
    blob = b"LIST" + struct.pack("<I", 4) + b"mov0"
    for _ in range(3000):
        inner = blob
        blob = b"LIST" + struct.pack("<I", 8 + len(inner)) + b"rec " + inner
    payload = b"RIFF" + struct.pack("<I", 4 + len(blob)) + b"AVI " + blob
    assert parse_avi_mjpeg(payload) is None


def test_avi_shallow_lists_still_parse():
    from danae_spark.multimodal.avi import synth_mjpeg_avi

    assert parse_avi_mjpeg(synth_mjpeg_avi(3)) is not None


# ------------------------------------------------------- zlib bombs


def _deflate(raw: bytes) -> bytes:
    c = zlib.compressobj(9, zlib.DEFLATED, -15)
    return c.compress(raw) + c.flush()


def test_orc_deflate_bomb_rejects_under_budget(monkeypatch):
    """A small DEFLATE chunk expanding past the budget must reject via
    the capped decompressobj path — never materialize first."""
    monkeypatch.setattr(orcblob, "_MAX_DECODED", 1 << 16)
    bomb = _deflate(b"\x00" * (1 << 20))  # ~1KB wire, 1MB decoded
    framed = int.to_bytes(len(bomb) << 1, 3, "little") + bomb
    with pytest.raises(_Bad):
        _orc_decompress(framed, 1)


def test_orc_deflate_small_chunk_roundtrips():
    raw = b"orc census payload " * 40
    comp = _deflate(raw)
    framed = int.to_bytes(len(comp) << 1, 3, "little") + comp
    assert _orc_decompress(framed, 1) == raw


def _zz_varint(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_container(codec: bytes, block_raw: bytes, n_records: int = 1) -> bytes:
    sync = bytes(range(16))
    meta = _zz_varint(2)
    for k, v in ((b"avro.schema", b'"bytes"'), (b"avro.codec", codec)):
        meta += _zz_varint(len(k)) + k + _zz_varint(len(v)) + v
    meta += _zz_varint(0)
    block = _zz_varint(n_records) + _zz_varint(len(block_raw)) + block_raw + sync
    return b"Obj\x01" + meta + sync + block


def test_avro_deflate_bomb_rejects_under_budget(monkeypatch):
    monkeypatch.setattr(avroblob, "_MAX_PAYLOAD", 1 << 16)
    bomb = _deflate(b"\x00" * (1 << 20))
    assert parse_avro_blob(_avro_container(b"deflate", bomb)) is None


def test_avro_deflate_small_block_roundtrips():
    raw = b"avro rows " * 10
    r = parse_avro_blob(_avro_container(b"deflate", _deflate(raw)))
    assert r is not None
    assert r["total_payload"] == len(raw)
    assert r["codec"] == "deflate"


# ---------------------------------------------------- GIF work bomb


def _lzw_idx(idx: bytes) -> bytes:
    from danae_spark.multimodal.pixels import _lzw_encode

    data = _lzw_encode(idx, 8)
    out = bytearray([8])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def test_gif_pixels_times_frames_budget(monkeypatch):
    """Many 1-pixel frames on a big canvas: the pixels*frames product
    guard must reject before scanning gigapixels of canvas."""
    monkeypatch.setattr(gifanim, "_MAX_WORK", 1 << 20)
    w = h = 1024  # one frame's canvas scan already exceeds 1<<20
    hdr = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
    gct = bytes(v for i in range(256) for v in (i, i, i))
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0) + _lzw_idx(b"\x05")
    assert parse_gif_frames(hdr + gct + img * 2 + b"\x3b") is None


def test_gif_small_anim_still_parses():
    from danae_spark.multimodal.gifanim import synth_gif_anim

    assert parse_gif_frames(synth_gif_anim(4)) is not None


# --------------------------------------------- triage oracle lockstep


def test_triage_oracle_case_tracks_rt_formats():
    """The image-format CASE in the triage oracle is generated from
    pixels._RT_FORMATS — one WHEN per rotation slot, modulus equal to
    the rotation length, so widening the rotation cannot drift."""
    from danae_spark.multimodal.pixels import _RT_FORMATS
    from danae_spark.multimodal.triage import MEDIA_TRIAGE_ORACLE

    assert "__IMAGE_FORMAT_CASE__" not in MEDIA_TRIAGE_ORACLE
    assert f"(b.doc_id // 10) % {len(_RT_FORMATS)}" in MEDIA_TRIAGE_ORACLE
    for i in range(len(_RT_FORMATS)):
        assert f"WHEN {i} THEN '" in MEDIA_TRIAGE_ORACLE


# ------------------------------------------- ORC column statistics (r16)


def test_orc_column_stats_from_tail():
    """File-level IntegerStatistics (zigzag sint64, incl. negatives)
    and the Metadata stripe-stats groups parse from the same tail read
    and cross-check consistent."""
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    from danae_spark.multimodal.orcblob import parse_orc_blob

    buf = io.BytesIO()
    orc.write_table(
        pa.table({"c0": pa.array([-7, 3, 42, -1, 0], pa.int64()),
                  "c1": pa.array(list("abcde"))}),
        buf, compression="ZLIB",
    )
    r = parse_orc_blob(buf.getvalue())
    assert r is not None
    assert (r["c0_min"], r["c0_max"], r["c0_sum"]) == (-7, 42, 37)
    assert r["has_null"] is False and r["n_stat_cols"] == 3
    assert r["n_stripe_stat_groups"] == r["n_stripes"] == 1
    assert r["stripe_stats_consistent"] is True


def test_orc_stats_null_column():
    import io

    import pyarrow as pa
    import pyarrow.orc as orc

    from danae_spark.multimodal.orcblob import parse_orc_blob

    buf = io.BytesIO()
    orc.write_table(
        pa.table({"c0": pa.array([1, None, 5], pa.int64())}), buf,
        compression="UNCOMPRESSED",
    )
    r = parse_orc_blob(buf.getvalue())
    assert r["has_null"] is True and (r["c0_min"], r["c0_max"]) == (1, 5)


def test_parquet_column_stats_from_footer():
    """Parquet per-row-group statistics aggregate to file min/max and
    null counts — incl. negatives and a null-bearing column."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from danae_spark.multimodal.parquetblob import parse_parquet_blob

    buf = io.BytesIO()
    pq.write_table(
        pa.table({"c0": pa.array([-9, 4, None, 77, -2], pa.int64())}),
        buf, row_group_size=2,
    )
    r = parse_parquet_blob(buf.getvalue())
    assert (r["c0_min"], r["c0_max"], r["c0_nulls"]) == (-9, 77, 1)
    assert r["stats_groups"] == r["n_row_groups"] == 3
