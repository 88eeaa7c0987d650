"""TFRecord census (multimodal/tfrecord.py)."""

import struct

import pytest

from danae_spark.multimodal.tfrecord import (
    _example,
    crc32c,
    masked_crc,
    parse_tfrecord,
    synth_tfrecord,
)


def _expect(d: int):
    if d % 17 == 11 or d % 23 == 19 or d % 13 == 12:
        return None
    r_ = 2 + d % 4
    ln = len(str(d))
    score = sum((d + r) % 2 for r in range(r_))
    return {
        "n_records": r_,
        "total_data_bytes": sum(
            37 + ln + 18 * ((d + r) % 2) for r in range(r_)
        ),
        "n_features": 2 * r_ + score,
        "feature_keys": "label/score/text",
        "n_bytes_feats": r_,
        "n_float_feats": score,
        "n_int_feats": r_,
    }


def test_crc32c_vectors():
    # the canonical CRC32C check value and spot values
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA  # RFC 3720 test vector
    assert masked_crc(b"") == (((0 >> 15) | 0) + 0xA282EAD8) & 0xFFFFFFFF


def test_grid_matches_arithmetic():
    rejects = 0
    for d in range(300):
        got = parse_tfrecord(synth_tfrecord(d))
        assert got == _expect(d), d
        rejects += got is None
    assert rejects > 20


def test_framing_rejects_whole():
    good = synth_tfrecord(0)
    assert parse_tfrecord(good) is not None
    # flip one data byte: the data CRC catches it
    for off in (20, len(good) - 10):
        bad = bytearray(good)
        bad[off] ^= 0x01
        assert parse_tfrecord(bytes(bad)) is None, off
    # truncate mid-frame: torn tail
    assert parse_tfrecord(good[:-3]) is None
    # a frame whose length points past EOF
    lie = bytearray(good)
    lie[0:8] = struct.pack("<Q", 1 << 40)
    assert parse_tfrecord(bytes(lie)) is None
    # empty / tiny payloads
    assert parse_tfrecord(b"") is None
    assert parse_tfrecord(b"\x00" * 12) is None


def test_non_example_record_rejects():
    # valid framing around bytes the Example grammar cannot walk
    data = b"\xff\xff\xff\xff not a proto"
    lenb = struct.pack("<Q", len(data))
    rec = (lenb + struct.pack("<I", masked_crc(lenb))
           + data + struct.pack("<I", masked_crc(data)))
    assert parse_tfrecord(rec) is None


def test_frame_api_and_plan(spark):
    from danae_spark.multimodal.tfrecord import tfrecord_census_frame

    df = spark.createDataFrame(
        [(0, bytearray(synth_tfrecord(0))), (1, None)],
        "doc_id long, payload binary",
    )
    out = tfrecord_census_frame(df)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[0]["n_records"] == 2 and got[1]["n_records"] is None


def test_blob_harvest_routes_tfrecord():
    from danae_spark.multimodal.blobharvest import route_blob

    got = route_blob(synth_tfrecord(0))
    assert got == {"container": "tfrecord", "n_items": 2}
    # claiming the framing but corrupt rejects whole (d%17==11 leg)
    assert route_blob(synth_tfrecord(11)) is None
    # the d%10 rotation (csv .. cfb) is untouched by the new route
    from danae_spark.multimodal.blobharvest import synth_blob

    for d in range(10):
        r = route_blob(synth_blob(d))
        assert r is None or r["container"] != "tfrecord", d
