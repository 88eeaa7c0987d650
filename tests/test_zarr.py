"""Zarr v2 store census (multimodal/zarrblob.py)."""

import json
import zlib

import pytest

from danae_spark.multimodal.archive import _tar_build
from danae_spark.multimodal.zarrblob import (
    parse_zarr_store,
    synth_zarr_store,
)


def _expect(d: int):
    if d % 17 == 15 or d % 13 == 3 or d % 23 == 6:
        return None
    g = 1 + d % 2
    el = (8 + d % 5) * 6
    grid = (-(-(8 + d % 5) // 4)) * 2
    return {
        "n_arrays": g,
        "total_elements": el * g,
        "expected_chunks": grid * g,
        "present_chunks": grid * g - (1 if d % 7 == 3 else 0),
        "chunks_complete": d % 7 != 3,
        "dtypes": ["<f4", "<i8", "|u1"][d % 3],
        "codecs": "zlib" if d % 2 == 0 else "raw",
    }


def test_grid_matches_arithmetic():
    rejects = incomplete = 0
    for d in range(300):
        got = parse_zarr_store(synth_zarr_store(d))
        assert got == _expect(d), d
        if got is None:
            rejects += 1
        elif not got["chunks_complete"]:
            incomplete += 1
    assert rejects > 20 and incomplete > 10


def _store(meta: dict, chunks: dict) -> bytes:
    entries = [("a/", None), ("a/.zarray", json.dumps(meta).encode())]
    entries += [(f"a/{k}", v) for k, v in chunks.items()]
    return _tar_build(entries)


def _meta(**over) -> dict:
    base = {"zarr_format": 2, "shape": [4, 3], "chunks": [4, 3],
            "dtype": "|u1", "compressor": None, "fill_value": 0,
            "order": "C", "filters": None}
    base.update(over)
    return base


def test_layout_validation():
    # a single full raw chunk
    got = parse_zarr_store(_store(_meta(), {"0.0": bytes(12)}))
    assert got["present_chunks"] == 1 and got["chunks_complete"]
    # a chunk OUTSIDE the grid rejects (a lying writer)
    assert parse_zarr_store(_store(_meta(), {"0.0": bytes(12),
                                             "5.0": bytes(12)})) is None
    # wrong rank in the chunk key rejects
    assert parse_zarr_store(_store(_meta(), {"0": bytes(12)})) is None
    # zlib chunk must decompress to the exact padded extent
    good = zlib.compress(bytes(12))
    short = zlib.compress(bytes(11))
    zmeta = _meta(compressor={"id": "zlib", "level": 1})
    assert parse_zarr_store(_store(zmeta, {"0.0": good}))["codecs"] == "zlib"
    assert parse_zarr_store(_store(zmeta, {"0.0": short})) is None
    assert parse_zarr_store(_store(zmeta, {"0.0": b"not deflate"})) is None
    # unknown codec / format version / object dtype / rank mismatch
    assert parse_zarr_store(
        _store(_meta(compressor={"id": "blosc"}), {})) is None
    assert parse_zarr_store(_store(_meta(zarr_format=3), {})) is None
    assert parse_zarr_store(_store(_meta(dtype="|O"), {})) is None
    assert parse_zarr_store(_store(_meta(chunks=[4]), {})) is None
    # .zattrs is metadata, never a chunk
    entries = [("a/", None), ("a/.zarray", json.dumps(_meta()).encode()),
               ("a/.zattrs", b"{}"), ("a/0.0", bytes(12))]
    assert parse_zarr_store(_tar_build(entries))["present_chunks"] == 1
    # no .zarray anywhere: not a zarr store
    assert parse_zarr_store(_tar_build([("x.txt", b"hi")])) is None
    assert parse_zarr_store(b"junk") is None


def test_frame_api_and_plan(spark):
    from danae_spark.multimodal.zarrblob import zarr_census_frame

    df = spark.createDataFrame(
        [(0, bytearray(synth_zarr_store(0))), (1, None)],
        "doc_id long, payload binary",
    )
    out = zarr_census_frame(df)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[0]["n_arrays"] == 1 and got[1]["n_arrays"] is None
