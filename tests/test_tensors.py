"""Tensor-container censuses (multimodal/tensors.py)."""

import json
import struct

import pytest

from danae_spark.multimodal.tensors import (
    _DTYPE_BYTES,
    _parse_np_any,
    _synth_np,
    npy_dtype,
    parse_npy,
    parse_npz,
    parse_safetensors,
    st_n_tensors,
    st_tensor,
    synth_npy,
    synth_npz,
    synth_safetensors,
)


def _st_expect(d: int):
    if d % 17 == 3 or d % 13 == 6 or d % 23 == 9:
        return None
    total = nbytes = 0
    dts = set()
    for j in range(st_n_tensors(d)):
        dt, r, c = st_tensor(d, j)
        total += r * c
        nbytes += r * c * _DTYPE_BYTES[dt]
        dts.add(dt)
    return {
        "n_tensors": st_n_tensors(d),
        "total_params": total,
        "data_bytes": nbytes,
        "dtypes": "/".join(sorted(dts)),
        "n_metadata": (1 + d % 2) if d % 5 == 2 else 0,
    }


def _np_expect(d: int):
    if d % 19 == 7 or d % 29 == 11:
        return None
    es = {0: 4, 1: 8, 2: 1}
    if d % 2 == 0:
        n = (3 + d % 4) * (2 + d % 3)
        return {"container": "npy", "n_arrays": 1, "total_elements": n,
                "total_bytes": n * es[d % 3], "dtypes": npy_dtype(d),
                "max_ndim": 2}
    els = bts = 0
    dts = set()
    for j in range(1 + d % 3):
        n = (2 + (d + j) % 3) * (1 + j)
        els += n
        bts += n * es[(d + j) % 3]
        dts.add(npy_dtype(d + j))
    return {"container": "npz", "n_arrays": 1 + d % 3,
            "total_elements": els, "total_bytes": bts,
            "dtypes": "/".join(sorted(dts)), "max_ndim": 2}


def test_grids_match_arithmetic():
    st_rejects = np_rejects = 0
    for d in range(300):
        g1 = parse_safetensors(synth_safetensors(d))
        assert g1 == _st_expect(d), d
        st_rejects += g1 is None
        g2 = _parse_np_any(_synth_np(d))
        assert g2 == _np_expect(d), d
        np_rejects += g2 is None
    assert st_rejects > 10 and np_rejects > 10


def _st_build(header: dict, buf_len: int) -> bytes:
    h = json.dumps(header).encode()
    return struct.pack("<Q", len(h)) + h + bytes(buf_len)


def test_safetensors_layout_validation():
    good = {"a": {"dtype": "F32", "shape": [2, 3],
                  "data_offsets": [0, 24]},
            "b": {"dtype": "I8", "shape": [4], "data_offsets": [24, 28]}}
    assert parse_safetensors(_st_build(good, 28))["total_params"] == 10
    # unordered header keys still validate (spans are sorted)
    flipped = {"b": good["b"], "a": good["a"]}
    assert parse_safetensors(_st_build(flipped, 28)) is not None
    # a gap, an overlap, an overhang, a span lie, a bad dtype — reject
    for hdr, blen in (
        ({"a": {"dtype": "F32", "shape": [2], "data_offsets": [4, 12]}}, 12),
        ({"a": {"dtype": "F32", "shape": [2], "data_offsets": [0, 8]},
          "b": {"dtype": "F32", "shape": [2], "data_offsets": [4, 12]}}, 12),
        ({"a": {"dtype": "F32", "shape": [2], "data_offsets": [0, 8]}}, 20),
        ({"a": {"dtype": "F32", "shape": [3], "data_offsets": [0, 8]}}, 8),
        ({"a": {"dtype": "F99", "shape": [2], "data_offsets": [0, 8]}}, 8),
    ):
        assert parse_safetensors(_st_build(hdr, blen)) is None, hdr
    # scalar tensor (shape []) is 1 param
    one = {"s": {"dtype": "F64", "shape": [], "data_offsets": [0, 8]}}
    assert parse_safetensors(_st_build(one, 8))["total_params"] == 1
    # metadata must be str -> str
    bad_meta = {"__metadata__": {"k": 3},
                "s": {"dtype": "U8", "shape": [1], "data_offsets": [0, 1]}}
    assert parse_safetensors(_st_build(bad_meta, 1)) is None
    # empty file (zero tensors, zero buffer) is valid
    assert parse_safetensors(_st_build({}, 0))["n_tensors"] == 0
    # header length past the payload
    assert parse_safetensors(struct.pack("<Q", 500) + b"{}") is None
    assert parse_safetensors(b"") is None


def test_npy_forms_and_rejects():
    import numpy as np

    # v1 and v2 headers both parse; data length is validated
    r = parse_npy(synth_npy(0))
    assert (r["dtype"], r["ndim"]) == ("f4", 2)
    r = parse_npy(synth_npy(8))  # 8 % 7 == 1 -> v2 header
    assert r["npy_version"] == 2
    # fortran order is surfaced, not rejected
    buf = synth_npy(0).replace(b"'fortran_order': False", b"'fortran_order': True ")
    assert parse_npy(buf)["fortran_order"] is True
    # structured dtypes are not a census subject
    rec = synth_npy(0).replace(b"'descr': '<f4'", b"'descr': 'O8  '")
    assert parse_npy(rec) is None
    assert parse_npy(b"\x93NUMPY") is None
    assert parse_npy(b"not numpy at all") is None


def test_npz_member_contract():
    # every member must be a valid .npy
    got = parse_npz(synth_npz(1))
    assert got["n_arrays"] == 2  # 1 + 1 % 3
    assert parse_npz(synth_npz(7)) is None  # stray notes.txt member
    assert parse_npz(b"PK\x03\x04 garbage") is None


def test_frame_apis_and_plans(spark):
    from danae_spark.multimodal.tensors import (
        npy_census_frame,
        safetensors_census_frame,
    )

    df = spark.createDataFrame(
        [(0, bytearray(synth_safetensors(0))), (1, None)],
        "doc_id long, payload binary",
    )
    out = safetensors_census_frame(df)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[0]["n_tensors"] == 1 and got[1]["n_tensors"] is None

    df2 = spark.createDataFrame(
        [(0, bytearray(synth_npy(0))), (1, bytearray(synth_npz(1)))],
        "doc_id long, payload binary",
    )
    out2 = npy_census_frame(df2)
    got2 = {r["doc_id"]: r.asDict() for r in out2.collect()}
    assert got2[0]["container"] == "npy" and got2[1]["container"] == "npz"


def test_arrow_census_grid_and_frames(spark):
    from danae_spark.multimodal.tensors import (
        arrow_census_frame,
        parse_arrow_blob,
        synth_arrow,
    )

    for d in range(100):
        got = parse_arrow_blob(synth_arrow(d))
        if d % 21 == 11:
            assert got is None
            continue
        n, step = 10 + d % 7, 4 + d % 3
        assert got == {
            "format": "file" if d % 2 == 0 else "stream",
            "n_batches": -(-n // step),
            "n_rows": n,
            "n_cols": 2 + d % 2,
            "columns": "c0/c1" if d % 2 == 0 else "c0/c1/c2",
        }, d
    assert parse_arrow_blob(b"not arrow bytes") is None
    assert parse_arrow_blob(b"ARROW1\x00\x00 truncated") is None

    df = spark.createDataFrame(
        [(0, bytearray(synth_arrow(0))), (1, bytearray(synth_arrow(1))),
         (2, None)],
        "doc_id long, payload binary",
    )
    out = arrow_census_frame(df)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[0]["format"] == "file" and got[1]["format"] == "stream"
    assert got[2]["format"] is None


def test_gguf_grid_and_semantics(spark):
    from danae_spark.multimodal.tensors import (
        _GGML_NAMES,
        _GGML_TYPES,
        gguf_arch,
        gguf_census_frame,
        parse_gguf,
        synth_gguf,
    )

    def expect(d):
        if d % 13 == 9 or d % 19 == 10 or d % 23 == 15:
            return None
        params = used = off = 0
        qt = set()
        for t in range(1 + d % 4):
            n = 32 * (1 + d % 3) * (1 + (d + t) % 4)
            ttype = [0, 1, 8, 2][(d + t) % 4]
            blk, bb = _GGML_TYPES[ttype]
            params += n
            qt.add(_GGML_NAMES[ttype])
            nb = n // blk * bb
            used = off + nb
            off = (off + nb + 31) // 32 * 32
        return {"version": 3, "n_tensors": 1 + d % 4, "n_kv": 3 + d % 2,
                "total_params": params, "data_bytes": used,
                "architecture": gguf_arch(d),
                "quant_types": "/".join(sorted(qt))}

    rejects = 0
    for d in range(200):
        got = parse_gguf(synth_gguf(d))
        assert got == expect(d), d
        rejects += got is None
    assert rejects > 10

    # identity and version gates
    assert parse_gguf(b"GGML old format") is None
    assert parse_gguf(b"") is None
    v1 = bytearray(synth_gguf(0))
    v1[4:8] = (1).to_bytes(4, "little")
    assert parse_gguf(bytes(v1)) is None  # v1 wire format refuses

    df = spark.createDataFrame(
        [(0, bytearray(synth_gguf(0))), (1, None)],
        "doc_id long, payload binary",
    )
    out = gguf_census_frame(df)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[0]["architecture"] == "llama" and got[1]["version"] is None


def test_blob_harvest_routes_tensor_containers():
    from danae_spark.multimodal.hudi import synth_hudi_table
    from danae_spark.multimodal.blobharvest import route_blob
    from danae_spark.multimodal.tensors import (
        synth_arrow,
        synth_gguf,
        synth_npy,
        synth_safetensors,
    )

    assert route_blob(synth_gguf(0)) == {"container": "gguf", "n_items": 1}
    got = route_blob(synth_npy(0))
    assert got["container"] == "npy" and got["n_items"] == 6  # (3+0%4)*(2+0%3)
    assert route_blob(synth_arrow(0))["container"] == "arrow"
    got = route_blob(synth_safetensors(0))
    assert got == {"container": "safetensors", "n_items": 1}
    # identity rule: claiming a magic but corrupt rejects whole,
    # never falls through to a text grammar
    assert route_blob(synth_gguf(9)) is None   # 9 % 13 == 9 misaligned
    assert route_blob(synth_safetensors(3)) is None  # 3 % 17 == 3 hlen lie
    # streaming twin knows the new kinds
    from danae_spark.streaming.census import _frames

    assert {"gguf", "hudi", "safetensors", "npy", "arrow"} <= set(_frames())
