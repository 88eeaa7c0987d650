"""tokenizer.json census (multimodal/tokenizerjson.py)."""

import json

import pytest

from danae_spark.multimodal.tokenizerjson import (
    parse_tokenizer_json,
    synth_tokenizer_json,
)


def _expect(d: int):
    if d % 17 == 13 or d % 13 == 11:
        return None
    mtype = ["BPE", "WordPiece", "Unigram"][d % 3]
    if mtype == "BPE" and d % 23 == 21:
        return None
    b = 30 + d % 10
    na = 1 + d % 4
    return {
        "model_type": mtype,
        "vocab_size": b + (10 + d % 7 if mtype == "BPE" else 0),
        "n_merges": (10 + d % 7) if mtype == "BPE" else None,
        "n_added_tokens": na,
        "n_special_tokens": (na + 1) // 2,
        "has_normalizer": d % 2 == 0,
        "has_unk": True if mtype == "Unigram" else d % 5 != 1,
    }


def test_grid_matches_arithmetic():
    rejects = 0
    for d in range(300):
        got = parse_tokenizer_json(synth_tokenizer_json(d))
        assert got == _expect(d), d
        rejects += got is None
    assert rejects > 20


def _tok(model: dict, **extra) -> bytes:
    return json.dumps({"model": model, **extra}).encode()


def test_loader_validation():
    # pair-form BPE merges are accepted too
    good = _tok({"type": "BPE", "vocab": {"a": 0, "b": 1, "ab": 2},
                 "merges": [["a", "b"]]})
    assert parse_tokenizer_json(good)["n_merges"] == 1
    # dangling merge parts / missing concat reject
    for merges in ([["a", "z"]], [["a", "b", "c"]], ["a b c"], [7]):
        bad = _tok({"type": "BPE", "vocab": {"a": 0, "b": 1, "ab": 2},
                    "merges": merges})
        assert parse_tokenizer_json(bad) is None, merges
    # duplicate ids alias two tokens
    dup = _tok({"type": "WordPiece", "vocab": {"a": 0, "b": 0}})
    assert parse_tokenizer_json(dup) is None
    # Unigram vocab must be typed pairs; duplicate pieces reject
    assert parse_tokenizer_json(
        _tok({"type": "Unigram", "vocab": [["a", -1.0], ["a", -2.0]]})
    ) is None
    assert parse_tokenizer_json(
        _tok({"type": "Unigram", "vocab": [["a", "oops"]]})
    ) is None
    # unknown algorithm / missing model / foreign JSON
    assert parse_tokenizer_json(_tok({"type": "Magic", "vocab": {}})) is None
    assert parse_tokenizer_json(b'{"version": "1.0"}') is None
    assert parse_tokenizer_json(b"[1, 2, 3]") is None
    assert parse_tokenizer_json(b"not json") is None
    # malformed added_tokens reject
    assert parse_tokenizer_json(
        _tok({"type": "WordPiece", "vocab": {"a": 0}}, added_tokens=[{"id": 1}])
    ) is None


def test_frame_api_and_plan(spark):
    from danae_spark.multimodal.tokenizerjson import tokenizer_census_frame

    df = spark.createDataFrame(
        [(0, bytearray(synth_tokenizer_json(0))), (1, None)],
        "doc_id long, payload binary",
    )
    out = tokenizer_census_frame(df)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[0]["model_type"] == "BPE" and got[1]["model_type"] is None
