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
