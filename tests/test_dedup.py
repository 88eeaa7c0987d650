"""Dedup operator properties: the xxhash64 MinHash speed twin agrees
with the oracle-verified md5 variant wherever both generate a candidate,
and both are sound vs the exact n-gram Jaccard join."""

from __future__ import annotations

from danae_spark.operators import dedup


def _pairs(df):
    return {(r["d1"], r["d2"]): r["jaccard"] for r in df.collect()}


def test_minhash_xxhash_agrees_with_md5_and_exact(spark, sf_dir):
    exact = _pairs(dedup.dedup_ngram_jaccard(spark, sf_dir))
    md5 = _pairs(dedup.dedup_minhash_md5(spark, sf_dir))
    xx = _pairs(dedup.dedup_minhash_xxhash64(spark, sf_dir))

    # soundness: every LSH-verified pair is an exact-Jaccard pair with the
    # IDENTICAL verified value (verification is the same exact join)
    for pairs in (md5, xx):
        assert pairs, "LSH found no pairs at test SF"
        for k, j in pairs.items():
            assert k in exact and exact[k] == j, (k, j)

    # recall sanity: both hash families find the high-similarity mass
    strong = {k for k, j in exact.items() if j >= 0.5}
    assert strong <= set(md5) and strong <= set(xx)
