"""Quantitative quality floor for the approximate ANN paths."""

from __future__ import annotations

from danae_spark.operators import ann


def test_ann_recall_beats_chance(spark, sf_dir):
    """The testdata embeddings are near-random, so absolute recall@5 is
    modest by construction (no cluster structure for buckets to exploit);
    the meaningful invariant is recall FAR above random selection, which
    at k=5 over ~N candidates is ~k/N (<1%). Measured at sf0.001:
    lsh≈0.13, ivf≈0.25 — 25-50x chance."""
    from danae_spark.catalog import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    chance = ann.TOP_K / max(n - 1, 1)
    rows = {r["method"]: r["recall_at_k"] for r in ann.ann_recall(spark, sf_dir).collect()}
    assert set(rows) == {"lsh", "ivf"}
    for method, recall in rows.items():
        assert recall >= 10 * chance, (method, recall, chance)


def test_ivf_budgeted_stride_caps_codebook():
    """√N codebook must stay under the collect/broadcast budget at any
    (N, dim): ~10⁹ vectors at dim=768 would collect ~200 MB un-capped."""
    from danae_spark.operators.ann import (
        IVF_CODEBOOK_BUDGET_BYTES,
        _ivf_budgeted_stride,
        _ivf_stride,
    )

    # small data: budget never binds, pure √N (oracle parity)
    for n in (100, 10_000, 1_000_000):
        assert _ivf_budgeted_stride(n, 64) == _ivf_stride(n)
    # big N × wide dim: capped
    n, dim = 10**9, 768
    stride = _ivf_budgeted_stride(n, dim)
    assert stride > _ivf_stride(n)
    assert (n // stride) * dim * 8 <= IVF_CODEBOOK_BUDGET_BYTES


def test_ivf_small_n_returns_rows(spark, tmp_path):
    """N < 64 → stride <= 7: the old `vec_id % stride == 7` filter
    selected no centroids and np.stack([]) raised. Now the offset is
    7 % stride and small tables work end-to-end."""
    import pyspark.sql.functions as F

    from danae_spark.operators.ann import ann_ivf

    d = str(tmp_path / "lake")
    (
        spark.range(30)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(8)),
                lambda i: (F.hash(F.col("id") * i) % 1000).cast("float") / 1000.0,
            ).alias("embedding"),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/embeddings.parquet")
    )
    out = ann_ivf(spark, d)
    assert out.count() > 0


def test_ivf_trained_recall_at_least_stride(spark, sf_dir):
    """Lloyd-trained codebook must not lose recall vs the stride
    quantizer on the near-uniform testdata (on skewed data it wins on
    list balance — test below)."""
    rows = {
        r["method"]: r["recall_at_k"]
        for r in ann.ann_recall(spark, sf_dir, include_trained=True).collect()
    }
    assert set(rows) == {"lsh", "ivf", "ivf_trained"}
    assert rows["ivf_trained"] >= rows["ivf"] - 1e-9, rows


def test_ivf_trained_balances_skewed_lists(spark, tmp_path):
    """On a clustered (skewed) embedding distribution the stride
    quantizer produces hot inverted lists; the trained codebook's
    max-list-size must be materially smaller."""
    import numpy as np

    from danae_spark.operators.ann import (
        _ivf_budgeted_stride,
        train_ivf_codebook,
    )

    # 400 vectors in 4 tight clusters of very unequal size (300/60/30/10)
    rng_rows = []
    centers = {
        0: [1.0, 0.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0], 3: [0.0, 0.0, 0.0, 1.0],
    }
    sizes = [300, 60, 30, 10]
    vid = 0
    for c, size in enumerate(sizes):
        for j in range(size):
            eps = [((vid * 7 + i * 13) % 100) / 2000.0 for i in range(4)]
            rng_rows.append((vid, [centers[c][i] + eps[i] for i in range(4)]))
            vid += 1
    emb = spark.createDataFrame(rng_rows, "vec_id long, embedding array<float>")

    def list_sizes(cent_mat):
        X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()])
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        Cn = cent_mat / np.linalg.norm(cent_mat, axis=1, keepdims=True)
        assign = np.argmax(Xn @ Cn.T, axis=1)
        return np.bincount(assign, minlength=len(cent_mat))

    n, dim = 400, 4
    stride = _ivf_budgeted_stride(n, dim)
    stride_rows = sorted(rng_rows)[:: stride][: n // stride]
    stride_mat = np.stack([np.asarray(v, dtype=np.float64) for _i, v in stride_rows])
    _ids, trained_mat = train_ivf_codebook(emb, n_centroids=len(stride_mat))

    hot_stride = list_sizes(stride_mat).max()
    hot_trained = list_sizes(trained_mat).max()
    assert hot_trained <= hot_stride
    # trained lists must be meaningfully flatter than the hot stride list
    assert hot_trained < 0.8 * hot_stride, (hot_trained, hot_stride)


def test_ivf_trained_recall_on_driver_scale_lake(spark):
    """Same invariant as above but at sf0.01 — the scale the external
    correctness gate sweeps — and through the REGISTERED query entries,
    so a codebook regression on the driver's own path can't hide behind
    the smaller test lake. Trained IVF must match-or-beat the stride
    codebook vs exact brute-force truth, and beat chance by 10x."""
    import os

    import pytest

    sf01 = "/root/testdata/sf0.01"
    if not os.path.isdir(sf01):
        pytest.skip("sf0.01 lake not present")
    from danae_spark.catalog import load_table

    n = load_table(spark, sf01, "embeddings").count()
    chance = ann.TOP_K / max(n - 1, 1)
    rows = {
        r["method"]: r["recall_at_k"]
        for r in ann.ann_recall(spark, sf01, include_trained=True).collect()
    }
    assert rows["ivf_trained"] >= rows["ivf"] - 1e-9, rows
    assert rows["ivf_trained"] >= 10 * chance, (rows, chance)


def test_recall_report_floors_all_families(spark, sf_dir):
    """THE unified ANN quality gate (r7): one frame, five approximate
    families, each with a recall floor and a pruning sanity bound. A
    regression in any ANN path — plane count, codebook, nprobe, PQ
    codes — fails here loudly instead of in scattered checks."""
    from danae_spark.operators.ann import recall_report

    rows = {r.method: r for r in recall_report(spark, sf_dir).collect()}
    assert set(rows) == {
        "brute", "lsh", "ivf", "ivf_trained", "ivf_incremental", "pq", "ivfpq",
    }
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    chance = ann.TOP_K / (n - 1)

    assert rows["brute"].recall_at_k == 1.0
    assert rows["brute"].candidate_fraction == 1.0
    # floors mirror the per-family tests' calibration on the
    # near-random lake embeddings (ANN's worst case)
    assert rows["lsh"].recall_at_k >= 10 * chance
    assert rows["ivf"].recall_at_k >= 10 * chance
    assert rows["ivf_trained"].recall_at_k >= rows["ivf"].recall_at_k - 1e-9
    # recall-parity bound for the frozen-codebook incremental index:
    # staleness may cost a little vs retrain, never collapse
    assert rows["ivf_incremental"].recall_at_k >= 10 * chance
    assert rows["ivf_incremental"].recall_at_k >= rows["ivf"].recall_at_k - 0.15
    assert rows["pq"].recall_at_k >= max(20 * chance, 0.15)
    assert rows["ivfpq"].recall_at_k >= 10 * chance
    # pruning families must actually prune; PQ scans all codes by design
    for m in ("lsh", "ivf", "ivf_trained", "ivf_incremental", "ivfpq"):
        assert 0 < rows[m].candidate_fraction <= 0.25, m
    assert rows["pq"].candidate_fraction == 1.0
