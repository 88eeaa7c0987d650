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
