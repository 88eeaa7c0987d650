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
