"""Incremental IVF index maintenance (operators/ann.py, r15).

The contract certified here (and by the ann_ivf_incremental DuckDB
oracle): with the codebook FROZEN on the base corpus, appending the
batch's O(batch·C) list assignments yields EXACTLY the index a
from-scratch build over the full corpus would produce under that same
codebook — so incremental maintenance never changes results, only the
retrain cadence does (and that drift is bounded in
test_ann_recall.py's ivf_incremental row).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from danae_spark.catalog import load_table
from danae_spark.operators import ann


def _frozen_codebook(base):
    n_base = base.count()
    first = base.select("embedding").head(1)
    dim = len(first[0].embedding)
    stride = ann._ivf_budgeted_stride(n_base, dim)
    rows = (
        base.filter((F.col("vec_id") % stride) == 7 % stride)
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    return ids, mat


def test_append_equals_from_scratch_under_frozen_codebook(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    ids, mat = _frozen_codebook(base)
    incremental = (
        ann.ivf_assign_lists(base, ids, mat)
        .unionByName(ann.ivf_assign_lists(batch, ids, mat))
        .select("cand_id", "centroid_id")
    )
    scratch = ann.ivf_assign_lists(emb, ids, mat).select("cand_id", "centroid_id")
    assert sorted(map(tuple, incremental.collect())) == sorted(
        map(tuple, scratch.collect())
    )


def test_registered_entry_matches_search_over_merged_lists(spark, sf_dir):
    out = ann.ann_ivf_incremental(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    # every query ranks exactly once per rank, ranks contiguous from 1
    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
    # batch members (vec_id % 5 == 4) are searchable: at least one
    # appears among all candidates at test scale
    assert any(r.cand_id % 5 == 4 for r in rows)


def test_index_persistence_roundtrip(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    ids, mat = _frozen_codebook(base)
    lists_base = ann.ivf_assign_lists(base, ids, mat)
    path = str(tmp_path / "ivf_index")
    ann.save_ivf_index(spark, path, ids, mat, lists_base)
    ids2, mat2, lists2 = ann.load_ivf_index(spark, path)
    assert (ids2 == ids).all()
    assert np.allclose(mat2, mat)
    # append a batch to the LOADED index and search: identical to the
    # in-session incremental result
    merged = lists2.unionByName(ann.ivf_assign_lists(batch, ids2, mat2))
    got = ann._ivf_search(spark, emb, ids2, mat2, ann.TOP_K, 2, lists=merged)
    want = ann.ann_ivf_incremental(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_batch_assignment_plan_is_narrow(spark, sf_dir):
    """The O(batch) append must stay shuffle-free: scan -> filter ->
    Arrow map, no Exchange in the assignment subplan."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    ids, mat = _frozen_codebook(emb.filter(F.col("vec_id") % 5 != 4))
    df = ann.ivf_assign_lists(batch, ids, mat)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pq_append_equals_from_scratch_under_frozen_codebook(spark, sf_dir):
    import numpy as np

    from danae_spark.operators import pq as P

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    n_base = base.count()
    dim = len(base.select("embedding").head(1)[0].embedding)
    m, kc = P.PQ_M, P.PQ_KC
    subdim = dim // m
    stride = max(1, n_base // kc)
    cent_rows = (
        base.filter((F.col("vec_id") % stride) == 7 % stride)
        .orderBy("vec_id")
        .limit(kc)
        .collect()
    )
    cents = P._pq_codebook(cent_rows, m, kc)
    half_sq = 0.5 * np.einsum("jmd,jmd->jm", cents, cents)
    incremental = (
        P._pq_encode_frame(base, m, subdim, cents, half_sq)
        .unionByName(P._pq_encode_frame(batch, m, subdim, cents, half_sq))
        .collect()
    )
    scratch = P._pq_encode_frame(emb, m, subdim, cents, half_sq).collect()
    assert sorted((r.cand_id, tuple(r.codes)) for r in incremental) == sorted(
        (r.cand_id, tuple(r.codes)) for r in scratch
    )


def test_pq_incremental_recall_does_not_collapse(spark, sf_dir):
    from danae_spark.catalog import load_table as lt
    from danae_spark.operators import pq as P

    n = lt(spark, sf_dir, "embeddings").count()
    chance = ann.TOP_K / max(n - 1, 1)
    truth: dict[int, set] = {}
    for r in ann.ann_cosine_topk(spark, sf_dir).collect():
        truth.setdefault(r.query_id, set()).add(r.cand_id)
    got: dict[int, set] = {}
    for r in P.pq_ann_incremental(spark, sf_dir).collect():
        got.setdefault(r.query_id, set()).add(r.cand_id)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    denom = sum(len(v) for v in truth.values())
    assert hits / denom >= 10 * chance
