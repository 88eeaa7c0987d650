"""Approximate nearest-neighbor search over embedding columns.

- `ann_cosine_topk`: brute-force cosine top-k — the correctness baseline.
  All vector math is JVM-side (`zip_with`/`aggregate`); the candidate set
  is a broadcast join, ranking is one window.
- `ann_lsh_bucketed`: random-hyperplane LSH — the 100 TB path. Each
  vector gets a bucket id from the sign pattern of H hyperplane
  projections; search is brute force *within* a bucket only, so pairwise
  work drops from O(N²) to O(Σ bucket²). Hyperplanes are derived from a
  fixed seed (deterministic across runs/engines); recall is tunable via
  H (fewer planes → bigger buckets → higher recall, more compute).
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from danae_spark.catalog import load_table, widen
from danae_spark.functions import vectors
from danae_spark.functions.rounding import rnd

N_QUERIES = 20  # vec_id < N_QUERIES are the query vectors
TOP_K = 5
N_PLANES = 4
DIM = 64
# hard cap on the collected+broadcast IVF codebook (C·dim·8 bytes)
IVF_CODEBOOK_BUDGET_BYTES = 100 * 1024 * 1024


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = TOP_K,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    cand_id: str = "vec_id",
    cand_vec: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Generic brute-force exact top-k cosine neighbors of each query
    among the candidates — the similarity-search baseline any ANN
    variant is measured against (tools/ann_recall).

    The QUERY side broadcasts (queries are the small side in retrieval;
    the candidate corpus streams partition-parallel, each task scoring
    its candidates against every query — no shuffle of the corpus).
    Set broadcast_queries=False only when the query set is itself huge,
    and prefer the LSH/IVF/quantized variants there instead."""
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(queries.sparkSession)
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("q_emb")
    )
    c = candidates.select(
        F.col(cand_id).alias("cand_id"), F.col(cand_vec).alias("c_emb")
    )
    if broadcast_queries:
        q = F.broadcast(q)
    cos = vectors.pair_cosine_udf()
    pairs = c.join(q, F.col("query_id") != F.col("cand_id")).withColumn(
        "cosine", rnd(cos("q_emb", "c_emb"), 6)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def ann_cosine_topk(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """Embeddings-table entry point of `cosine_topk` (first N_QUERIES
    vectors as the query set)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return cosine_topk(emb.filter(F.col("vec_id") < N_QUERIES), emb, k)


def ann_cosine_topk_oracle(k: int = TOP_K) -> str:
    cos = (
        "list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /"
        " (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *"
        "  sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))"
    )
    return f"""
    SELECT query_id, cand_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             floor(({cos}) * power(10, 6) + 0.5001) / power(10, 6) AS cosine,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY floor(({cos}) * power(10, 6) + 0.5001) / power(10, 6) DESC, c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ) WHERE rank <= {k}
    ORDER BY query_id, rank
    """


def _hyperplanes(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a fixed seed (sha256
    counter mode) — reproducible everywhere, no RNG state."""
    planes = []
    for p in range(n_planes):
        coeffs = []
        for i in range(dim):
            digest = hashlib.sha256(f"danae-lsh-{p}-{i}".encode()).digest()
            (v,) = struct.unpack(">q", digest[:8])
            coeffs.append((v % 2001 - 1000) / 1000.0)
        planes.append(coeffs)
    return planes


def lsh_bucket_col(emb_col: str, planes: list[list[float]]) -> F.Column:
    bucket = F.lit(0)
    for p, coeffs in enumerate(planes):
        plane = F.array(*[F.lit(c) for c in coeffs])
        proj = F.aggregate(
            F.zip_with(F.col(emb_col), plane, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def _ivf_stride(n: int) -> int:
    """stride = floor(sqrt(N)) → centroid count C ≈ √N (the standard IVF
    sizing: assignment work N·C = N^1.5, per-list scan N/C = √N)."""
    import math

    return max(1, int(math.floor(math.sqrt(n))))


def _ivf_budgeted_stride(n: int, dim: int) -> int:
    """√N stride, widened so the collected codebook (C·dim·8 bytes,
    C = N/stride) never exceeds IVF_CODEBOOK_BUDGET_BYTES. √N sizing is
    ~8 MB at N=10⁹ for dim=64 but ~200 MB at dim=768 — the cap keeps the
    driver collect + executor broadcast bounded at any (N, dim). Only
    binds beyond the oracle's test scale, so DuckDB parity holds."""
    import math

    stride = _ivf_stride(n)
    max_c = max(1, IVF_CODEBOOK_BUDGET_BYTES // (dim * 8))
    if n // stride > max_c:
        stride = math.ceil(n / max_c)
    return stride


def ivf_assign_lists(emb: DataFrame, cent_ids, cent_mat) -> DataFrame:
    """Inverted-list assignment against a driver-held codebook: ONE
    Arrow matmul per batch inside mapInPandas — O(rows·C) flops, no
    shuffle, no window. This is the O(batch) unit the incremental
    index maintenance appends with (`ann_ivf_incremental`). Ties and
    rounding reproduce the DuckDB oracle: cosines are rounded to 6dp
    before argmax, ties break to the smallest centroid_id."""
    import numpy as np
    import pandas as pd

    cent_norm = np.linalg.norm(cent_mat, axis=1)

    def assign_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            # dot/(|a|·|b|) in the same shape as pair_cosine_udf/the oracle
            dots = vecs @ cent_mat.T
            cos = dots / (np.linalg.norm(vecs, axis=1, keepdims=True) * cent_norm)
            cos6 = np.floor(cos * 1e6 + 0.5001) / 1e6
            best = np.argmax(cos6, axis=1)  # first max → smallest centroid_id
            yield pd.DataFrame(
                {
                    "cand_id": pdf["vec_id"].to_numpy(),
                    "centroid_id": cent_ids[best],
                    "c_emb": pdf["embedding"],
                }
            )

    return emb.mapInPandas(
        assign_batches, schema="cand_id long, centroid_id long, c_emb array<float>"
    )


def _ivf_search(
    spark: SparkSession,
    emb: DataFrame,
    cent_ids,
    cent_mat,
    k: int,
    nprobe: int,
    lists: DataFrame | None = None,
) -> DataFrame:
    """Shared IVF search over a driver-held codebook (ids + C×dim numpy
    matrix): broadcast-free Arrow matmul list assignment (or
    pre-maintained `lists` from the incremental path), nprobe centroid
    probes per query, in-list brute force."""
    if lists is None:
        lists = ivf_assign_lists(emb, cent_ids, cent_mat)

    centroids = spark.createDataFrame(
        [(int(cid), [float(x) for x in row]) for cid, row in zip(cent_ids, cent_mat)],
        "centroid_id long, c_emb array<float>",
    )

    # query-side: nprobe nearest centroids for the N_QUERIES query vectors —
    # a tiny crossJoin (20 × C) ranked per query
    cos = vectors.pair_cosine_udf()
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("c_cos"), F.asc("centroid_id"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("c_cos", rnd(cos("q_emb", "c_emb"), 6))
        .withColumn("c_rank", F.row_number().over(wq))
        .filter(F.col("c_rank") <= nprobe)
        .select("query_id", "q_emb", "centroid_id")
    )

    # each candidate lives in exactly one list and probe lists are distinct
    # centroids, so (query_id, cand_id) pairs are unique — no distinct()
    pairs = (
        probes.join(lists, "centroid_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cosine", rnd(cos("q_emb", "c_emb"), 6))
        .select("query_id", "cand_id", "cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ann_ivf(
    spark: SparkSession, sf_dir: str, k: int = TOP_K, nprobe: int = 2
) -> DataFrame:
    """IVF-style ANN: a deterministic coarse quantizer (every `stride`-th
    vector, stride = ⌊√N⌋) partitions vectors into C ≈ √N inverted lists;
    a query probes its `nprobe` nearest centroids' lists and brute-forces
    only those.

    100 TB shape (r1 rewrite — the old quantizer crossJoined every vector
    with C = N/100 centroids and ranked N²/100 window rows): the centroid
    codebook is a bounded √N-sized array (≈8 MB at N = 10⁹) broadcast to
    executors, and list assignment is ONE Arrow-batched matmul per batch
    inside mapInPandas — no N×C row materialization, no window, no
    shuffle beyond the final per-list aggregation. The stride quantizer
    is fully deterministic and oracle-checked; `ann_ivf_trained` is the
    list-balance upgrade for skewed real-world embedding distributions.
    """
    import numpy as np

    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_total = emb.count()  # parquet footer metadata, no scan
    first = emb.select("embedding").head(1)
    if not first:  # empty table → brute force degenerates to empty result
        return ann_cosine_topk(spark, sf_dir, k=k)
    dim = len(first[0].embedding)
    stride = _ivf_budgeted_stride(n_total, dim)
    # offset 7 matches nothing when stride <= 7 (vec_id % stride < stride);
    # 7 % stride always selects a real residue — mirrored in the oracle
    centroids = emb.filter((F.col("vec_id") % stride) == 7 % stride).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    cent_rows = centroids.orderBy("centroid_id").collect()  # C ≈ √N — bounded codebook
    if not cent_rows:  # degenerate residue set (can't happen post-fix; belt)
        return ann_cosine_topk(spark, sf_dir, k=k)
    cent_ids = np.array([r.centroid_id for r in cent_rows], dtype=np.int64)
    cent_mat = np.stack([np.asarray(r.c_emb, dtype=np.float64) for r in cent_rows])
    return _ivf_search(spark, emb, cent_ids, cent_mat, k, nprobe)


def ann_ivf_incremental(
    spark: SparkSession, sf_dir: str, k: int = TOP_K, nprobe: int = 2
) -> DataFrame:
    """INCREMENTAL IVF maintenance — the shape a continuously-ingesting
    vector store actually runs: the codebook is trained/derived ONCE on
    the existing corpus and FROZEN; each arriving batch is assigned to
    inverted lists with one O(batch·C) Arrow matmul and APPENDED — no
    corpus rescan, no retrain. Search over (base lists ∪ batch lists)
    is then EXACTLY the index built from scratch over the full corpus
    with the same frozen codebook — which is what the DuckDB oracle
    certifies (ann_ivf_incremental_oracle derives the codebook from the
    base partition only, assigns ALL rows against it, and reproduces
    the probe/top-k search).

    Codebook-staleness is the price of O(batch): recall against a full
    retrain is bounded by tests/test_ann_incremental.py through
    recall_report's `ivf_incremental` row (tools/ann_recall.py), the
    signal an operator watches to schedule retrains.

    Registered split: vec_id % 5 == 4 is the arriving batch,
    everything else is yesterday's corpus."""
    import numpy as np

    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    n_base = base.count()
    first = base.select("embedding").head(1)
    if not first:
        return ann_cosine_topk(spark, sf_dir, k=k)
    dim = len(first[0].embedding)
    stride = _ivf_budgeted_stride(n_base, dim)
    centroids = base.filter((F.col("vec_id") % stride) == 7 % stride).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    cent_rows = centroids.orderBy("centroid_id").collect()
    if not cent_rows:
        return ann_cosine_topk(spark, sf_dir, k=k)
    cent_ids = np.array([r.centroid_id for r in cent_rows], dtype=np.int64)
    cent_mat = np.stack([np.asarray(r.c_emb, dtype=np.float64) for r in cent_rows])
    lists_base = ivf_assign_lists(base, cent_ids, cent_mat)  # the stored index
    lists_batch = ivf_assign_lists(batch, cent_ids, cent_mat)  # O(batch) append
    lists = lists_base.unionByName(lists_batch)
    return _ivf_search(spark, emb, cent_ids, cent_mat, k, nprobe, lists=lists)


def ann_ivf_incremental_oracle(k: int = TOP_K, nprobe: int = 2) -> str:
    """DuckDB reproduction of the incremental index: the codebook comes
    from the BASE partition only (vec_id % 5 != 4), every row — base
    and batch — is assigned against that frozen codebook, and the
    search is the standard probe/top-k. Equality with the Spark side
    certifies that append-maintenance equals a from-scratch build under
    the same codebook."""
    return f"""
    WITH params AS (
      SELECT greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT)) AS stride
      FROM embeddings WHERE vec_id % 5 <> 4
    ),
    cents AS (
      SELECT vec_id AS centroid_id, embedding FROM embeddings, params
      WHERE vec_id % 5 <> 4 AND vec_id % stride = 7 % stride
    ),
    cand_assign AS (
      SELECT e.vec_id AS cand_id, c.centroid_id,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {_cos6_sql('e', 'c')} DESC, c.centroid_id) AS rk
      FROM embeddings e, cents c
    ),
    lists AS (SELECT cand_id, centroid_id FROM cand_assign WHERE rk = 1),
    probes AS (
      SELECT q.vec_id AS query_id, c.centroid_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {_cos6_sql('q', 'c')} DESC, c.centroid_id) AS rk
      FROM embeddings q, cents c WHERE q.vec_id < {N_QUERIES}
    ),
    pairs AS (
      SELECT p.query_id, l.cand_id, {_cos6_sql('qe', 'ce')} AS cosine
      FROM probes p
      JOIN lists l USING (centroid_id)
      JOIN embeddings qe ON qe.vec_id = p.query_id
      JOIN embeddings ce ON ce.vec_id = l.cand_id
      WHERE p.rk <= {nprobe} AND p.query_id <> l.cand_id
    )
    SELECT query_id, cand_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rank
      FROM pairs
    ) WHERE rank <= {k}
    ORDER BY query_id, rank
    """


def save_ivf_index(spark: SparkSession, path: str, cent_ids, cent_mat, lists: DataFrame) -> None:
    """Persist an IVF index (codebook + inverted lists) as parquet —
    the durable form the incremental pipeline appends to between runs.
    The codebook is a C-row table (bounded by IVF_CODEBOOK_BUDGET),
    the lists are the corpus-sized assignment table, partitioned by
    nothing here (a real deployment buckets by centroid_id so probes
    prune files)."""
    cb = spark.createDataFrame(
        [(int(cid), [float(x) for x in row]) for cid, row in zip(cent_ids, cent_mat)],
        "centroid_id long, c_emb array<float>",
    )
    cb.coalesce(1).write.mode("overwrite").parquet(path + "/codebook")
    lists.write.mode("overwrite").parquet(path + "/lists")


def load_ivf_index(spark: SparkSession, path: str):
    """Load a persisted IVF index: (cent_ids, cent_mat, lists)."""
    import numpy as np

    rows = spark.read.parquet(path + "/codebook").orderBy("centroid_id").collect()
    cent_ids = np.array([r.centroid_id for r in rows], dtype=np.int64)
    cent_mat = np.stack([np.asarray(r.c_emb, dtype=np.float64) for r in rows])
    lists = spark.read.parquet(path + "/lists")
    return cent_ids, cent_mat, lists


def train_ivf_codebook(
    emb: DataFrame,
    n_centroids: int | None = None,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Spherical-k-means codebook: a few Lloyd iterations over a
    deterministic hash-sampled subset of the vectors, run driver-side in
    numpy within the same IVF_CODEBOOK_BUDGET_BYTES collect budget.

    Why: the stride quantizer picks every √N-th VECTOR as a centroid —
    fine for near-uniform testdata, but on skewed real-world embedding
    distributions (language/domain clusters) it yields hot inverted
    lists and probe-latency cliffs. Lloyd pulls centroids toward density,
    evening list sizes, at the cost of a training pass.

    Determinism: the sample is xxhash64-residue selected (no RNG state),
    initialization is the sample's stride rows, and updates are exact
    means — identical output on any cluster size or run.

    Returns (cent_ids 0..C-1, cent_mat C×dim float64 numpy)."""
    import numpy as np

    n_total = emb.count()
    first = emb.select(vec_col).head(1)
    if not first:
        raise ValueError("train_ivf_codebook: empty embedding frame")
    dim = len(first[0][0])
    if n_centroids is None:
        n_centroids = max(1, n_total // _ivf_budgeted_stride(n_total, dim))
    sample_cap = max(n_centroids * 8, IVF_CODEBOOK_BUDGET_BYTES // (dim * 8))
    src = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    if n_total > sample_cap:
        m = max(1, n_total // sample_cap)
        src = src.filter(F.pmod(F.xxhash64("vec_id"), F.lit(m)) == 0)
    rows = src.orderBy("vec_id").collect()
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = min(n_centroids, len(X))
    stride = max(1, len(X) // C)
    cents = Xn[::stride][:C].copy()
    for _ in range(iters):
        assign = np.argmax(Xn @ cents.T, axis=1)  # cosine == dot on unit vectors
        for c in range(len(cents)):
            members = Xn[assign == c]
            if len(members):
                m_vec = members.mean(axis=0)
                n = np.linalg.norm(m_vec)
                if n > 1e-12:
                    cents[c] = m_vec / n
        # empty clusters keep their previous centroid (deterministic)
    return np.arange(len(cents), dtype=np.int64), cents


def ann_ivf_trained(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    nprobe: int = 2,
    iters: int = 4,
) -> DataFrame:
    """`ann_ivf` with a Lloyd-trained spherical-k-means codebook (see
    train_ivf_codebook) instead of the stride quantizer — the
    list-balance path for skewed embedding distributions. Same search
    plan; only the codebook differs. The stride variant stays the
    registered oracle entry (training is iterative numpy, not
    SQL-expressible)."""
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if not emb.head(1):
        return ann_cosine_topk(spark, sf_dir, k=k)
    cent_ids, cent_mat = train_ivf_codebook(emb, iters=iters)
    return _ivf_search(spark, emb, cent_ids, cent_mat, k, nprobe)


def _cos6_sql(a: str, b: str) -> str:
    cos = (
        f"list_dot_product({a}.embedding::DOUBLE[], {b}.embedding::DOUBLE[]) /"
        f" (sqrt(list_dot_product({a}.embedding::DOUBLE[], {a}.embedding::DOUBLE[])) *"
        f"  sqrt(list_dot_product({b}.embedding::DOUBLE[], {b}.embedding::DOUBLE[])))"
    )
    return f"floor(({cos}) * 1000000.0 + 0.5001) / 1000000.0"


def ann_ivf_oracle(k: int = TOP_K, nprobe: int = 2) -> str:
    """DuckDB reproduction of the full IVF pipeline (√N quantizer →
    inverted lists → probes → in-list top-k). stride = ⌊√N⌋ is computed
    from the data so the oracle tracks the Spark side at any SF."""
    return f"""
    WITH params AS (
      SELECT greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT)) AS stride
      FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS centroid_id, embedding FROM embeddings, params
      WHERE vec_id % stride = 7 % stride
    ),
    cand_assign AS (
      SELECT e.vec_id AS cand_id, c.centroid_id,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {_cos6_sql('e', 'c')} DESC, c.centroid_id) AS rk
      FROM embeddings e, cents c
    ),
    lists AS (SELECT cand_id, centroid_id FROM cand_assign WHERE rk = 1),
    probes AS (
      SELECT q.vec_id AS query_id, c.centroid_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {_cos6_sql('q', 'c')} DESC, c.centroid_id) AS rk
      FROM embeddings q, cents c WHERE q.vec_id < {N_QUERIES}
    ),
    pairs AS (
      SELECT p.query_id, l.cand_id, {_cos6_sql('qe', 'ce')} AS cosine
      FROM probes p
      JOIN lists l USING (centroid_id)
      JOIN embeddings qe ON qe.vec_id = p.query_id
      JOIN embeddings ce ON ce.vec_id = l.cand_id
      WHERE p.rk <= {nprobe} AND p.query_id <> l.cand_id
    )
    SELECT query_id, cand_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rank
      FROM pairs
    ) WHERE rank <= {k}
    ORDER BY query_id, rank
    """


def lsh_bucket_sql(alias: str = "e") -> str:
    """DuckDB expression computing the same hyperplane-LSH bucket id as
    `lsh_bucket_col` (fixed-seed planes inlined as literal arrays)."""
    planes = _hyperplanes()
    return " + ".join(
        f"(CASE WHEN list_dot_product({alias}.embedding::DOUBLE[],"
        f" {coeffs}::DOUBLE[]) >= 0 THEN {1 << p} ELSE 0 END)"
        for p, coeffs in enumerate(planes)
    )


def ann_lsh_oracle(k: int = TOP_K) -> str:
    """DuckDB reproduction of the hyperplane-LSH pipeline; the fixed-seed
    planes are inlined as literal arrays."""
    bucket_terms = lsh_bucket_sql("e")
    return f"""
    WITH buckets AS (
      SELECT e.vec_id, e.embedding, {bucket_terms} AS bucket FROM embeddings e
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, q.bucket, c.vec_id AS cand_id,
             {_cos6_sql('q', 'c')} AS cosine
      FROM buckets q JOIN buckets c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, bucket, cand_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rank
      FROM pairs
    ) WHERE rank <= {k}
    ORDER BY query_id, rank
    """


def lsh_candidate_pairs(
    q: DataFrame,
    c: DataFrame,
    planes: list,
    drop_self: bool = True,
) -> DataFrame:
    """Shared LSH candidate-pair pipeline: bucket each side with the
    SAME plane set, equi-join on the bucket id, score with the rounded
    Arrow cosine. Both the batch `ann_lsh_bucketed` and the streaming
    `ann_candidates_stream` route through here, so bucketing / rounding
    / self-pair semantics cannot drift apart. `drop_self=False` keeps
    id-equal pairs (an EXTERNAL query stream's ids share no space with
    the corpus — dropping collisions there silently loses candidates).

    Expects q(query_id, q_emb) and c(cand_id, c_emb); emits
    (query_id, cand_id, bucket, cosine)."""
    cos = vectors.pair_cosine_udf()
    qb = q.withColumn("bucket", lsh_bucket_col("q_emb", planes))
    cb = c.withColumn("bucket", lsh_bucket_col("c_emb", planes))
    pairs = qb.join(cb, "bucket")  # bucket equi-join: work stays in-bucket
    if drop_self:
        pairs = pairs.filter(F.col("query_id") != F.col("cand_id"))
    return pairs.withColumn("cosine", rnd(cos("q_emb", "c_emb"), 6)).select(
        "query_id", "cand_id", "bucket", "cosine"
    )


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """Top-k cosine neighbors restricted to the query's LSH bucket."""
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    planes = _hyperplanes()
    emb = widen(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    )
    pairs = lsh_candidate_pairs(q, c, planes)
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def ann_recall(
    spark: SparkSession, sf_dir: str, k: int = TOP_K, include_trained: bool = False
) -> DataFrame:
    """Recall@k of each approximate ANN path against the brute-force
    ground truth — the tuning signal for plane count / nprobe (run it
    after changing LSH/IVF parameters; at scale, on a sampled query set).
    One row per method with mean recall over the query vectors."""
    truth = ann_cosine_topk(spark, sf_dir, k=k).select(
        "query_id", F.col("cand_id").alias("true_id")
    )
    methods = [("lsh", ann_lsh_bucketed), ("ivf", ann_ivf)]
    if include_trained:
        methods.append(("ivf_trained", ann_ivf_trained))
    out = []
    for name, fn in methods:
        approx = fn(spark, sf_dir, k=k).select("query_id", "cand_id")
        hits = truth.join(
            approx,
            (truth.query_id == approx.query_id) & (truth.true_id == approx.cand_id),
            "left_semi",
        )
        per_q = (
            truth.groupBy("query_id").agg(F.count("*").alias("n_true"))
            .join(
                hits.groupBy("query_id").agg(F.count("*").alias("n_hit")),
                "query_id",
                "left",
            )
            .select(
                (F.coalesce("n_hit", F.lit(0)) / F.col("n_true")).alias("recall")
            )
        )
        out.append(
            per_q.agg(
                F.lit(name).alias("method"),
                F.round(F.avg("recall"), 4).alias("recall_at_k"),
                F.lit(k).alias("k"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.orderBy("method")


def recall_report(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """Unified ANN quality gate (r7): one frame covering every
    approximate family — hyperplane-LSH, stride-IVF, trained-IVF, PQ,
    IVF-PQ — with recall@k against the brute-force truth and the
    candidate fraction each method actually scores per query.

    candidate_fraction definitions (documented per family):
    - lsh: MEASURED — Σ_q |bucket(q)| / (n_queries · N), from the same
      bucket expression the operator uses;
    - ivf / ivf_trained / ivfpq: nprobe / n_lists — exact under the
      stride quantizer's balanced lists and the trained codebook's
      pytest-enforced balance;
    - pq: 1.0 — PQ compresses (8-bit codes, ADC) but scans every code;
      its win is bytes-per-candidate, not candidate count.

    A pytest (tests/test_ann_recall.py) asserts each family's floor
    through THIS frame, so a regression in any ANN path fails one
    loud gate instead of scattered checks."""
    from danae_spark.operators import pq as _pq

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_total = emb.count()
    first = emb.select("embedding").head(1)
    dim = len(first[0].embedding) if first else DIM
    nq = N_QUERIES

    truth_rows = ann_cosine_topk(spark, sf_dir, k=k).collect()
    truth: dict[int, set] = {}
    for r in truth_rows:
        truth.setdefault(r.query_id, set()).add(r.cand_id)

    def rec(rows) -> float:
        got: dict[int, set] = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.cand_id)
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        denom = sum(len(v) for v in truth.values())
        return round(hits / denom, 4) if denom else 0.0

    # measured LSH fraction: queries probe exactly their bucket
    planes = _hyperplanes()
    buckets = emb.withColumn("bucket", lsh_bucket_col("embedding", planes))
    bucket_sizes = buckets.groupBy("bucket").agg(F.count("*").alias("sz"))
    lsh_pairs = (
        buckets.filter(F.col("vec_id") < nq)
        .join(bucket_sizes, "bucket")
        .agg(F.sum("sz").alias("p"))
        .head()
        .p
    )
    lsh_frac = round(float(lsh_pairs) / (nq * n_total), 4) if n_total else None

    stride = _ivf_budgeted_stride(n_total, dim)
    n_lists_ivf = max(1, len(range(0, n_total)[7 % stride :: stride]))
    cent_ids, _cent_mat = train_ivf_codebook(emb)
    n_lists_trained = max(1, len(cent_ids))
    base = emb.filter(F.col("vec_id") % 5 != 4)
    stride_b = _ivf_budgeted_stride(max(base.count(), 1), dim)
    n_lists_incr = max(
        1, base.filter((F.col("vec_id") % stride_b) == 7 % stride_b).count()
    )
    kc_ivfpq = max(1, n_total // stride)

    rows = [
        ("brute", 1.0, 1.0),
        ("lsh", rec(ann_lsh_bucketed(spark, sf_dir, k=k).collect()), lsh_frac),
        (
            "ivf",
            rec(ann_ivf(spark, sf_dir, k=k).collect()),
            round(min(1.0, 2 / n_lists_ivf), 4),
        ),
        (
            "ivf_trained",
            rec(ann_ivf_trained(spark, sf_dir, k=k).collect()),
            round(min(1.0, 2 / n_lists_trained), 4),
        ),
        (
            # frozen base-corpus codebook + O(batch) appended lists —
            # the recall-parity row the retrain scheduler watches
            "ivf_incremental",
            rec(ann_ivf_incremental(spark, sf_dir, k=k).collect()),
            round(min(1.0, 2 / n_lists_incr), 4),
        ),
        ("pq", rec(_pq.pq_ann_topk(spark, sf_dir, k=k).collect()), 1.0),
        (
            "ivfpq",
            rec(_pq.ivfpq_ann_topk(spark, sf_dir, k=k).collect()),
            round(min(1.0, _pq.IVFPQ_NPROBE / kc_ivfpq), 4),
        ),
    ]
    return spark.createDataFrame(
        rows, "method string, recall_at_k double, candidate_fraction double"
    ).withColumn("k", F.lit(k))
