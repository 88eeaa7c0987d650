"""Product-quantization ANN (PQ + asymmetric distance computation).

Jégou et al. 2011 ("Product quantization for nearest neighbor
search"): split each (L2-normalized) vector into `m` subvectors,
quantize every subvector against a per-subspace codebook of `kc`
centroids, and represent the vector by its m small codes — here
8 codes of 4 bits ≈ 8 bytes per vector vs 256 bytes of float32, a
32× memory/shuffle cut, far past the int8 scheme in
operators/quantize.py. Queries stay full-precision: the approximate
cosine is the ADC sum Σ_s LUT[s][code_s] where LUT[s][j] = q̂_s·c_{s,j}
— the candidate side never ships floats, only codes.

Spark-first shape (100 TB): the codebook is kc rows (deterministic
stride residue sample, the ann_ivf convention) — driver-held numpy,
shipped to executors inside the Arrow encoder closure; encoding is one
einsum per batch in mapInPandas (the _ivf_search pattern — no N×kc
row materialization); the LUT is Q·m·kc rows (tiny) built driver-side
and broadcast; scoring is one broadcast equi-join on (subspace, code)
plus a groupBy — all linear in N, nothing all-pairs in float space.

Determinism/oracle: centroid choice is a vec_id arithmetic residue,
per-subspace scores and LUT terms are rounded to 6dp before every
argmax (absorbing numpy-vs-SQL summation order, the cos6 convention),
ties break to the smallest centroid index, and the ADC sum of 6dp
terms accumulates in exact decimal — the ENTIRE pipeline (codebook,
code assignment, LUT, ranking) is value-checked by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from danae_spark.catalog import load_table
from danae_spark.functions.rounding import dsum_sql
from danae_spark.operators.ann import N_QUERIES, TOP_K

# defaults from the in-repo sweep (sf0.01, near-random 64-dim lake
# vectors — PQ's worst case, the §6a LSH situation): recall@5 vs exact
#   m= 8 kc=16: 0.18   m=16 kc=16: 0.30   m= 8 kc=32: 0.25
#   m=16 kc=32: 0.43   m=32 kc=16: 0.52        (chance ≈ 0.0025)
# m (subspace count) dominates; (16,16) is the classic 1-byte-per-code
# point — 8 B/vector, 32× vs float32 — kept as the default; real
# clustered corpora quantize far better than near-random vectors.
PQ_M = 16  # subspaces
PQ_KC = 16  # centroids per subspace


def _pq_codebook(emb_rows, m: int, kc: int):
    """(kc, m, subdim) float64 codebook from the collected centroid rows
    (already vec_id-ordered): full vectors L2-normalized then split."""
    import numpy as np

    C = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in emb_rows])
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    kc_eff, dim = C.shape
    return C.reshape(kc_eff, m, dim // m)


def _round6(a):
    import numpy as np

    return np.floor(a * 1e6 + 0.5001) / 1e6


def _pq_setup(emb: DataFrame, n_total: int, m: int, kc: int):
    """Collect the stride-residue codebook (bounded: kc rows) and build
    the encoding constants — (cents (kc_eff, m, subdim), half_sq).
    Shared by pq_ann_topk and ivfpq_ann_topk so codebook choice and
    tie-breaking can never diverge between them."""
    import numpy as np

    stride = max(1, n_total // kc)
    cent_rows = (
        emb.filter((F.col("vec_id") % stride) == 7 % stride)
        .orderBy("vec_id")
        .limit(kc)
        .collect()
    )
    cents = _pq_codebook(cent_rows, m, kc)
    # encoding score: x̂_s·c_{s,j} − ½|c_{s,j}|² (argmax ≡ argmin L2²;
    # |x̂_s|² drops out), rounded to 6dp, ties to smallest j
    half_sq = 0.5 * np.einsum("jmd,jmd->jm", cents, cents)
    return cents, half_sq


def _pq_codes(V, norms, m: int, subdim: int, cents, half_sq):
    """(B, m) int codes for a float64 batch (rows × dim) — 6dp-rounded
    argmax, first max → smallest centroid index."""
    import numpy as np

    S = (V / norms).reshape(len(V), m, subdim)
    sc = _round6(np.einsum("bmd,jmd->bmj", S, cents) - half_sq.T)
    return np.argmax(sc, axis=2)


def _lut_records(q_rows, m: int, subdim: int, cents) -> list:
    """ADC lookup-table rows (query_id, s, cidx, term) from the
    collected query vectors — Q×m×kc rows, driver-built."""
    import numpy as np

    records = []
    for r in q_rows:
        q = np.asarray(r.embedding, dtype=np.float64)
        qn = (q / np.linalg.norm(q)).reshape(m, subdim)
        terms = _round6(np.einsum("md,jmd->mj", qn, cents))
        for s in range(m):
            for j in range(cents.shape[0]):
                records.append((int(r.vec_id), s, j, float(terms[s, j])))
    return records


def pq_ann_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    m: int = PQ_M,
    kc: int = PQ_KC,
) -> DataFrame:
    """Embeddings-table entry: PQ-encode every vector, answer the first
    N_QUERIES queries by ADC top-k. Output (query_id, cand_id,
    approx_ip, rank) — approx_ip is the ADC estimate of the cosine."""
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_total = emb.count()
    first = emb.select("embedding").head(1)
    if not first:
        return spark.createDataFrame(
            [], "query_id long, cand_id long, approx_ip double, rank int"
        )
    dim = len(first[0].embedding)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    subdim = dim // m
    cents, half_sq = _pq_setup(emb, n_total, m, kc)
    coded = _pq_encode_frame(emb, m, subdim, cents, half_sq)
    return _pq_adc_search(spark, emb, coded, m, subdim, cents, k)


def _pq_encode_frame(emb: DataFrame, m: int, subdim: int, cents, half_sq) -> DataFrame:
    """PQ code assignment over any (vec_id, embedding) frame: one
    einsum per Arrow batch, no shuffle — the O(batch·kc) unit the
    incremental index appends with (pq_ann_incremental)."""
    import numpy as np
    import pandas as pd

    def encode(batches):
        for pdf in batches:
            if not len(pdf):  # np.stack rejects an empty batch
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            codes = _pq_codes(
                V, np.linalg.norm(V, axis=1, keepdims=True), m, subdim, cents, half_sq
            )
            yield pd.DataFrame(
                {
                    "cand_id": pdf["vec_id"].to_numpy(),
                    "codes": [row.astype("int32").tolist() for row in codes],
                }
            )

    return emb.mapInPandas(encode, schema="cand_id long, codes array<int>")


def _pq_adc_search(
    spark: SparkSession,
    emb: DataFrame,
    coded: DataFrame,
    m: int,
    subdim: int,
    cents,
    k: int,
) -> DataFrame:
    """ADC top-k over a pre-encoded codes frame: broadcast LUT join on
    (subspace, code) + exact-decimal sum + one ranking window."""
    q_rows = emb.filter(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    lut = F.broadcast(
        spark.createDataFrame(
            _lut_records(q_rows, m, subdim, cents),
            "query_id long, s int, cidx int, term double",
        )
    )
    pairs = (
        coded.select("cand_id", F.posexplode("codes").alias("s", "cidx"))
        .join(lut, ["s", "cidx"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .groupBy("query_id", "cand_id")
        .agg(
            F.sum(F.col("term").cast("decimal(28,6)")).cast("double").alias("approx_ip")
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("approx_ip"), F.asc("cand_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "approx_ip", "rank")
        .orderBy("query_id", "rank")
    )


def pq_ann_incremental(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    m: int = PQ_M,
    kc: int = PQ_KC,
) -> DataFrame:
    """INCREMENTAL PQ index maintenance — the compressed sibling of
    ann_ivf_incremental: the per-subspace codebook comes from the BASE
    corpus (vec_id % 5 != 4) and is FROZEN; the arriving batch
    (vec_id % 5 == 4) is PQ-encoded with one O(batch·kc) einsum and
    its codes APPENDED — no corpus re-encode, no codebook retrain.
    ADC search over (base codes ∪ batch codes) then equals the index
    built from scratch under the same codebook, which the DuckDB
    oracle certifies. Codebook staleness vs a retrain is the price of
    O(batch); pytest bounds the recall drift."""
    import numpy as np

    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 5 != 4)
    batch = emb.filter(F.col("vec_id") % 5 == 4)
    n_base = base.count()
    first = base.select("embedding").head(1)
    if not first:
        return spark.createDataFrame(
            [], "query_id long, cand_id long, approx_ip double, rank int"
        )
    dim = len(first[0].embedding)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    subdim = dim // m
    stride = max(1, n_base // kc)
    cent_rows = (
        base.filter((F.col("vec_id") % stride) == 7 % stride)
        .orderBy("vec_id")
        .limit(kc)
        .collect()
    )
    cents = _pq_codebook(cent_rows, m, kc)
    half_sq = 0.5 * np.einsum("jmd,jmd->jm", cents, cents)
    coded = _pq_encode_frame(base, m, subdim, cents, half_sq).unionByName(
        _pq_encode_frame(batch, m, subdim, cents, half_sq)  # O(batch) append
    )
    return _pq_adc_search(spark, emb, coded, m, subdim, cents, k)


def pq_ann_incremental_oracle(
    k: int = TOP_K, m: int = PQ_M, kc: int = PQ_KC, n_queries: int = N_QUERIES
) -> str:
    """DuckDB twin of the incremental PQ index: codebook from the base
    partition only, every row encoded against it, standard ADC
    ranking — equality certifies append == from-scratch under the
    frozen codebook."""
    return f"""
    WITH {_pq_ctes(m, kc, n_queries, base_where="vec_id % 5 <> 4")},
    pairs AS (
      SELECT l.query_id, cd.cand_id, {dsum_sql("l.term")} AS approx_ip
      FROM codes cd JOIN lut l USING (s, cidx)
      WHERE l.query_id <> cd.cand_id
      GROUP BY l.query_id, cd.cand_id
    )
    SELECT query_id, cand_id, approx_ip, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY approx_ip DESC, cand_id) AS INT) AS rank
      FROM pairs
    ) WHERE rank <= {k}
    ORDER BY query_id, rank
    """


def _pq_ctes(m: int, kc: int, n_queries: int, base_where: str = "TRUE") -> str:
    """The shared PQ CTE chain `params … codes, lut` (codebook, code
    assignment, ADC lookup table) — composed by pq_ann_oracle,
    ivfpq_ann_oracle, and (with `base_where` restricting the codebook
    source rows) pq_ann_incremental_oracle."""
    nv = (
        "list_transform(embedding::DOUBLE[],"
        " x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))"
    )

    def ssub(col, s):
        return f"{col}[({s}*__SD__+1):(({s}+1)*__SD__)]"

    sql = f"""params AS (
      SELECT greatest(1, CAST(floor(count(*) / {kc}) AS BIGINT)) AS stride,
             CAST(len(any_value(embedding)) / {m} AS BIGINT) AS sd
      FROM embeddings WHERE {base_where}
    ),
    cents0 AS (
      SELECT vec_id, embedding FROM embeddings, params
      WHERE ({base_where}) AND vec_id % stride = 7 % stride
      ORDER BY vec_id LIMIT {kc}
    ),
    cents AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cidx,
             {nv} AS cn
      FROM cents0
    ),
    nrm AS (SELECT vec_id, {nv} AS nv FROM embeddings),
    subs AS (SELECT CAST(unnest(range({m})) AS INT) AS s),
    scores AS (
      SELECT n.vec_id, subs.s, c.cidx,
             floor((list_dot_product({ssub('n.nv', 'subs.s')}, {ssub('c.cn', 'subs.s')})
                    - 0.5 * list_dot_product({ssub('c.cn', 'subs.s')}, {ssub('c.cn', 'subs.s')}))
                   * 1000000.0 + 0.5001) / 1000000.0 AS sc
      FROM nrm n, subs, cents c, params
    ),
    codes AS (
      SELECT vec_id AS cand_id, s, cidx FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                     ORDER BY sc DESC, cidx) AS rk
        FROM scores
      ) WHERE rk = 1
    ),
    lut AS (
      SELECT n.vec_id AS query_id, subs.s, c.cidx,
             floor(list_dot_product({ssub('n.nv', 'subs.s')}, {ssub('c.cn', 'subs.s')})
                   * 1000000.0 + 0.5001) / 1000000.0 AS term
      FROM nrm n, subs, cents c, params
      WHERE n.vec_id < {n_queries}
    )"""
    return sql.replace("__SD__", "sd")


def pq_ann_oracle(
    k: int = TOP_K, m: int = PQ_M, kc: int = PQ_KC, n_queries: int = N_QUERIES
) -> str:
    """DuckDB twin of the whole PQ pipeline: stride-residue codebook,
    normalized subvector scores, 6dp-rounded argmax codes, LUT terms,
    exact-decimal ADC sums, final ranking."""
    return f"""
    WITH {_pq_ctes(m, kc, n_queries)},
    pairs AS (
      SELECT l.query_id, cd.cand_id, {dsum_sql("l.term")} AS approx_ip
      FROM codes cd JOIN lut l USING (s, cidx)
      WHERE l.query_id <> cd.cand_id
      GROUP BY l.query_id, cd.cand_id
    )
    SELECT query_id, cand_id, approx_ip, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY approx_ip DESC, cand_id) AS INT) AS rank
      FROM pairs
    ) WHERE rank <= {k}
    ORDER BY query_id, rank
    """


# ------------------------------------------------ IVF-PQ (the FAISS shape)

IVFPQ_NPROBE = 4


def ivfpq_ann_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    m: int = PQ_M,
    kc: int = PQ_KC,
    nprobe: int = IVFPQ_NPROBE,
) -> DataFrame:
    """IVF-PQ: the standard billion-scale ANN layout (FAISS IVFPQ,
    non-residual variant) — a coarse ⌊√N⌋-centroid quantizer routes
    every vector into an inverted list (the ann_ivf machinery), PQ
    codes stand in for the vectors, and a query ADC-scores ONLY the
    codes in its `nprobe` probed lists. Work per query drops from N
    code lookups (pq_ann_topk) to ~nprobe·N/√N, and the scored side
    still never ships floats.

    One Arrow pass assigns BOTH the coarse list and the PQ code per
    vector (one scan); probes and the ADC lookup table are driver-built
    from bounded collects (√N centroids, N_QUERIES queries) and
    broadcast. Every stage reproduces the DuckDB oracle."""
    import numpy as np
    import pandas as pd

    from danae_spark.operators.ann import _ivf_budgeted_stride
    from danae_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_total = emb.count()
    first = emb.select("embedding").head(1)
    if not first:
        return spark.createDataFrame(
            [], "query_id long, cand_id long, approx_ip double, rank int"
        )
    dim = len(first[0].embedding)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    subdim = dim // m
    cents, half_sq = _pq_setup(emb, n_total, m, kc)  # shared with pq_ann_topk

    # IVF coarse codebook (√N rows, the ann_ivf convention)
    ivf_stride = _ivf_budgeted_stride(n_total, dim)
    ivf_rows = (
        emb.filter((F.col("vec_id") % ivf_stride) == 7 % ivf_stride)
        .orderBy("vec_id")
        .collect()
    )
    ivf_ids = np.array([r.vec_id for r in ivf_rows], dtype=np.int64)
    ivf_mat = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in ivf_rows])
    ivf_norm = np.linalg.norm(ivf_mat, axis=1)

    def assign_and_encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            norms = np.linalg.norm(V, axis=1, keepdims=True)
            # coarse list: 6dp-rounded cosine argmax, first max = smallest id
            cos6 = _round6((V @ ivf_mat.T) / (norms * ivf_norm))
            lists = ivf_ids[np.argmax(cos6, axis=1)]
            codes = _pq_codes(V, norms, m, subdim, cents, half_sq)
            yield pd.DataFrame(
                {
                    "cand_id": pdf["vec_id"].to_numpy(),
                    "centroid_id": lists,
                    "codes": [row.astype("int32").tolist() for row in codes],
                }
            )

    coded = emb.mapInPandas(
        assign_and_encode,
        schema="cand_id long, centroid_id long, codes array<int>",
    )

    # probes + LUT from the bounded query collect (LUT builder shared
    # with pq_ann_topk)
    q_rows = emb.filter(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    probe_records = []
    for r in q_rows:
        q = np.asarray(r.embedding, dtype=np.float64)
        cos6 = _round6((q @ ivf_mat.T) / (np.linalg.norm(q) * ivf_norm))
        order = sorted(range(len(ivf_ids)), key=lambda j: (-cos6[j], ivf_ids[j]))
        for j in order[:nprobe]:
            probe_records.append((int(r.vec_id), int(ivf_ids[j])))
    lut_records = _lut_records(q_rows, m, subdim, cents)
    probes = F.broadcast(
        spark.createDataFrame(probe_records, "query_id long, centroid_id long")
    )
    lut = F.broadcast(
        spark.createDataFrame(
            lut_records, "query_id long, s int, cidx int, term double"
        )
    )

    pairs = (
        coded.join(probes, "centroid_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", F.posexplode("codes").alias("s", "cidx"))
        .join(lut, ["query_id", "s", "cidx"])
        .groupBy("query_id", "cand_id")
        .agg(
            F.sum(F.col("term").cast("decimal(28,6)")).cast("double").alias("approx_ip")
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("approx_ip"), F.asc("cand_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "approx_ip", "rank")
        .orderBy("query_id", "rank")
    )


def ivfpq_ann_oracle(
    k: int = TOP_K,
    m: int = PQ_M,
    kc: int = PQ_KC,
    nprobe: int = IVFPQ_NPROBE,
    n_queries: int = N_QUERIES,
) -> str:
    """DuckDB twin of the IVF-PQ pipeline: the ann_ivf coarse CTEs
    (√N stride codebook, 6dp cosine argmax lists, probes) composed with
    the shared PQ CTEs (codes, LUT), joined exactly as the Spark plan."""
    from danae_spark.operators.ann import _cos6_sql

    return f"""
    WITH iparams AS (
      SELECT greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT)) AS istride
      FROM embeddings
    ),
    icents AS (
      SELECT vec_id AS centroid_id, embedding FROM embeddings, iparams
      WHERE vec_id % istride = 7 % istride
    ),
    iassign AS (
      SELECT e.vec_id AS cand_id, c.centroid_id,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {_cos6_sql('e', 'c')} DESC, c.centroid_id) AS rk
      FROM embeddings e, icents c
    ),
    lists AS (SELECT cand_id, centroid_id FROM iassign WHERE rk = 1),
    probes AS (
      SELECT query_id, centroid_id FROM (
        SELECT q.vec_id AS query_id, c.centroid_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_cos6_sql('q', 'c')} DESC, c.centroid_id) AS rk
        FROM embeddings q, icents c WHERE q.vec_id < {n_queries}
      ) WHERE rk <= {nprobe}
    ),
    {_pq_ctes(m, kc, n_queries)},
    pairs AS (
      SELECT p.query_id, cd.cand_id, {dsum_sql("l.term")} AS approx_ip
      FROM codes cd
      JOIN lists li ON cd.cand_id = li.cand_id
      JOIN probes p ON li.centroid_id = p.centroid_id
      JOIN lut l ON l.query_id = p.query_id AND l.s = cd.s AND l.cidx = cd.cidx
      WHERE p.query_id <> cd.cand_id
      GROUP BY p.query_id, cd.cand_id
    )
    SELECT query_id, cand_id, approx_ip, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY approx_ip DESC, cand_id) AS INT) AS rank
      FROM pairs
    ) WHERE rank <= {k}
    ORDER BY query_id, rank
    """
