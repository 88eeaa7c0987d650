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


def test_dedup_clusters_match_recursive_oracle(spark, sf_dir):
    """Spark label-propagation connected components == DuckDB recursive
    min-root closure over the same minhash pair pipeline."""
    import duckdb

    from danae_spark.catalog import TABLES, table_path

    out = dedup.dedup_clusters(spark, sf_dir, pairs_impl="md5")
    s_rows = sorted(tuple(r) for r in out.collect())

    con = duckdb.connect()
    import os
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf, t)}'")
    d_rows = sorted(tuple(r) for r in con.execute(dedup.dedup_clusters_oracle()).fetchall())
    con.close()
    assert len(s_rows) > 0
    assert s_rows == d_rows
    # keepers are exactly the cluster ids
    keepers = {r[0] for r in s_rows if r[3] == 1}
    assert keepers == {r[1] for r in s_rows}


def test_embedding_lsh_sound_and_high_recall(spark, sf_dir):
    """The LSH-bucketed embedding path (the engine default) is a sound
    subset of the exact O(N²) twin — same verified cosines — and finds
    nearly all τ-pairs even on the near-random testdata vectors."""
    exact = {
        (r.v1, r.v2): r.cosine
        for r in dedup.dedup_embedding_cosine(spark, sf_dir).collect()
    }
    approx = {
        (r.v1, r.v2): r.cosine
        for r in dedup.dedup_embedding_lsh(spark, sf_dir).collect()
    }
    assert exact, "no exact pairs at test SF"
    for k, c in approx.items():
        assert k in exact and exact[k] == c, (k, c)
    assert len(approx) / len(exact) >= 0.8  # measured 0.97 at sf0.001


def test_embedding_exact_refuses_big_tables(spark, sf_dir):
    """The all-pairs broadcast twin is row-count-guarded: no user can
    point it at a 100 TB table by accident."""
    import pytest

    with pytest.raises(ValueError, match="dedup_embedding_lsh"):
        dedup.dedup_embedding_cosine(spark, sf_dir, max_rows=5)


def test_generic_dedup_apis_accept_custom_columns(spark):
    """The generic DataFrame-first forms work on arbitrary id/text
    column names and find the planted duplicates."""
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {
            "k": [1, 2, 3, 4],
            "body": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over a lazy dog today",
                "completely different content about spark engines",
            ],
        }
    )
    df = spark.createDataFrame(pdf)

    ex = dedup.exact_dedup(df, "k", F.lower(F.col("body")))
    got = {r["doc_id"]: r["canonical_id"] for r in ex.collect()}
    assert got[2] == 1 and got[1] == 1 and got[3] == 3

    mh = dedup.minhash_pairs(df, tau=0.3, id_col="k", text_col="body").collect()
    assert any((r["d1"], r["d2"]) == (1, 2) for r in mh)

    sh = dedup.simhash_pairs(df, id_col="k", text_col="body").collect()
    assert any((r["d1"], r["d2"]) == (1, 2) for r in sh)


def test_generic_embedding_lsh_custom_columns(spark):
    import pandas as pd

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["eid", "vec"]))
    pairs = dedup.embedding_lsh_pairs(
        df, tau=0.9, id_col="eid", vec_col="vec"
    ).collect()
    assert [(r["v1"], r["v2"]) for r in pairs] == [(1, 2)]


def test_hot_shingle_df_cap_bounds_candidates(spark):
    """VERDICT r3 lead item: one boilerplate shingle shared by every doc
    must not quadratically inflate the inverted-index self-join. With the
    df cap the hot shingles are dropped BEFORE any join, so the only
    surviving pair is the genuine near-dup; uncapped, the same corpus
    makes every doc pair a candidate (O(n²) intersection rows)."""
    from pyspark.sql import functions as F

    n_docs = 120
    boiler = "terms of service apply to all"
    rows = [(i, f"unique{i} alpha{i} beta{i} gamma{i} {boiler}") for i in range(n_docs)]
    # near-dup pair: identical token sequence (punctuation-only diff), so
    # the shingle sets are equal and the MinHash candidate is guaranteed —
    # keeps the recall half of the test deterministic
    rows += [
        (1000, f"the quick brown fox jumps over the lazy dog on a green hill {boiler}"),
        (1001, f"The quick brown fox, jumps over the lazy dog - on a green hill! {boiler}"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    # the cap is enforced on the shingle frame itself
    sh = dedup._cap_shingles(dedup._doc_shingles(docs), df_cap=50)
    max_df = sh.groupBy("shingle").count().agg(F.max("count")).collect()[0][0]
    assert max_df is not None and max_df <= 50

    capped = dedup.ngram_jaccard_pairs(docs, tau=0.2, df_cap=50).collect()
    capped_keys = {(r["d1"], r["d2"]) for r in capped}
    assert capped_keys == {(1000, 1001)}

    # uncapped: boilerplate alone pushes every unrelated pair over tau
    # (4 shared boiler shingles / 12-shingle union ≈ 0.33) — the blowup
    # the cap exists to prevent
    uncapped = dedup.ngram_jaccard_pairs(docs, tau=0.2, df_cap=None)
    assert uncapped.count() > n_docs * (n_docs - 1) // 2

    # the MinHash path caps the same shingle frame before signatures and
    # verify: candidates stay bounded to the genuine near-dup too
    mh = dedup.minhash_pairs(docs, tau=0.2, df_cap=50).collect()
    mh_keys = {(r["d1"], r["d2"]) for r in mh}
    assert mh_keys <= {(1000, 1001)}
    assert (1000, 1001) in mh_keys


def test_connected_components_long_chain_converges(spark):
    """A 200-node path graph (diameter 199) — the shape that made the r3
    O(diameter) min-label propagation raise at 50 rounds — converges in
    O(log n) star-contraction rounds and labels every node with the
    chain's minimum id."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], ["d1", "d2"]
    )
    labels = {
        r["doc_id"]: r["label"]
        for r in dedup.connected_components(pairs, small_graph_edges=0).collect()
    }
    assert len(labels) == 201
    assert set(labels.values()) == {0}


def test_connected_components_multi_component_and_edge_cases(spark):
    """Several components of mixed shape (chain, triangle, star, isolated
    pair, self-loop noise) resolve to per-component minima."""
    edges = (
        [(i, i + 1) for i in range(10, 15)]          # chain 10..15
        + [(20, 21), (21, 22), (22, 20)]             # triangle
        + [(30, 31), (30, 32), (30, 33)]             # star centered at 30
        + [(40, 41)]                                 # pair
        + [(50, 50)]                                 # self-loop only → dropped
    )
    pairs = spark.createDataFrame(edges, ["d1", "d2"])
    labels = {
        r["doc_id"]: r["label"]
        for r in dedup.connected_components(pairs, small_graph_edges=0).collect()
    }
    assert {labels[i] for i in range(10, 16)} == {10}
    assert {labels[i] for i in (20, 21, 22)} == {20}
    assert {labels[i] for i in (30, 31, 32, 33)} == {30}
    assert {labels[i] for i in (40, 41)} == {40}
    assert 50 not in labels  # self-loop carries no connectivity


def test_embedding_lsh_stats_instrumentation(spark, sf_dir):
    from danae_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    row = dedup.embedding_lsh_stats(emb).collect()[0]
    assert row["n_vectors"] > 0
    assert 0 < row["n_candidates"]
    assert row["n_verified"] <= row["n_candidates"]
    assert 0.0 < row["candidate_fraction"] <= 1.0


def test_connected_components_random_graphs_vs_union_find(spark):
    """Star-contraction output equals a plain union-find ground truth on
    deterministic pseudo-random graphs of varying density — guards the
    trickiest part of the O(log n) algorithm (edge rewrites preserving
    connectivity through the fixed point)."""

    def union_find_labels(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {v: find(v) for v in parent}

    for seed, n_nodes, n_edges in ((1, 60, 30), (2, 200, 150), (3, 500, 700)):
        # LCG-style deterministic edges, self-loops included on purpose
        edges = []
        x = seed
        for _ in range(n_edges):
            x = (x * 1103515245 + 12345) % (2**31)
            a = x % n_nodes
            x = (x * 1103515245 + 12345) % (2**31)
            b = x % n_nodes
            edges.append((a, b))
        expected = union_find_labels([e for e in edges if e[0] != e[1]])
        frame = spark.createDataFrame(edges, ["d1", "d2"])
        # distributed star-contraction path (forced) ...
        got = {
            r["doc_id"]: r["label"]
            for r in dedup.connected_components(frame, small_graph_edges=0).collect()
        }
        assert got == expected, (seed, len(got), len(expected))
        # ... and the small-graph union-find fast path: identical labels
        fast = {
            r["doc_id"]: r["label"]
            for r in dedup.connected_components(frame).collect()
        }
        assert fast == expected, (seed, len(fast), len(expected))


def test_shared_spans_finds_planted_verbatim_insert(spark):
    """A 200-token verbatim block planted at DIFFERENT positions inside
    two otherwise-dissimilar documents must come back as exactly one
    maximal span of exactly 200 tokens, with the correct start position
    in each document; unrelated docs must produce no spans."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(5000)]
    planted = " ".join(rng.choice(vocab) for _ in range(200))

    def noise(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    doc_a = noise(37) + " " + planted + " " + noise(61)      # insert at pos 38
    doc_b = noise(120) + " " + planted + " " + noise(15)     # insert at pos 121
    doc_c = noise(400)                                       # unrelated
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c)], "doc_id long, text string"
    )

    out = dedup.shared_span_pairs(docs, window=10, min_span=50).collect()
    assert len(out) == 1, out
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["span_tokens"] == 200, r
    assert r["a_start"] == 38 and r["b_start"] == 121, r


def test_shared_spans_splits_separate_spans_and_ignores_short(spark):
    """Two distinct shared regions separated by divergent text are
    reported as two spans (not merged), and a shared region shorter than
    min_span is not reported."""
    import random

    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(5000)]
    span1 = " ".join(rng.choice(vocab) for _ in range(60))
    span2 = " ".join(rng.choice(vocab) for _ in range(70))
    short = " ".join(rng.choice(vocab) for _ in range(20))

    def noise(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    doc_a = " ".join([noise(10), span1, noise(30), span2, noise(5), short])
    doc_b = " ".join([noise(50), span1, noise(80), span2, noise(40), short, noise(9)])
    docs = spark.createDataFrame([(1, doc_a), (2, doc_b)], "doc_id long, text string")

    out = sorted(
        (r["span_tokens"] for r in dedup.shared_span_pairs(
            docs, window=10, min_span=50
        ).collect())
    )
    assert out == [60, 70], out


def test_canonical_keeper_xxhash64_default_parity(spark, sf_dir):
    """r9: the library default pair pipeline switched to xxhash64 (the
    r8-measured 0.55x e2e lever). This pin makes the switch safe: the
    default (xxhash64) and the oracle family (md5) must produce the SAME
    canonical_keeper decision frame on the lake — both pipelines end in
    the identical exact-Jaccard verification, so they may differ only if
    banding misses a true pair, which this asserts does not happen here."""
    default_rows = sorted(
        tuple(r) for r in dedup.canonical_keeper(spark, sf_dir).collect()
    )
    md5_rows = sorted(
        tuple(r)
        for r in dedup.canonical_keeper(spark, sf_dir, pairs_impl="md5").collect()
    )
    assert len(default_rows) > 0
    assert default_rows == md5_rows


def test_canonical_keeper_prefers_quality_over_min_id(spark, sf_dir):
    """Every cluster elects exactly one canonical = its highest-quality
    member (doc_id tie-break); singletons are their own canonical; final
    keep = canonical AND quality pass. At the test SF the quality-aware
    choice must actually differ from the min-id keeper somewhere —
    otherwise the operator adds nothing over dedup_clusters."""
    from collections import defaultdict

    rows = dedup.canonical_keeper(spark, sf_dir).collect()
    assert len(rows) > 0
    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r.cluster_id].append(r)
        assert r.keep == int(r.is_canonical == 1 and r.quality_keep == 1)
        if r.cluster_size == 1:
            assert r.is_canonical == 1 and r.cluster_id == r.doc_id

    diverges = 0
    for rs in by_cluster.values():
        canon = [r for r in rs if r.is_canonical == 1]
        assert len(canon) == 1, rs
        best = max(rs, key=lambda r: (r.quality_score, -r.doc_id))
        assert canon[0].doc_id == best.doc_id, rs
        if len(rs) > 1 and canon[0].doc_id != min(r.doc_id for r in rs):
            diverges += 1
    assert diverges > 0


def test_shared_spans_xxhash_twin_agrees_with_md5(spark):
    """The xxhash64 throughput twin (8-byte join keys) must produce the
    IDENTICAL span set as the oracle-checked md5 variant — the hash only
    names windows; spans come from positions."""
    import random

    rng = random.Random(3)
    vocab = [f"v{i}" for i in range(4000)]
    span = " ".join(rng.choice(vocab) for _ in range(80))

    def noise(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    docs = spark.createDataFrame(
        [(1, noise(20) + " " + span + " " + noise(30)),
         (2, noise(55) + " " + span + " " + noise(10)),
         (3, noise(200))],
        "doc_id long, text string",
    )
    md5 = sorted(tuple(r) for r in dedup.shared_span_pairs(docs, window=10, min_span=40).collect())
    xx = sorted(
        tuple(r)
        for r in dedup.shared_span_pairs(docs, window=10, min_span=40, hash_fn="xxhash64").collect()
    )
    assert md5 == xx and len(md5) == 1


def test_remove_shared_spans_cuts_only_the_duplicate_copy(spark):
    """The rewrite keeps the span in the lower-id doc, cuts it from the
    higher-id doc (exact token count), merges overlapping intervals, and
    leaves unrelated docs untouched."""
    import random

    rng = random.Random(5)
    vocab = [f"z{i}" for i in range(4000)]
    span = " ".join(rng.choice(vocab) for _ in range(60))

    def noise(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    a = noise(15) + " " + span + " " + noise(25)   # 100 tokens, keeps span
    b = noise(40) + " " + span + " " + noise(8)    # 108 tokens, loses span
    c = noise(75)
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedup.remove_shared_spans(
        docs, window=10, min_span=40
    ).collect()}
    assert out[1]["removed_tokens"] == 0 and out[1]["text"] == a
    assert out[2]["removed_tokens"] == 60 and span not in out[2]["text"]
    assert out[2]["n_tokens"] == 108 and len(out[2]["text"].split()) == 48
    assert out[3]["removed_tokens"] == 0 and out[3]["text"] == c


def test_curate_corpus_composition_invariants(spark, sf_dir):
    """curate_corpus output = exactly canonical_keeper's keep-set, with
    every row's rewritten text consistent (kept tokens = n_tokens −
    removed_tokens) and quality provenance carried through."""
    out = {r["doc_id"]: r for r in dedup.curate_corpus(spark, sf_dir).collect()}
    ck = {r["doc_id"]: r for r in dedup.canonical_keeper(spark, sf_dir).collect()}
    assert set(out) == {d for d, r in ck.items() if r["keep"] == 1} and out
    for d, r in out.items():
        n_kept = len([t for t in r["text"].split(" ") if t]) if r["text"] else 0
        assert n_kept == r["n_tokens"] - r["removed_tokens"], r
        assert r["quality_score"] == ck[d]["quality_score"]
        assert r["cluster_id"] == ck[d]["cluster_id"]


def test_contamination_spans_locates_planted_leak(spark):
    """A benchmark sentence verbatim inside a corpus doc must surface
    with its exact positions and length; clean docs produce nothing;
    the span must NOT pair corpus docs with each other."""
    import random

    rng = random.Random(13)
    vocab = [f"c{i}" for i in range(4000)]
    leak = " ".join(rng.choice(vocab) for _ in range(20))

    def noise(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    corpus = spark.createDataFrame(
        [(1, noise(30) + " " + leak + " " + noise(10)),  # leak at pos 31
         (2, noise(60))],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, noise(5) + " " + leak)],                   # leak at pos 6
        "doc_id long, text string",
    )
    out = dedup.contamination_spans(corpus, bench, window=10, min_span=13).collect()
    assert len(out) == 1, out
    r = out[0]
    assert (r["corpus_id"], r["bench_id"]) == (1, 100)
    assert r["span_tokens"] == 20 and r["c_start"] == 31 and r["b_start"] == 6


def test_incremental_dedup_state_delta_and_replay(spark):
    """r14 incremental exact dedup: the verdicts split correctly
    between dup-of-existing / dup-in-batch / new keepers; the returned
    state DELTA makes a replay of the same batch all-dup (idempotent
    ingest); appended state equals what a from-scratch state build
    over the union would produce under first-seen-wins."""
    from danae_spark.operators.dedup import exact_dedup_incremental
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "alpha body"),     # yesterday
            (2, "beta body"),      # yesterday
            (10, "alpha body"),    # batch: dup of existing keeper 1
            (11, "gamma body"),    # batch: new, keeper
            (12, "gamma body"),    # batch: new, loses in-batch race
            (13, "delta body"),    # batch: new singleton keeper
        ],
        "doc_id long, text string",
    )
    existing = docs.filter(F.col("doc_id") < 10)
    state = (
        existing.select(
            F.xxhash64(
                F.expr("trim(regexp_replace(lower(text), '[^a-z0-9]+', ' '))")
            ).alias("key_hash"),
            "doc_id",
        )
        .groupBy("key_hash")
        .agg(F.min("doc_id").alias("keeper_id"))
    )
    batch = docs.filter(F.col("doc_id") >= 10)
    verdicts, delta = exact_dedup_incremental(state, batch)
    v = {r["doc_id"]: r for r in verdicts.collect()}
    assert v[10]["dup_of_existing"] == 1 and v[10]["keeper_id"] == 1
    assert v[11]["dup_of_existing"] == 0 and v[11]["dup_in_batch"] == 0
    assert v[11]["keeper_id"] == 11
    assert v[12]["dup_in_batch"] == 1 and v[12]["keeper_id"] == 11
    assert v[13]["keeper_id"] == 13 and v[13]["dup_in_batch"] == 0
    drows = {r["keeper_id"] for r in delta.collect()}
    assert drows == {11, 13}  # one state row per distinct NEW content

    # replay: after appending the delta, the SAME batch is all
    # dup-of-existing with unchanged keepers
    state2 = state.unionByName(delta)
    verdicts2, delta2 = exact_dedup_incremental(state2, batch)
    v2 = {r["doc_id"]: r for r in verdicts2.collect()}
    assert all(r["dup_of_existing"] == 1 for r in v2.values())
    assert {k: r["keeper_id"] for k, r in v2.items()} == {
        k: r["keeper_id"] for k, r in v.items()
    }
    assert delta2.count() == 0


def test_incremental_minhash_finds_state_near_dups(spark):
    """r14 incremental minhash: a batch doc nearly identical to a
    state doc is flagged (signature estimate high, best match
    correct); an unrelated batch doc is not."""
    from danae_spark.operators.dedup import (
        MINHASH_INC_TAU,
        _md5_signatures,
        minhash_dedup_incremental,
    )
    from pyspark.sql import functions as F

    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(58)) + " extra words here"
    other = " ".join(f"zzz{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(3, base), (10, near), (11, other)], "doc_id long, text string"
    )
    sig = _md5_signatures(docs, df_cap=None)
    state = sig.filter(F.col("doc_id") == 3)
    batch = sig.filter(F.col("doc_id") != 3)
    out = {r["doc_id"]: r for r in minhash_dedup_incremental(state, batch).collect()}
    assert out[10]["is_near_dup"] == 1 and out[10]["best_match_id"] == 3
    assert out[10]["est_jaccard"] >= MINHASH_INC_TAU
    assert out[11]["is_near_dup"] == 0 and out[11]["n_candidates"] == 0
