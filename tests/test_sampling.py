"""Token-budget data mixing: strict DuckDB parity + budget semantics."""

from __future__ import annotations

import duckdb

from danae_spark.catalog import TABLES, table_path
from danae_spark.operators import sampling


def test_token_budget_mix_matches_oracle(spark, sf_dir):
    out = sampling.token_budget_mix(spark, sf_dir)
    s_rows = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    d_rows = sorted(tuple(r) for r in con.execute(sampling.token_budget_mix_oracle()).fetchall())
    con.close()
    assert s_rows == d_rows and len(s_rows) > 0

    # budget semantics: per source, selected tokens reach the budget and
    # overshoot by at most one document; unbudgeted sources select nothing
    per_source = {}
    for doc_id, source, tokens, tokens_before, selected in s_rows:
        cur = per_source.setdefault(source, {"sel": 0, "max_doc": 0, "n": 0})
        if selected:
            cur["sel"] += tokens
            cur["max_doc"] = max(cur["max_doc"], tokens)
            cur["n"] += 1
    for source, st in per_source.items():
        budget = sampling.DEFAULT_BUDGETS.get(source, 0)
        if budget == 0:
            assert st["n"] == 0, source
        else:
            assert st["sel"] < budget + st["max_doc"], source
            assert st["sel"] >= min(budget, st["sel"] + 1), source


def test_deterministic_split_frame_properties(spark):
    import pytest as _pytest

    from danae_spark.operators.sampling import deterministic_split_frame

    df = spark.range(20000).withColumnRenamed("id", "k")
    out = deterministic_split_frame(df, "k").groupBy("split").count().collect()
    frac = {r["split"]: r["count"] / 20000 for r in out}
    assert set(frac) == {"train", "val", "test"}
    assert abs(frac["train"] - 0.9) < 0.02
    assert abs(frac["val"] - 0.05) < 0.01 and abs(frac["test"] - 0.05) < 0.01

    # determinism + growth stability: a prefix of the corpus gets the
    # identical assignments it had in the full corpus
    small = deterministic_split_frame(df.filter("k < 5000"), "k")
    full = deterministic_split_frame(df, "k").filter("k < 5000")
    assert small.collect() == full.orderBy("k").collect() or (
        sorted(map(tuple, small.collect())) == sorted(map(tuple, full.collect()))
    )

    # different salt decorrelates
    other = deterministic_split_frame(df, "k", salt="other")
    both = (
        deterministic_split_frame(df, "k").withColumnRenamed("split", "a")
        .join(other.withColumnRenamed("split", "b"), "k")
    )
    moved = both.filter("a <> b").count()
    assert moved > 1000

    with _pytest.raises(ValueError):
        deterministic_split_frame(df, "k", splits={"a": 0.5, "b": 0.2})


def test_pack_sequences_contiguous_and_exact(spark):
    from danae_spark.operators.sampling import pack_sequences_frame

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),        # 5 tokens → [0, 5)
            (2, "f g h"),            # 3 tokens → [5, 8)
            (3, "i j k l m n o p"),  # 8 tokens → [8, 16)
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pack_sequences_frame(docs, seq_len=4).collect()}
    assert (out[1].start_pos, out[1].end_pos) == (0, 5)
    assert (out[2].start_pos, out[2].end_pos) == (5, 8)
    assert (out[3].start_pos, out[3].end_pos) == (8, 16)
    # doc 1 spans seqs 0-1 (tokens 0..4), doc 2 stays in seq 1,
    # doc 3 spans seqs 2-3 (tokens 8..15)
    assert (out[1].first_seq, out[1].last_seq, out[1].n_seqs) == (0, 1, 2)
    assert (out[2].first_seq, out[2].last_seq, out[2].n_seqs) == (1, 1, 1)
    assert (out[3].first_seq, out[3].last_seq, out[3].n_seqs) == (2, 3, 2)


def test_pack_sequences_prefix_sum_is_globally_consistent(spark, sf_dir):
    from danae_spark.catalog import load_table
    from danae_spark.operators.sampling import pack_sequences_frame

    docs = load_table(spark, sf_dir, "documents")
    rows = pack_sequences_frame(docs, seq_len=128).orderBy("doc_id").collect()
    pos = 0
    for r in rows:  # spans tile the stream with no gaps or overlaps
        assert r.start_pos == pos, r
        assert r.end_pos == pos + r.n_tokens
        pos = r.end_pos
    assert pos == sum(r.n_tokens for r in rows)


def test_pack_sequences_string_ids_and_null_text(spark):
    from danae_spark.operators.sampling import pack_sequences_frame

    docs = spark.createDataFrame(
        [("a", "x y z"), ("b", None), ("c", "p q")],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in pack_sequences_frame(docs, seq_len=4).collect()}
    assert out["a"].n_tokens == 3 and out["b"].n_tokens == 0
    # null-text doc occupies zero width; spans stay gap/overlap-free
    assert out["b"].start_pos == out["b"].end_pos == 3
    assert out["c"].start_pos == 3 and out["c"].end_pos == 5


def test_bpe_custom_columns_and_string_ids(spark):
    from danae_spark.operators.bpe import bpe_tokenize_frame, train_bpe

    docs = spark.createDataFrame(
        [("u1", "the the cat"), ("u2", "the dog")],
        "url string, content string",
    )
    merges = train_bpe(docs, n_merges=5, id_col="url", text_col="content")
    out = bpe_tokenize_frame(docs, merges, id_col="url", text_col="content")
    rows = {r.doc_id: r for r in out.collect()}
    assert rows["u1"].n_words == 3 and rows["u2"].n_words == 2


def test_pack_sequences_fuzz_tiling(spark):
    """Property fuzz: random corpora (deterministic LCG) always tile the
    global token stream with no gaps or overlaps, and sequence ids are
    consistent with positions."""
    from danae_spark.operators.sampling import pack_sequences_frame

    x = 42
    for trial in range(3):
        rows = []
        n_docs = 30 + trial * 17
        for i in range(n_docs):
            x = (x * 1103515245 + 12345) % (2**31)
            n_words = x % 9  # includes 0-token docs
            rows.append((i, " ".join(f"w{i}_{j}" for j in range(n_words))))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        seq_len = 5 + trial * 3
        out = pack_sequences_frame(docs, seq_len=seq_len).orderBy("doc_id").collect()
        pos = 0
        for r in out:
            assert r.start_pos == pos, (trial, r)
            assert r.end_pos == pos + r.n_tokens
            assert r.first_seq == r.start_pos // seq_len
            assert r.last_seq == max(r.end_pos - 1, r.start_pos) // seq_len
            assert r.n_seqs == r.last_seq - r.first_seq + 1
            pos = r.end_pos


def test_grouped_split_is_leakage_safe(spark):
    """group_col mode: every member of a group lands in the same split
    (near-dups of one origin can't straddle the train/test boundary),
    and group assignment matches hashing the group key directly."""
    from danae_spark.operators.sampling import deterministic_split_frame

    rows = [(i, f"dom{i % 50}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = deterministic_split_frame(df, group_col="domain").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.domain, set()).add(r.split)
    assert all(len(s) == 1 for s in by_group.values())
    # groups themselves are apportioned roughly by the fractions
    group_split = {g: next(iter(s)) for g, s in by_group.items()}
    frac_train = sum(1 for v in group_split.values() if v == "train") / 50
    assert 0.75 <= frac_train <= 1.0
    # parity: the group's split == splitting a frame of the bare keys
    keys = spark.createDataFrame(
        [(g,) for g in by_group], "domain string"
    )
    key_split = {
        r.domain: r.split
        for r in deterministic_split_frame(keys, id_col="domain").collect()
    }
    assert key_split == group_split


# ------------------- deterministic shuffle-shard training export


def test_shuffle_shards_manifest_matches_oracle(spark, sf_dir):
    out = sampling.shuffle_shards(spark, sf_dir)
    s_rows = [tuple(r) for r in out.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{table_path(sf_dir, 'documents')}'"
    )
    d_rows = [tuple(r) for r in con.execute(sampling.shuffle_shards_oracle()).fetchall()]
    con.close()
    assert s_rows == d_rows and len(s_rows) == sampling.N_SHARDS


def test_shuffle_shards_assignment_properties(spark):
    from pyspark.sql import functions as F

    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id")).alias("text"),
    )
    a = sampling.shuffle_shards_frame(docs, n_shards=4)
    rows = {r["doc_id"]: r for r in a.collect()}
    assert len(rows) == 400
    # every shard populated and roughly balanced (hash-uniform)
    from collections import Counter

    sizes = Counter(r["shard_id"] for r in rows.values())
    assert set(sizes) == {0, 1, 2, 3}
    assert max(sizes.values()) < 2 * min(sizes.values())
    # seq is a 1..n permutation inside each shard
    for sh in sizes:
        seqs = sorted(r["seq"] for r in rows.values() if r["shard_id"] == sh)
        assert seqs == list(range(1, sizes[sh] + 1))
    # deterministic: a second run assigns identically
    b = {r["doc_id"]: (r["shard_id"], r["seq"]) for r in
         sampling.shuffle_shards_frame(docs, n_shards=4).collect()}
    assert b == {d: (r["shard_id"], r["seq"]) for d, r in rows.items()}
    # the shuffle order is NOT the id order (it's a real shuffle): some
    # consecutive ids land non-consecutively within a shard
    by_seq = sorted(
        (r["seq"], r["doc_id"]) for r in rows.values() if r["shard_id"] == 0
    )
    ids_in_order = [d for _, d in by_seq]
    assert ids_in_order != sorted(ids_in_order)
    # a different salt is a decorrelated shuffle
    c = {r["doc_id"]: (r["shard_id"], r["seq"]) for r in
         sampling.shuffle_shards_frame(docs, n_shards=4, salt="other").collect()}
    assert c != b


def test_write_shuffle_shards_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), F.col("id"), F.lit(" x y")).alias("text"),
    )
    path = str(tmp_path / "export")
    manifest = sampling.write_shuffle_shards(docs, path, n_shards=4)
    m = {r["shard_id"]: r for r in manifest.collect()}

    # reading the export root skips the _shard_manifest sidecar
    back = spark.read.parquet(path)
    assert back.count() == 300
    assert set(back.columns) == {"doc_id", "shard_id", "seq", "tokens", "text"}

    # per-shard: file row order IS the shuffle (seq) order, counts and
    # token totals match the manifest, first_doc is the seq=1 doc
    for sh in range(4):
        rows = spark.read.parquet(f"{path}/shard_id={sh}").collect()
        assert [r["seq"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) == m[sh]["n_docs"]
        assert sum(r["tokens"] for r in rows) == m[sh]["n_tokens"]
        assert rows[0]["doc_id"] == m[sh]["first_doc"]

    # the manifest sidecar is itself readable and identical
    side = {r["shard_id"]: r for r in
            spark.read.parquet(path + "/_shard_manifest").collect()}
    assert {k: tuple(v) for k, v in side.items()} == {k: tuple(v) for k, v in m.items()}


def test_shuffle_shards_plan_is_single_shuffle(spark, sf_dir):
    # the manifest plan: partial aggregates map-side, ONE hash exchange
    # on shard_id, and no Window operator anywhere (the seq window lives
    # only on the per-doc/writer path)
    plan = sampling.shuffle_shards(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" not in plan, plan


def test_shuffle_shards_incremental_merge_equals_scratch(spark):
    from pyspark.sql import functions as F

    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id"), F.lit(" y z")).alias("text"),
    )
    full = sampling.shard_manifest_state(
        sampling._shard_assign(docs, 4, "doc_id", "text", sampling.SHARD_SALT)
    )
    # three sequential daily batches, merged one at a time
    state = None
    for lo, hi in ((0, 120), (120, 121), (121, 300)):  # incl. a 1-doc day
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        delta = sampling.shard_manifest_state(
            sampling._shard_assign(batch, 4, "doc_id", "text", sampling.SHARD_SALT)
        )
        state = delta if state is None else sampling.merge_shard_manifests(state, delta)
    got = sorted(tuple(r) for r in state.collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want and len(got) == 4
    # merging an empty delta is a no-op
    empty = sampling.shard_manifest_state(
        sampling._shard_assign(
            docs.filter(F.lit(False)), 4, "doc_id", "text", sampling.SHARD_SALT
        )
    )
    again = sorted(
        tuple(r) for r in sampling.merge_shard_manifests(state, empty).collect()
    )
    assert again == want
    # a shard present on only one side passes through: single-doc state
    one = sampling.shard_manifest_state(
        sampling._shard_assign(
            docs.filter(F.col("doc_id") == 0), 4, "doc_id", "text", sampling.SHARD_SALT
        )
    )
    merged = sampling.merge_shard_manifests(one, empty).collect()
    assert len(merged) == 1 and merged[0]["n_docs"] == 1


def test_stratified_sample_matches_oracle(spark, sf_dir):
    import duckdb
    import os

    from danae_spark.catalog import table_path
    from danae_spark.operators import sampling
    from danae_spark.queries import load_all

    fn = load_all()["stratified_sample"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(sampling.stratified_sample_oracle()).fetchall()]
    assert len(got) == len(want) and got == want


def test_stratified_sample_exactness_and_budgets(spark):
    """Budgets hit exactly when the stratum is big enough, whole
    stratum when not; selection equals the global hash order (the
    prefilter provably cannot change ranks)."""
    from pyspark.sql import functions as F

    from danae_spark.operators import sampling

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(900)] + [(1000, "tiny")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sampling.stratified_sample_frame(
        docs, budgets={"a": 10, "b": 300}, default_n=7
    ).collect()
    by = {}
    for r in got:
        by.setdefault(r["stratum"], []).append(r)
    assert len(by["a"]) == 10 and len(by["b"]) == 300
    assert len(by["c"]) == 7
    assert len(by["tiny"]) == 1 and by["tiny"][0]["rk"] == 1  # take-all leg

    # brute-force ground truth: global hash order per stratum
    hashed = docs.select(
        "lang",
        "doc_id",
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.lit(sampling.STRATA_SALT), F.col("doc_id"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint").alias("h"),
    ).collect()
    for stratum, n_s in (("a", 10), ("b", 300), ("c", 7)):
        pool = sorted(
            (r["h"], r["doc_id"]) for r in hashed if r["lang"] == stratum
        )[:n_s]
        want_ids = [doc for _h, doc in pool]
        got_ids = [r["doc_id"] for r in sorted(by[stratum], key=lambda r: r["rk"])]
        assert got_ids == want_ids, stratum


def test_stratified_sample_rescue_guard(spark):
    """margin=0 forces the prefilter to drop every row; the counted
    rescue must restore exactness anyway."""
    from danae_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, "x") for i in range(50)], "doc_id long, lang string"
    )
    got = sampling.stratified_sample_frame(
        docs, budgets={}, default_n=5, margin=0
    ).collect()
    assert len(got) == 5
    full = sampling.stratified_sample_frame(
        docs, budgets={}, default_n=5, margin=4
    ).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in full)


def test_stratified_sample_growth_stability(spark):
    """Corpus growth only displaces out-ranked docs: the selection
    from a superset is a superset-rank refinement, never a reshuffle."""
    from danae_spark.operators import sampling

    small = spark.createDataFrame(
        [(i, "s") for i in range(200)], "doc_id long, lang string"
    )
    big = spark.createDataFrame(
        [(i, "s") for i in range(400)], "doc_id long, lang string"
    )
    pick_small = {r["doc_id"] for r in sampling.stratified_sample_frame(
        small, budgets={}, default_n=20).collect()}
    pick_big = {r["doc_id"] for r in sampling.stratified_sample_frame(
        big, budgets={}, default_n=20).collect()}
    # every doc the big run keeps from the first 200 was already kept
    assert {d for d in pick_big if d < 200} <= pick_small


def test_weighted_sample_matches_oracle(spark, sf_dir):
    import duckdb
    import os

    from danae_spark.catalog import table_path
    from danae_spark.operators import sampling
    from danae_spark.queries import load_all

    fn = load_all()["weighted_sample"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(sampling.weighted_sample_oracle()).fetchall()]
    assert len(got) == len(want) and got == want


def test_weighted_sample_bias_and_plan(spark):
    """Higher weight -> materially higher inclusion rate; non-positive
    weights excluded; the plan is TakeOrdered, not a global sort."""
    from danae_spark.operators import sampling

    rows = [(i, 100 if i % 2 == 0 else 1) for i in range(2000)]
    rows += [(9999, 0), (9998, -5), (9997, None)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars int")
    got = sampling.weighted_sample_frame(docs, "n_chars", n=200).collect()
    assert len(got) == 200
    ids = [r["doc_id"] for r in got]
    assert 9999 not in ids and 9998 not in ids and 9997 not in ids
    heavy = sum(1 for i in ids if i % 2 == 0)
    assert heavy > 160  # weight-100 docs dominate a fair sample of evens+odds
    # ranks are 1..n in key order
    assert sorted(r["rk"] for r in got) == list(range(1, 201))
    plan = sampling.weighted_sample_frame(docs, "n_chars", n=200)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_mixture_plan_matches_oracle(spark, sf_dir):
    import duckdb
    import os

    from danae_spark.catalog import table_path
    from danae_spark.operators import sampling
    from danae_spark.queries import load_all

    fn = load_all()["mixture_plan"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(sampling.mixture_plan_oracle()).fetchall()]
    assert len(got) == len(want) and got == want


def test_mixture_plan_semantics(spark):
    from danae_spark.operators import sampling

    docs = spark.createDataFrame(
        [(f"d{i}", "tiny", "a b c") for i in range(2)]      # 6 tokens total
        + [(f"e{i}", "huge", "x " * 50) for i in range(10)],  # 500 tokens
        "doc_id string, source string, text string",
    )
    got = {r["source"]: r for r in sampling.mixture_plan_frame(
        docs, {"tiny": 20, "huge": 100}).collect()}
    t = got["tiny"]
    assert t["n_tokens"] == 6 and t["epochs"] == 3 and t["tail_tokens"] == 2
    assert abs(t["oversample"] - round(20 / 6, 6)) < 1e-9
    h = got["huge"]
    assert h["n_tokens"] == 500 and h["epochs"] == 0 and h["tail_tokens"] == 100
    # unmapped source surfaces with budget 0
    docs2 = spark.createDataFrame(
        [("a", "unmapped", "w w")], "doc_id string, source string, text string"
    )
    u = sampling.mixture_plan_frame(docs2, {"tiny": 20}).collect()[0]
    assert u["budget"] == 0 and u["epochs"] == 0 and u["tail_tokens"] == 0


def test_weighted_sample_incremental_equals_scratch(spark, sf_dir):
    from danae_spark.operators import sampling

    inc = [tuple(r) for r in sampling.weighted_sample_incremental(spark, sf_dir).collect()]
    scratch = [tuple(r) for r in sampling.weighted_sample(spark, sf_dir).collect()]
    assert inc == scratch and len(inc) > 0


def test_corpus_build_select_matches_oracle(spark, sf_dir):
    import duckdb
    import os

    from danae_spark.catalog import table_path
    from danae_spark.operators import sampling
    from danae_spark.queries import load_all

    fn = load_all()["corpus_build_select"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(sampling.corpus_build_select_oracle()).fetchall()]
    assert len(got) == len(want) and got == want and len(got) > 0
    # the gate is live: selection is a strict subset of gopher-passing docs
    from danae_spark.catalog import load_table
    from danae_spark.operators.textstats import gopher_rules_frame
    from pyspark.sql import functions as F

    passing = {
        r["doc_id"]
        for r in gopher_rules_frame(load_table(spark, sf_dir, "documents"))
        .filter(F.col("keep") == 1)
        .select("doc_id")
        .collect()
    }
    assert {r[1] for r in got} <= passing


def test_stratified_sample_incremental_equals_scratch(spark, sf_dir):
    from danae_spark.operators import sampling

    inc = [tuple(r) for r in sampling.stratified_sample_incremental(spark, sf_dir).collect()]
    scratch = [tuple(r) for r in sampling.stratified_sample(spark, sf_dir).collect()]
    assert inc == scratch and len(inc) > 0
