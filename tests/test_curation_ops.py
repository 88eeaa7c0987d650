"""Round-6 curation-widener operators: perplexity bucketing, the
Naive-Bayes quality classifier, SemDeDup, and boilerplate line dedup."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


# --------------------------------------------------- perplexity buckets


def test_perplexity_buckets_thirds_per_lang(spark):
    from danae_spark.operators.textstats import perplexity_buckets_frame

    rows = []
    # 9 docs in one "language": typical docs reuse the same words, two
    # outliers are full of rare tokens → they must land in the tail
    common = "alpha beta gamma delta " * 5
    for i in range(7):
        rows.append((i, common + f"alpha beta", "xx"))
    rows.append((7, "zz7a qq7b ww7c rr7d ss7e tt7f uu7g vv7h", "xx"))
    rows.append((8, "zz8a qq8b ww8c rr8d ss8e tt8f uu8g vv8h", "xx"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perplexity_buckets_frame(docs).collect()
    assert len(out) == 9
    by_id = {r.doc_id: r for r in out}
    # ntile(3) over 9 docs → 3 per bucket, outliers score highest nll
    assert by_id[7].bucket == "tail" and by_id[8].bucket == "tail"
    assert sorted(r.bucket for r in out).count("head") == 3
    for r in out:
        assert r.bucket == ("head", "middle", "tail")[r.bucket_no - 1]


def test_perplexity_buckets_partitions_by_lang(spark):
    from danae_spark.operators.textstats import perplexity_buckets_frame

    rows = [(i, "tok shared words here", "en" if i < 4 else "fr") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perplexity_buckets_frame(docs).collect()
    # each language is bucketed independently: every lang has its own head
    for lang in ("en", "fr"):
        assert any(r.bucket == "head" for r in out if r.lang == lang)


# --------------------------------------------- Naive-Bayes quality score


def test_nb_classifier_generalizes_labels(spark):
    from danae_spark.operators.textstats import nb_quality_classifier_frame

    good_words = "science method result analysis evidence"
    bad_words = "spam click free winner prize"
    rows, labels = [], []
    for i in range(6):
        rows.append((i, good_words + f" extra{i}"))
        labels.append((i, 1))
    for i in range(6, 12):
        rows.append((i, bad_words + f" extra{i}"))
        labels.append((i, 0))
    # held-out docs: share vocabulary with a class but got NO label row —
    # the classifier must score them by the learned token weights
    rows.append((100, "science evidence analysis"))
    rows.append((101, "spam free prize"))
    labels.append((100, 1))  # labels frame still needs rows for training docs only
    labels.append((101, 0))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lab = spark.createDataFrame(labels[:12], "doc_id long, keep int")
    out = {
        r.doc_id: r
        for r in nb_quality_classifier_frame(docs, labels=lab).collect()
    }
    assert out[100].pred_keep == 1 and out[100].nb_logodds > 0
    assert out[101].pred_keep == 0 and out[101].nb_logodds < 0
    # training docs separate cleanly too
    assert all(out[i].pred_keep == 1 for i in range(6))
    assert all(out[i].pred_keep == 0 for i in range(6, 12))


def test_nb_classifier_default_pseudo_labels(spark, sf_dir):
    from danae_spark.catalog import load_table
    from danae_spark.operators.textstats import (
        nb_quality_classifier_frame,
        quality_filter_frame,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = nb_quality_classifier_frame(docs)
    qf = quality_filter_frame(docs).select("doc_id", "keep")
    j = out.join(qf, "doc_id")
    n = j.count()
    agree = j.filter(F.col("pred_keep") == F.col("keep")).count()
    # the learned model must mostly reproduce its own pseudo-label seed
    assert n > 0 and agree / n >= 0.6


# ------------------------------------------------------------- SemDeDup


def _mk_emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_semantic_dedup_drops_near_identical(spark):
    from danae_spark.operators.dedup import semantic_dedup_frame

    # two tight groups far apart + one isolated vector
    base_a = [1.0, 0.0, 0.0, 0.0]
    base_b = [0.0, 1.0, 0.0, 0.0]
    vecs = [
        base_a,
        [0.999, 0.01, 0.0, 0.0],   # near-dup of 0
        base_b,
        [0.01, 0.999, 0.0, 0.0],   # near-dup of 2
        [0.0, 0.0, 1.0, 0.0],      # isolated
    ]
    out = {r.vec_id: r for r in semantic_dedup_frame(_mk_emb(spark, vecs)).collect()}
    assert len(out) == 5
    # each near-dup pair keeps exactly one member
    assert out[0].drop + out[1].drop == 1
    assert out[2].drop + out[3].drop == 1
    assert out[4].drop == 0 and out[4].n_dups == 0
    # survivors are the more central members of their neighborhoods
    for a, b in ((0, 1), (2, 3)):
        kept = a if out[a].drop == 0 else b
        dropped = b if kept == a else a
        assert out[kept].centroid_cos >= out[dropped].centroid_cos


def test_semantic_dedup_trained_codebook_path(spark):
    from danae_spark.operators.ann import train_ivf_codebook
    from danae_spark.operators.dedup import semantic_dedup_frame

    vecs = [[1.0, 0.0, 0.0, 0.0], [0.999, 0.02, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    emb = _mk_emb(spark, vecs)
    cb = train_ivf_codebook(emb, n_centroids=2, iters=2)
    out = {r.vec_id: r for r in semantic_dedup_frame(emb, codebook=cb).collect()}
    assert out[0].drop + out[1].drop == 1
    assert out[2].drop == 0


def test_semantic_dedup_lake_has_real_drops(spark, sf_dir):
    from danae_spark.operators.dedup import semantic_dedup

    out = semantic_dedup(spark, sf_dir)
    agg = out.agg(
        F.sum("drop").alias("drops"), F.count("*").alias("n")
    ).collect()[0]
    assert agg.n > 0
    # every drop needs at least one surviving τ-similar neighbor
    dropped = out.filter(F.col("drop") == 1)
    assert dropped.filter(F.col("n_dups") == 0).count() == 0


# ----------------------------------------------------------- line dedup


def test_line_dedup_removes_boilerplate_lines(spark):
    from danae_spark.operators.dedup import line_dedup_frame

    banner = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"unique first line\n{banner}\nunique closing one"),
            (2, f"{banner}\nanother body line"),
            (3, "totally unrelated document"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup_frame(docs, min_df=2).collect()}
    assert out[1].removed_lines == 1
    assert out[1].text_clean == "unique first line\nunique closing one"
    assert out[2].removed_lines == 1
    assert out[2].text_clean == "another body line"
    assert out[3].removed_lines == 0
    assert out[3].text_clean == "totally unrelated document"


def test_line_dedup_empty_lines_never_removed(spark):
    from danae_spark.operators.dedup import line_dedup_frame

    docs = spark.createDataFrame(
        [(1, "a\n\nb"), (2, "c\n\nd")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in line_dedup_frame(docs, min_df=2).collect()}
    # the empty line appears in both docs but is not boilerplate-eligible
    assert out[1].removed_lines == 0 and out[1].text_clean == "a\n\nb"


def test_line_dedup_lake_does_real_work(spark, sf_dir):
    from danae_spark.operators.dedup import line_dedup

    out = line_dedup(spark, sf_dir)
    agg = out.agg(
        F.sum("removed_lines").alias("rm"), F.sum("n_lines").alias("n")
    ).collect()[0]
    assert agg.n > 0
    # rebuilt text shrinks exactly when lines were removed
    shrunk = out.filter(
        (F.col("removed_lines") > 0) & (F.col("text_clean") == "")
    ).count()
    assert shrunk >= 0  # smoke: no exception path; exact values oracle-checked


def test_line_dedup_hash_join_parity(spark, sf_dir):
    from danae_spark.catalog import load_table
    from danae_spark.operators.dedup import line_dedup_frame

    banner = "all rights reserved"
    docs = spark.createDataFrame(
        [
            (1, f"body one\n{banner}"),
            (2, f"{banner}\nbody two"),
            (3, "free text"),
        ],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, line_dedup_frame(docs, min_df=2).collect()))
    b = sorted(map(tuple, line_dedup_frame(docs, min_df=2, hash_join=True).collect()))
    assert a == b
    # and on real lake text via the chunked entry's core
    lake = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    la = sorted(map(tuple, line_dedup_frame(lake, line_sep=" ").collect()))
    lb = sorted(
        map(tuple, line_dedup_frame(lake, line_sep=" ", hash_join=True).collect())
    )
    assert la == lb


# --------------------------------------- doc embedding + text SemDeDup


def test_doc_embedding_similar_docs_close(spark):
    from danae_spark.functions import vectors
    from danae_spark.operators.textstats import doc_embedding_frame

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog again"),
            (3, "completely different vocabulary about finance markets stocks"),
        ],
        "doc_id long, text string",
    )
    emb = doc_embedding_frame(docs, as_array=True)
    rows = {r.doc_id: r.embedding for r in emb.collect()}
    import numpy as np

    def cos(a, b):
        a, b = np.asarray(a, float), np.asarray(b, float)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(rows[1], rows[2]) > cos(rows[1], rows[3])
    assert cos(rows[1], rows[2]) > 0.9


def test_semantic_dedup_text_finds_planted_near_dup(spark):
    from danae_spark.operators.textstats import semantic_dedup_text_frame

    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    rows = [(0, base), (1, base + "iota")]  # near-identical token mix
    # distinct filler docs with disjoint vocabularies
    for i in range(2, 10):
        rows.append((i, " ".join(f"w{i}x{j}" for j in range(40))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.vec_id: r for r in semantic_dedup_text_frame(docs).collect()}
    assert out[0].drop + out[1].drop == 1  # the planted pair loses one member
    assert all(out[i].drop == 0 for i in range(2, 10))


# ----------------------------------------------- corpus report + search


def test_corpus_report_strata_consistency(spark, sf_dir):
    from danae_spark.catalog import load_table
    from danae_spark.operators.textstats import corpus_report_frame

    docs = load_table(spark, sf_dir, "documents")
    rep = corpus_report_frame(docs)
    rows = rep.collect()
    assert len(rows) > 0
    total_docs = sum(r.n_docs for r in rows)
    assert total_docs == docs.count()
    for r in rows:
        assert 0.0 <= r.keep_rate <= 1.0
        assert 0 <= r.pii_docs <= r.n_docs
        assert r.total_tokens > 0


def test_similar_docs_facade(spark, sf_dir):
    from danae_spark.api import DataLakeEngine

    eng = DataLakeEngine(spark, sf_dir)
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "finance markets stocks trading earnings revenue"),
            (3, "weather rain sun clouds storm wind temperature"),
        ],
        "doc_id long, text string",
    )
    out = eng.similar_docs(docs, query_ids=[0], k=1).collect()
    assert len(out) == 1
    assert out[0].cand_id == 1  # the near-copy outranks unrelated docs


def test_frequent_ngrams_finds_planted_boilerplate(spark):
    from danae_spark.operators.textstats import frequent_ngrams_frame

    banner = "all rights reserved worldwide"
    rows = [(i, f"doc body {i} unique words here {banner}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = frequent_ngrams_frame(docs, n=4, k=5).collect()
    assert out[0].gram == "all rights reserved worldwide"
    assert out[0].tf == 10 and out[0].df == 10 and out[0].rank == 1
    # ranks are dense and ordered by tf desc
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    tfs = [r.tf for r in out]
    assert tfs == sorted(tfs, reverse=True)


def test_line_dedup_conservation_properties(spark, sf_dir):
    """Invariants over lake data: every doc keeps n_lines = kept + removed
    (kept inferred from the rebuilt text), min_df beyond corpus size
    removes nothing, and rebuilt text is a subsequence of the original
    chunk stream."""
    from danae_spark.catalog import load_table
    from danae_spark.operators.dedup import LINE_CHUNK, line_dedup

    out = {r.doc_id: r for r in line_dedup(spark, sf_dir).collect()}
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    import re

    # independent pure-python reimplementation of the whole operator
    def doc_chunks(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        return [
            " ".join(toks[i : i + LINE_CHUNK])
            for i in range(0, len(toks), LINE_CHUNK)
        ]

    from collections import Counter

    df_count = Counter()
    for text in docs.values():
        for c in set(doc_chunks(text)):
            df_count[c] += 1
    boiler = {c for c, d in df_count.items() if d >= 2 and c.strip()}
    for doc_id, r in out.items():
        chunks = doc_chunks(docs[doc_id])
        expect_removed = sum(1 for c in chunks if c in boiler)
        expect_clean = " ".join(c for c in chunks if c not in boiler)
        assert r.n_lines == len(chunks), doc_id
        assert r.removed_lines == expect_removed, doc_id
        assert r.text_clean == expect_clean, doc_id
    # a min_df above the corpus size removes nothing
    nothing = line_dedup(spark, sf_dir, min_df=10**9)
    from pyspark.sql import functions as F

    assert nothing.agg(F.sum("removed_lines")).collect()[0][0] == 0


# ------------------------------------ r6 code-review regression cases


def test_connected_components_fast_path_string_ids(spark):
    from danae_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["d1", "d2"]
    )
    labels = {r.doc_id: r.label for r in connected_components(pairs).collect()}
    assert labels == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_semantic_dedup_sparse_id_frame(spark):
    from danae_spark.operators.dedup import semantic_dedup_frame

    # ids in an arithmetic progression that misses the stride residue
    emb = spark.createDataFrame(
        [(i * 10, [1.0, float(i % 3), 0.0, 1.0]) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup_frame(emb)
    assert out.count() == 100  # no np.stack crash, every vector assigned


def test_semantic_dedup_text_preserves_double_vectors(spark):
    from danae_spark.operators.dedup import semantic_dedup_frame
    from danae_spark.operators.textstats import doc_embedding_frame

    docs = spark.createDataFrame(
        [(i, f"w{i}a w{i}b common words here") for i in range(6)],
        "doc_id long, text string",
    )
    emb = doc_embedding_frame(docs, as_array=True)
    assert dict(emb.dtypes)["embedding"] == "array<double>"
    out = semantic_dedup_frame(emb, id_col="doc_id", tau=0.99)
    # the assignment stage must not downcast to float32
    assert out.count() == 6


def test_nb_stream_drops_out_of_vocab_docs(spark, sf_dir, tmp_path):
    import os

    from danae_spark.operators.textstats import nb_train_weights
    from danae_spark.streaming.curation import (
        nb_score_stream,
        run_curation_available_now,
    )
    from danae_spark.catalog import load_table

    weights = nb_train_weights(load_table(spark, sf_dir, "documents"))
    # a stream containing one fully out-of-vocabulary document
    src_dir = str(tmp_path / "docs")
    os.makedirs(src_dir)
    spark.createDataFrame(
        [(1, "key agg row scan"), (2, "zzqqxx1 zzqqxx2 zzqqxx3")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src_dir)
    out = run_curation_available_now(
        nb_score_stream(stream, weights), "t_nb_oov"
    ).collect()
    ids = {r.doc_id for r in out}
    assert 1 in ids and 2 not in ids  # batch scorer's join drops doc 2 too


def test_profile_drift_fully_null_current(spark):
    from danae_spark.profiling.incremental import partial_state, profile_drift

    base = spark.createDataFrame([(float(i),) for i in range(50)], "x double")
    allnull = spark.createDataFrame([(None,)] * 50, "x double")
    d = {r.column_name: r for r in profile_drift(
        partial_state(base, "t"), partial_state(allnull, "t")
    ).collect()}
    # must flag drift (not throw under ANSI, not coalesce to fine)
    assert d["x"].drifted == 1
    assert abs(d["x"].null_rate_delta - 1.0) < 1e-9


def test_gopher_quality_matches_oracle(spark, sf_dir):
    import os

    import duckdb

    from danae_spark.catalog import table_path
    from danae_spark.operators.textstats import GOPHER_QUALITY_ORACLE
    from danae_spark.queries import load_all

    fn = load_all()["gopher_quality"].fn
    got = [tuple(r) for r in fn(spark, sf_dir).collect()]
    p = table_path(sf_dir, "documents")
    glob = f"{p}/*.parquet" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    want = [tuple(r) for r in con.execute(GOPHER_QUALITY_ORACLE).fetchall()]
    assert len(got) == len(want) and got == want


def test_gopher_rules_fire_individually(spark):
    """Each rule drops exactly the doc built to violate it."""
    from danae_spark.operators.textstats import gopher_rules_frame

    good = "the quick brown fox and the lazy dog have fun with words " * 3
    rows = [
        (0, good),
        (1, "the of and short"),                       # too few words
        (2, ("a " * 40) + "the of"),                   # mean word len < 3
        (3, " ".join("123456" for _ in range(30)) + " the of"),  # alpha < 0.8
        (4, " ".join("w#rd#" for _ in range(30)) + " the of"),   # symbols
        (5, "\n".join("- item the of and that" for _ in range(10))),  # bullets
        (6, "\n".join("the line trails off..." for _ in range(10))),  # ellipsis
        (7, good.replace("the", "xx").replace("and", "yy")
             .replace("with", "zz").replace("have", "qq")),      # no stop words
    ]
    got = {r["doc_id"]: r for r in gopher_rules_frame(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    assert got[0]["keep"] == 1
    assert got[1]["ok_words"] == 0 and got[1]["keep"] == 0
    assert got[2]["ok_mean_len"] == 0
    assert got[3]["ok_alpha"] == 0
    assert got[4]["ok_symbol"] == 0
    assert got[5]["ok_bullet"] == 0
    assert got[6]["ok_ellipsis"] == 0
    assert got[7]["ok_stops"] == 0 and got[7]["n_stop_words"] < 2


def test_crawl_curate_gopher_gating(spark, sf_dir):
    """Both gopher verdicts occur on the grid, and a quality-dropped
    page never wins a keeper slot (dedup runs over passing pages
    only)."""
    from danae_spark.multimodal.warc import crawl_curate_gopher_roundtrip

    rows = crawl_curate_gopher_roundtrip(spark, sf_dir).collect()
    ok = [r for r in rows if r["gopher_ok"] == 1]
    bad = [r for r in rows if r["gopher_ok"] == 0]
    assert ok and bad, (len(ok), len(bad))
    for r in bad:
        assert r["is_keeper"] == 0 and r["keep"] == 0 and r["n_dup"] == 0, r
    # every passing page is in exactly one cluster with one keeper
    by_keep = {}
    for r in ok:
        assert r["n_dup"] >= 1, r
    assert any(r["keep"] == 1 for r in ok)
    # word counts drive the verdict at the configured threshold
    assert all(r["n_words"] >= 15 for r in ok)
    assert all(r["n_words"] < 15 or r["mean_word_len"] < 2.0 for r in bad)
