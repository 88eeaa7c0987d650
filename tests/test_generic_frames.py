"""DataFrame-first generality: every text/sampling/decontamination
operator accepts caller-supplied frames with arbitrary column names —
a real pipeline's eval sets and corpora are not lake tables.

(The dedup/temporal generic APIs grew in r3/r4 and are covered in
tests/test_dedup.py / test_temporal_ops.py; these are the r5 additions
per the r3 VERDICT directive #3.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from danae_spark.operators import dedup, sampling, textstats


def test_text_stats_frame_custom_columns_no_lang(spark):
    df = spark.createDataFrame(
        [(7, "the quick brown fox and the lazy dog"), (8, "el perro y el gato")],
        ["id", "body"],
    )
    out = textstats.text_stats_frame(df, id_col="id", text_col="body", lang_col=None)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {7, 8}
    assert rows[7]["predicted"] == "en"
    assert rows[8]["predicted"] == "es"
    # no ground-truth labels → agreement column exists but is null
    assert rows[7]["agrees_with_label"] is None
    assert rows[7]["n_tokens"] == 8


def test_text_stats_frame_matches_registered_entry(spark, sf_dir):
    from danae_spark.catalog import load_table

    registered = textstats.text_stats(spark, sf_dir).collect()
    generic = textstats.text_stats_frame(
        load_table(spark, sf_dir, "documents")
        .withColumnRenamed("doc_id", "k")
        .withColumnRenamed("text", "body"),
        id_col="k",
        text_col="body",
    ).collect()
    assert registered == generic


def test_text_repetition_frame_custom_columns(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "each word here is fully distinct today"),
        ],
        ["k", "body"],
    )
    rows = {
        r["doc_id"]: r
        for r in textstats.text_repetition_frame(df, id_col="k", text_col="body").collect()
    }
    assert rows[1]["keep"] == 0 and rows[1]["dup_2gram_frac"] > 0.5
    assert rows[2]["keep"] == 1 and rows[2]["dup_2gram_frac"] == 0.0


def test_doc_fingerprint_frame_detects_shared_content(spark):
    shared = "a long shared paragraph of content that both documents contain"
    df = spark.createDataFrame(
        [(1, shared), (2, shared), (3, "completely different text with no overlap at all")],
        ["k", "body"],
    )
    out = textstats.doc_fingerprint_frame(df, id_col="k", text_col="body").collect()
    fp = {r["doc_id"]: (r["fp1"], r["fp2"], r["fp3"], r["fp4"]) for r in out}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_contamination_check_caller_frames(spark):
    leak = "one two three four five six seven eight nine"
    corpus = spark.createDataFrame(
        [
            (100, f"prefix {leak} suffix words beyond", "x"),
            (101, "totally clean document with no benchmark overlap here at all", "x"),
        ],
        ["cid", "body", "junk"],
    )
    benchmark = spark.createDataFrame(
        [(1, f"question: {leak} answer: ten")], ["qid", "question"]
    )
    out = dedup.contamination_check(
        corpus,
        benchmark,
        n=7,
        id_col="cid",
        text_col="body",
        bench_id_col="qid",
        bench_text_col="question",
    ).collect()
    assert [r["doc_id"] for r in out] == [100]
    assert out[0]["n_shared_grams"] >= 1 and out[0]["n_benchmark_docs"] == 1


def test_contamination_registered_entry_matches_split_frames(spark, sf_dir):
    """The lake entry point is exactly the generic check over the %50
    split — the refactor kept the oracle-checked plan identical."""
    from danae_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    via_entry = dedup.contamination_ngram(spark, sf_dir).collect()
    via_generic = dedup.contamination_check(
        docs.filter((F.col("doc_id") % dedup.BENCH_MOD) != 0),
        docs.filter((F.col("doc_id") % dedup.BENCH_MOD) == 0),
    ).collect()
    assert via_entry == via_generic
    assert len(via_entry) > 0


def test_token_budget_mix_frame_custom_columns(spark):
    df = spark.createDataFrame(
        [
            (1, "web", "five words in this doc"),
            (2, "web", "another five word document here"),
            (3, "web", "a third document of words"),
            (4, "books", "book text"),
        ],
        ["k", "origin", "body"],
    )
    out = sampling.token_budget_mix_frame(
        df, {"web": 8}, id_col="k", source_col="origin", text_col="body"
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    # budget 8 tokens: first doc (5 tokens) selected, second starts at 5<8
    # → selected, third starts at 10 ≥ 8 → cut; books has no budget
    assert sum(r["selected"] for r in rows.values()) == 2
    assert rows[4]["selected"] == 0
    assert all(r["tokens"] == 5 for k, r in rows.items() if k in (1, 2, 3))


def test_pii_scan_and_redact_custom_frames(spark):
    from danae_spark.operators import pii

    df = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+spam@mail.example.org or 555-123-4567 thanks"),
            (2, "server at 192.168.0.1 and 10.0.0.255 responded"),
            (3, "no sensitive content here"),
        ],
        ["k", "body"],
    )
    scan = {r["doc_id"]: r for r in pii.pii_scan_frame(df, "k", "body").collect()}
    assert (scan[1]["n_email"], scan[1]["n_phone"]) == (1, 1)
    assert scan[2]["n_ipv4"] == 2
    assert scan[3]["n_pii"] == 0 and scan[3]["has_pii"] == 0
    assert scan[1]["has_pii"] == 1

    red = {r["doc_id"]: r["redacted_text"] for r in pii.pii_redact_frame(df, "k", "body").collect()}
    assert "<EMAIL>" in red[1] and "<PHONE>" in red[1]
    assert "jane" not in red[1] and "4567" not in red[1]
    assert red[2].count("<IP>") == 2
    assert red[3] == "no sensitive content here"


def test_doc_fingerprint_xxhash64_twin(spark):
    shared = "a long shared paragraph of content that both documents contain"
    df = spark.createDataFrame(
        [(1, shared), (2, shared), (3, "entirely different words appear in this one")],
        ["k", "body"],
    )
    out = textstats.doc_fingerprint_frame(df, "k", "body", hash_fn="xxhash64").collect()
    fp = {r["doc_id"]: (r["fp1"], r["fp2"], r["fp3"], r["fp4"]) for r in out}
    assert fp[1] == fp[2] != fp[3]
    md5 = {r["doc_id"]: r["fp1"] for r in textstats.doc_fingerprint_frame(df, "k", "body").collect()}
    assert md5[1] != fp[1][0]  # different hash family, same sketch shape


def test_quality_filter_frame_decision_logic(spark):
    from danae_spark.operators.textstats import quality_filter_frame

    good = ("the quick brown fox jumps over the lazy dog and then walks home "
            "while the sun sets over the quiet town and people rest") 
    df = spark.createDataFrame(
        [
            (1, good),
            (2, "spam spam spam spam spam spam spam spam"),
            (3, good + " email me at a.person@example.com"),
        ],
        ["k", "body"],
    )
    rows = {r["doc_id"]: r for r in quality_filter_frame(df, "k", "body").collect()}
    assert rows[1]["keep"] == 1
    assert rows[2]["keep"] == 0 and rows[2]["rep_keep"] == 0
    assert rows[3]["keep"] == 0 and rows[3]["has_pii"] == 1
    no_pii = {r["doc_id"]: r for r in
              quality_filter_frame(df, "k", "body", check_pii=False).collect()}
    assert no_pii[3]["keep"] == 1


def test_unigram_logprob_frame_ranks_typicality(spark):
    from danae_spark.operators.textstats import unigram_logprob_frame

    common = "the cat sat on the mat and the dog sat on the rug"
    df = spark.createDataFrame(
        [(1, common), (2, common), (3, "zyzzyva qwertic floobargle xenoplasm")],
        ["k", "body"],
    )
    rows = {r["doc_id"]: r for r in unigram_logprob_frame(df, "k", "body").collect()}
    # rare-token gibberish must score strictly higher cross-entropy than
    # the corpus-typical docs
    assert rows[3]["unigram_nll"] > rows[1]["unigram_nll"]
    assert rows[1]["unigram_nll"] == rows[2]["unigram_nll"]
    assert rows[1]["n_tokens"] == 13


def test_ngram_expr_escapes_separator(spark):
    """A separator containing a quote or backslash must not break (or
    inject into) the generated SQL expression (advisor finding)."""
    from pyspark.sql import functions as F

    from danae_spark.functions.grams import ngram_expr

    df = spark.createDataFrame([(["a", "b", "c"],)], "t array<string>")
    got = df.select(F.expr(ngram_expr("t", 2, sep="'")).alias("g")).head().g
    assert got == ["a'b", "b'c"]
    got2 = df.select(F.expr(ngram_expr("t", 2, sep="\\")).alias("g")).head().g
    assert got2 == ["a\\b", "b\\c"]
