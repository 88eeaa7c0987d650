"""Behavioral tests for the late-r6 wideners: DSIR importance
resampling, URL domain capping, and overlapping token chunking.
(Strict DuckDB parity for all three is enforced by the registered
oracles via tools/check_oracle.py; these tests pin the SEMANTICS.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from danae_spark.operators import dsir, sampling, urlops


# ------------------------------------------------------------------ DSIR


def _toy_corpus(spark):
    rows = (
        # ten docs about cats (the target-like domain), ten about numbers
        [(i, f"the cat sat on the mat cat cat {i}") for i in range(10)]
        + [(10 + i, f"zero one two three four five six {i}") for i in range(10)]
    )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_prefers_target_like_docs(spark):
    corpus = _toy_corpus(spark)
    # target = the cat-domain docs themselves: with a target of ~170
    # grams the model separates the domains by tens of nats — far past
    # the O(±2) gumbel noise. (A tiny ~10-gram target leaves add-one
    # smoothing dominant and weights near-flat: correct DSIR behavior,
    # just not a usable discrimination test.)
    target = corpus.filter(F.col("doc_id") < 10).select("text")
    out = dsir.dsir_select_frame(corpus, target, k=8).collect()
    assert len(out) == 8
    cat_docs = sum(1 for r in out if r.doc_id < 10)
    assert cat_docs >= 7
    # and the two domains' log weights are well separated
    logw = {r.doc_id: r.logw for r in out}
    assert all(w > -15 for d, w in logw.items() if d < 10)


def test_dsir_deterministic_and_k_bounded(spark):
    corpus = _toy_corpus(spark)
    target = corpus.filter(F.col("doc_id") < 10)
    a = dsir.dsir_select_frame(corpus, target, k=5).collect()
    b = dsir.dsir_select_frame(corpus, target, k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 5


def test_dsir_zero_gram_docs_survive_scoring(spark):
    corpus = spark.createDataFrame(
        [(1, "actual words here"), (2, ""), (3, None), (4, "???!!!")],
        "doc_id long, text string",
    )
    target = corpus.filter(F.col("doc_id") == 1)
    out = dsir.dsir_select_frame(corpus, target, k=4).collect()
    # empty/null/no-gram docs score logw=0 + gumbel and stay selectable
    assert {r.doc_id for r in out} == {1, 2, 3, 4}
    by_id = {r.doc_id: r for r in out}
    assert by_id[2].n_grams == 0 and by_id[2].logw == 0.0


# ------------------------------------------------------- URL domain cap


def test_url_domain_cap_parses_and_caps(spark, sf_dir):
    out = urlops.url_domain_cap(spark, sf_dir, cap=5)
    rows = out.collect()
    assert len(rows) == 500
    for r in rows[:50]:
        assert r.host.startswith(("www.site", "site"))
        assert r.domain.startswith("site") and "." in r.domain
        assert not r.domain.startswith("www."), "registrable domain keeps www"
        assert r.tld in ("com", "org", "net")
        assert r.path_depth >= 1
    # cap honored per domain; kept count = min(cap, n_domain_docs)
    agg = (
        out.groupBy("domain")
        .agg(
            F.sum("kept").alias("k"),
            F.count("*").alias("n"),
            F.max("n_domain_docs").alias("nd"),
        )
        .collect()
    )
    assert len(agg) > 1
    for r in agg:
        assert r.n == r.nd
        assert r.k == min(5, r.n), r.domain


def test_url_domain_cap_noncanonical_urls(spark):
    """Uppercase scheme/host and explicit ports parse like canonical
    URLs (review finding: host regex was case/port sensitive)."""
    df = spark.createDataFrame(
        [(1, "HTTPS://WWW.Example.COM:8080/a/b"), (2, "http://plain.org/x")],
        "doc_id long, url string",
    )
    rows = {r.doc_id: r for r in urlops.url_domain_cap_frame(df).collect()}
    assert rows[1].host == "www.example.com"
    assert rows[1].domain == "example.com" and rows[1].tld == "com"
    # the PATH must survive an uppercase scheme too (review finding:
    # the path regex lacked the (?i) the host regex had)
    assert rows[1].path_depth == 2
    assert rows[2].domain == "plain.org"


def test_chunk_documents_awkward_column_names(spark):
    """Caller columns needing backticks work (aliased before exprs)."""
    df = spark.createDataFrame(
        [(1, "a b c d e")], "`my id` long, `the text` string"
    )
    rows = sampling.chunk_documents_frame(
        df, id_col="my id", text_col="the text", chunk_tokens=4, overlap=1
    ).collect()
    assert [r.chunk_text for r in rows] == ["a b c d", "d e"]


def test_url_domain_cap_frame_custom_columns(spark):
    df = spark.createDataFrame(
        [(i, f"https://www.heavy.com/p/{i}") for i in range(10)]
        + [(100, "http://light.org/x")],
        "id long, link string",
    )
    out = urlops.url_domain_cap_frame(df, id_col="id", url_col="link", cap=3)
    rows = {r.doc_id: r for r in out.collect()}
    assert sum(r.kept for r in rows.values() if r.doc_id < 100) == 3
    assert rows[100].kept == 1 and rows[100].domain == "light.org"
    assert rows[100].tld == "org" and rows[100].path_depth == 1


# -------------------------------------------------------- token chunking


def test_chunk_documents_tiling(spark):
    text = " ".join(f"t{i}" for i in range(150))
    df = spark.createDataFrame(
        [(1, text), (2, "short doc"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = sampling.chunk_documents_frame(df, chunk_tokens=64, overlap=16)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 150 tokens, stride 48: chunks at 0, 48, 96 cover to 159 ≥ 150 → 3 chunks
    assert len(by_doc[1]) == 3
    starts = [r.start_tok for r in by_doc[1]]
    assert starts == [0, 48, 96]
    assert [r.chunk_len for r in by_doc[1]] == [64, 64, 54]
    # overlap: last 16 tokens of chunk 0 == first 16 of chunk 1
    c0 = by_doc[1][0].chunk_text.split(" ")
    c1 = by_doc[1][1].chunk_text.split(" ")
    assert c0[48:] == c1[:16]
    # every token covered, in order
    assert c1[16:] == [f"t{i}" for i in range(64, 112)]
    # short doc → one chunk with all tokens
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "short doc"
    # empty/null docs → no chunks
    assert 3 not in by_doc and 4 not in by_doc


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        sampling.chunk_documents_frame(df, chunk_tokens=16, overlap=16)


# ------------------------------------------ MaxSim late interaction


def test_maxsim_finds_term_overlap_docs(spark):
    """A query doc must rank candidates sharing its exact terms above
    candidates with disjoint vocabulary (term-level max cosine = 1.0
    for shared terms)."""
    from danae_spark.operators.textstats import maxsim_topk_frame

    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma epsilon"),   # 3 shared terms
        (2, "alpha zeta eta theta"),       # 1 shared
        (3, "iota kappa lam mu"),          # none shared
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = maxsim_topk_frame(df, [0], k=3).collect()
    order = [r.cand_id for r in out]
    assert order[0] == 1, out
    assert order.index(1) < order.index(2) < order.index(3)
    scores = {r.cand_id: r.score for r in out}
    assert scores[1] > scores[2] > scores[3]


def test_maxsim_deterministic(spark, sf_dir):
    from danae_spark.catalog import load_table
    from danae_spark.operators.textstats import maxsim_topk_frame

    docs = load_table(spark, sf_dir, "documents")
    a = maxsim_topk_frame(docs, [0, 1, 2]).collect()
    b = maxsim_topk_frame(docs, [0, 1, 2]).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] and len(a) == 15


def test_url_domain_cap_multilabel_suffix_and_bare_hosts(spark):
    """Public-suffix handling (advisor finding): .co.uk sites must not
    all share one 'co.uk' cap bucket, and bare hosts / IPv4 literals
    must not collapse into a single '' bucket."""
    df = spark.createDataFrame(
        [
            (1, "https://www.example.co.uk/a"),
            (2, "https://other.co.uk/b"),
            (3, "http://deep.sub.example.co.uk/c"),
            (4, "http://localhost/x"),
            (5, "http://10.0.0.1/y"),
            (6, "https://plain.com/z"),
        ],
        "doc_id long, url string",
    )
    rows = {r.doc_id: r for r in urlops.url_domain_cap_frame(df).collect()}
    assert rows[1].domain == "example.co.uk"
    assert rows[2].domain == "other.co.uk"
    assert rows[3].domain == "example.co.uk"  # subdomains reduce to registrable
    assert rows[4].domain == "localhost"
    assert rows[5].domain == "10.0.0.1"
    assert rows[6].domain == "plain.com"
