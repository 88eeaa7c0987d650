"""Learned BPE: deterministic merge training + distributed application."""

from __future__ import annotations


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_bpe_learns_frequent_pairs(spark):
    from danae_spark.operators.bpe import END_OF_WORD, train_bpe

    # 'the' dominates: merges should assemble it early
    docs = _docs(spark, [(i, "the the the cat sat") for i in range(5)])
    merges = train_bpe(docs, n_merges=10)
    assert len(merges) > 0
    joined = {a + b for a, b in merges}
    assert "th" in joined or "he" + END_OF_WORD in joined
    # training is deterministic
    assert merges == train_bpe(docs, n_merges=10)


def test_bpe_tokenize_roundtrip_and_compression(spark):
    from danae_spark.operators.bpe import (
        END_OF_WORD,
        bpe_tokenize_frame,
        train_bpe,
    )

    docs = _docs(
        spark,
        [(1, "running runner runs"), (2, "runner running runs run")],
    )
    merges = train_bpe(docs, n_merges=30)
    out = {r.doc_id: r for r in bpe_tokenize_frame(docs, merges).collect()}
    for r in out.values():
        # concatenating a word's tokens reproduces word + end marker
        assert r.n_words >= 1 and r.n_bpe_tokens >= r.n_words
    # with enough merges frequent words collapse to few tokens
    toks1 = out[1].tokens
    assert any(t.endswith(END_OF_WORD) for t in toks1)
    # shared-subword compression: total tokens < total characters
    assert out[1].n_bpe_tokens < sum(len(w) for w in "running runner runs".split()) + 3


def test_bpe_lake_counts_consistent(spark, sf_dir):
    from danae_spark.operators.bpe import bpe_token_count

    out = bpe_token_count(spark, sf_dir, n_merges=50)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        # every word yields at least one token; merging never inflates
        # beyond characters+1 per word
        assert r.n_bpe_tokens >= r.n_words
