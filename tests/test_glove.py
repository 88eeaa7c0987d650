"""GloVe-format loader: a handcrafted 5-term file round-trips into the
(term, vector) frame the `embeddings=` plug point accepts, and the
mean-vector helper reproduces the reference word_aggregator semantics
(OOV skipped, per-dimension mean)."""

from __future__ import annotations

import os

import pytest

from danae_spark.sources.embeddings import load_glove, mean_vector

GLOVE = """the 0.1 0.2 0.3
quick 1.0 2.0 3.0
brown -1.0 -2.0 -3.0
fox 0.5 0.5 0.5
DOG 4.0 0.0 -4.0
"""


@pytest.fixture()
def glove_path(tmp_path):
    p = tmp_path / "glove.toy.3d.txt"
    p.write_text(GLOVE)
    return str(p)


def test_load_glove_parses_terms_and_vectors(spark, glove_path):
    emb = load_glove(spark, glove_path)
    rows = {r["term"]: r["vector"] for r in emb.collect()}
    assert len(rows) == 5
    assert rows["quick"] == [1.0, 2.0, 3.0]
    assert rows["DOG"] == [4.0, 0.0, -4.0]
    assert emb.schema["vector"].dataType.simpleString() == "array<double>"


def test_load_glove_lowercase_and_dims_override(spark, glove_path):
    emb = load_glove(spark, glove_path, dims=3, lowercase=True)
    rows = {r["term"]: r["vector"] for r in emb.collect()}
    assert "dog" in rows and "DOG" not in rows


def test_load_glove_skips_malformed_and_header_lines(spark, tmp_path):
    p = tmp_path / "glove.dirty.txt"
    p.write_text("400000 3\nok 1 2 3\nbroken 1 2\nalso_ok 4 5 6\nnan_line a b c\n")
    rows = {r["term"]: r["vector"] for r in load_glove(spark, str(p)).collect()}
    assert set(rows) == {"ok", "also_ok"}


def test_mean_vector_reproduces_word_aggregator(spark, glove_path):
    """Reference word_aggregator.py:13: sentence vector = mean of the
    vectors of in-vocabulary words; OOV words are skipped entirely."""
    emb = load_glove(spark, glove_path)
    sentence = spark.createDataFrame(
        [("quick",), ("brown",), ("unknown_word",)], ["term"]
    )
    out = mean_vector(emb, sentence, dims=3).collect()[0]
    assert out["n_terms"] == 2  # OOV skipped
    assert [out["e0"], out["e1"], out["e2"]] == [0.0, 0.0, 0.0]


def test_load_glove_plugs_into_search_index(spark, tmp_path, sf_dir):
    """A GloVe file whose vocabulary covers the lake's categorical terms
    satisfies the `embeddings=` contract end-to-end (vector length
    inference + Categorical signature build)."""
    from danae_spark.profiling import tfidf
    from danae_spark.search import knn

    terms = sorted({r.term for r in tfidf.categorical_topk(spark, sf_dir).collect()})
    p = tmp_path / "glove.lake.4d.txt"
    p.write_text(
        "".join(
            f"{t} {i + 0.5} {i % 3} {-1.0 * i} 0.25\n" for i, t in enumerate(terms)
        )
    )
    emb = load_glove(spark, str(p))
    sigs = knn.typed_signatures(spark, sf_dir, embeddings=emb)
    cat = [s for s, _names, t in sigs if t == "Categorical"]
    assert cat and cat[0].count() > 0


def test_load_glove_missing_file_raises(spark, tmp_path):
    with pytest.raises(Exception):
        load_glove(spark, os.path.join(str(tmp_path), "nope.txt")).collect()
