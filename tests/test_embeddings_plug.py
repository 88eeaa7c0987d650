"""Pluggable word-embedding source for the Categorical search index.

The reference maps a categorical column to the mean GloVe-50d vector of
its top-k terms (word_aggregator.py:5,:13); the container ships no
embedding file, so the built-in path uses a deterministic stand-in. The
engine accepts a real term→vector table — these tests feed a toy one and
check the reference property the stand-in can't have: columns with
synonymous vocabularies land close in the Categorical index.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from danae_spark.profiling import tfidf
from danae_spark.search import knn

SYN = {("customer", "c_mktsegment"), ("orders", "o_orderpriority")}


def _toy_embeddings(spark, sf_dir):
    """term→vector: terms of the two 'synonym' columns share one vector;
    every other term gets a far-away per-term vector."""
    topk = tfidf.categorical_topk(spark, sf_dir).collect()
    syn_terms = {
        r.term for r in topk if (r.table_name, r.column_name) in SYN
    }
    rows = []
    for term in {r.term for r in topk}:
        if term in syn_terms:
            rows.append((term, [1.0, 0.0]))
        else:
            h = (hash(term) % 1000) / 1000.0
            rows.append((term, [-1.0 - h, 5.0 + h]))
    return spark.createDataFrame(rows, "term string, vector array<double>")


def test_synonym_columns_rank_closest(spark, sf_dir):
    emb = _toy_embeddings(spark, sf_dir)
    out = knn.signature_knn(spark, sf_dir, k=1, embeddings=emb)
    top = {
        (r.q_table, r.q_column): (r.cand_table, r.cand_column, r.dist)
        for r in out.filter(F.col("col_type") == "Categorical").collect()
    }
    # each synonym column's nearest categorical neighbor is the other one,
    # at distance 0 (identical mean vectors)
    assert top[("customer", "c_mktsegment")] == ("orders", "o_orderpriority", 0.0)
    assert top[("orders", "o_orderpriority")] == ("customer", "c_mktsegment", 0.0)


def test_vector_dims_inferred_and_oov_skipped(spark, sf_dir):
    emb = _toy_embeddings(spark, sf_dir)
    # drop one column's vocab entirely → OOV column vanishes (inner join),
    # like the reference's KeyedVectors lookup skipping unknown words
    part_terms = {
        r.term
        for r in tfidf.categorical_topk(spark, sf_dir).collect()
        if (r.table_name, r.column_name) == ("part", "p_type")
    }
    emb_no_part = emb.filter(~F.col("term").isin(list(part_terms)))
    cols = tfidf.categorical_column_embeddings(
        spark, sf_dir, dims=2, embeddings=emb_no_part
    )
    produced = {(r.table_name, r.column_name) for r in cols.collect()}
    assert ("part", "p_type") not in produced
    assert ("customer", "c_mktsegment") in produced
    # dims inferred from the table when not passed to typed_signatures
    sigs = knn.typed_signatures(spark, sf_dir, embeddings=emb)
    cat = [s for s in sigs if s[2] == "Categorical"][0]
    assert cat[1] == ("e0", "e1")
