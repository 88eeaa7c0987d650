"""Streaming corpus curation: the stateless keep/drop stream agrees
with the batch quality_filter decision on every document."""

from __future__ import annotations

from danae_spark.operators.textstats import quality_filter
from danae_spark.streaming.curation import (
    curated_stream,
    read_documents_stream,
    run_curation_available_now,
)


def test_streaming_curation_matches_batch_decision(spark, sf_dir):
    stream = curated_stream(read_documents_stream(spark, sf_dir))
    assert stream.isStreaming
    streamed = {
        r["doc_id"]: r for r in run_curation_available_now(stream, "t_curation").collect()
    }
    batch = {r["doc_id"]: r for r in quality_filter(spark, sf_dir).collect()}
    assert set(streamed) == set(batch) and len(batch) > 0
    # decision parity doc-by-doc, and the shared score column is identical
    for doc_id, b in batch.items():
        s = streamed[doc_id]
        assert s["keep"] == b["keep"], (doc_id, dict(s.asDict()), dict(b.asDict()))
        assert s["quality_score"] == b["quality_score"], doc_id
        assert s["has_pii"] == b["has_pii"]
    # both outcomes must actually occur at test SF for this to mean much
    kept = {d for d, r in streamed.items() if r["keep"] == 1}
    assert kept and len(kept) < len(streamed)


def test_curated_publish_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Exactly-once publish: drain the curation stream into the curated
    table, then simulate a killed-and-replayed micro-batch (fresh
    checkpoint => the file source re-delivers the same batch 0). The
    replay must OVERWRITE its batch partition, not append — table
    contents stay identical."""
    from danae_spark.operators.textstats import quality_filter
    from danae_spark.streaming.curation import curated_publish_sink

    out_dir = str(tmp_path / "curated")

    def drain(ckpt: str) -> None:
        stream = curated_stream(read_documents_stream(spark, sf_dir))
        q = curated_publish_sink(stream, out_dir, str(tmp_path / ckpt)).start()
        q.awaitTermination()

    drain("ckpt1")
    v1 = sorted(tuple(r) for r in spark.read.parquet(out_dir).drop("batch_id").collect())

    # published rows = exactly the batch decision's keep-set
    batch_keep = {r["doc_id"] for r in quality_filter(spark, sf_dir).collect() if r["keep"] == 1}
    assert {t[0] for t in v1} == batch_keep and batch_keep

    drain("ckpt2")  # replay of batch 0 after checkpoint loss
    v2 = sorted(tuple(r) for r in spark.read.parquet(out_dir).drop("batch_id").collect())
    assert v2 == v1


def test_nb_score_stream_parity_with_batch(spark, sf_dir):
    """Train the NB quality model in batch, score the document STREAM
    with it (closure-shipped weights), and require per-doc parity with
    the batch scorer: same token counts, same predictions, scores equal
    to rounding tolerance (the batch side rounds via decimal-exact
    davg; the stream side means float64 per doc)."""
    from danae_spark.catalog import load_table
    from danae_spark.operators.textstats import (
        nb_quality_classifier_frame,
        nb_train_weights,
    )
    from danae_spark.streaming.curation import (
        nb_score_stream,
        read_documents_stream,
        run_curation_available_now,
    )

    docs = load_table(spark, sf_dir, "documents")
    weights = nb_train_weights(docs)
    scored = nb_score_stream(read_documents_stream(spark, sf_dir), weights)
    assert scored.isStreaming
    streamed = {
        r["doc_id"]: r
        for r in run_curation_available_now(scored, "t_nb_stream").collect()
    }
    batch = {r["doc_id"]: r for r in nb_quality_classifier_frame(docs).collect()}
    assert set(streamed) == set(batch) and len(batch) > 0
    for doc_id, b in batch.items():
        s = streamed[doc_id]
        assert s["n_tokens"] == b["n_tokens"], doc_id
        assert abs(s["nb_logodds"] - b["nb_logodds"]) < 1e-3, doc_id
        # the >= 0 threshold can flip within float tolerance for docs
        # scoring essentially zero — only require matching predictions
        # where the batch score is decisively signed
        if abs(b["nb_logodds"]) >= 1e-3:
            assert s["pred_keep"] == b["pred_keep"], doc_id


def test_streamed_corpus_report_matches_batch(spark, sf_dir, tmp_path):
    """The folded streaming composition state equals the batch
    corpus_report exactly — decimal quality sums merge losslessly, so
    micro-batching cannot move a digit."""
    from danae_spark.operators.textstats import corpus_report
    from danae_spark.streaming.curation import (
        corpus_report_sink,
        read_documents_stream,
        streamed_corpus_report,
    )

    state = str(tmp_path / "report_state")
    ckpt = str(tmp_path / "ckpt")
    q = corpus_report_sink(
        read_documents_stream(spark, sf_dir), state, ckpt, "t_report_stream"
    ).start()
    q.awaitTermination()
    streamed = [tuple(r) for r in streamed_corpus_report(spark, state).collect()]
    batch = [tuple(r) for r in corpus_report(spark, sf_dir).collect()]
    assert streamed == batch and len(batch) > 0


def test_bpe_tokenize_stream_parity_with_batch(spark, sf_dir):
    from danae_spark.catalog import load_table
    from danae_spark.operators.bpe import bpe_tokenize_frame, train_bpe
    from danae_spark.streaming.curation import (
        bpe_tokenize_stream,
        read_documents_stream,
        run_curation_available_now,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, n_merges=30)
    streamed = {
        r.doc_id: r
        for r in run_curation_available_now(
            bpe_tokenize_stream(read_documents_stream(spark, sf_dir), merges),
            "t_bpe_stream",
        ).collect()
    }
    batch = {r.doc_id: r for r in bpe_tokenize_frame(docs, merges).collect()}
    assert set(streamed) == set(batch) and len(batch) > 0
    for doc_id, b in batch.items():
        s = streamed[doc_id]
        assert s.n_words == b.n_words and s.n_bpe_tokens == b.n_bpe_tokens
        assert list(s.tokens) == list(b.tokens)


def test_ann_candidates_stream_matches_batch_buckets(spark, sf_dir, tmp_path):
    """Streamed LSH candidate pairs equal the batch same-bucket pairs
    (same fixed-seed planes), with identical rounded cosines."""
    import os

    from danae_spark.catalog import load_table, table_path
    from danae_spark.functions import vectors
    from danae_spark.functions.rounding import rnd
    from danae_spark.operators.ann import _hyperplanes, lsh_bucket_col
    from danae_spark.streaming.curation import (
        ann_candidates_stream,
        run_curation_available_now,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # stream side: the first 10 vectors, landed as a parquet dir stream
    qdir = str(tmp_path / "queries")
    os.makedirs(qdir)
    emb.filter(F.col("vec_id") < 10).write.mode("overwrite").parquet(qdir)
    qstream = spark.readStream.schema(emb.schema).parquet(qdir)

    streamed = run_curation_available_now(
        ann_candidates_stream(qstream, emb, queries_are_corpus_rows=True),
        "t_ann_stream"
    )
    got = sorted(
        (r.query_id, r.cand_id, r.cosine) for r in streamed.collect()
    )

    # batch twin: same buckets, same pairs
    first = emb.select("embedding").head(1)
    planes = _hyperplanes(dim=len(first[0][0]))
    b = emb.withColumn("bucket", lsh_bucket_col("embedding", planes))
    q = b.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"), "bucket"
    )
    c = b.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb"), "bucket"
    )
    cos = vectors.pair_cosine_udf()
    want = sorted(
        (r.query_id, r.cand_id, r.cosine)
        for r in q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("cosine", rnd(cos("q_emb", "c_emb"), 6))
        .collect()
    )
    assert got == want and len(want) > 0


def test_ann_candidates_stream_external_ids_keep_collisions(spark, tmp_path):
    """Default (external query stream): an id collision with the corpus
    is NOT a self-pair and must stay in the candidate set."""
    import os

    from danae_spark.streaming.curation import (
        ann_candidates_stream,
        run_curation_available_now,
    )

    corpus = spark.createDataFrame(
        [(7, [1.0, 0.0, 0.0, 0.0]), (8, [0.9, 0.1, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    qdir = str(tmp_path / "q")
    os.makedirs(qdir)
    # query id 7 collides with corpus vec_id 7 but is a DIFFERENT vector
    spark.createDataFrame(
        [(7, [0.95, 0.05, 0.0, 0.0])], "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(qdir)
    qstream = spark.readStream.schema(corpus.schema).parquet(qdir)
    got = run_curation_available_now(
        ann_candidates_stream(qstream, corpus), "t_ann_ext"
    ).collect()
    cands = {r.cand_id for r in got}
    assert 7 in cands and 8 in cands  # the collision candidate survives


def test_dsir_score_stream_exact_parity_with_batch(spark, sf_dir):
    """Train the DSIR importance model in batch, score the document
    STREAM with it, and require EXACT per-doc parity with the batch
    dsir_scores_frame — n_grams, decimal-summed logw, md5 gumbel and
    the final score, bit for bit."""
    from pyspark.sql import functions as F

    from danae_spark.catalog import load_table
    from danae_spark.operators.dsir import dsir_model, dsir_scores_frame
    from danae_spark.streaming.curation import dsir_score_stream

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    model = dsir_model(docs, target)

    batch = {r["doc_id"]: r for r in dsir_scores_frame(docs, target).collect()}
    stream = dsir_score_stream(read_documents_stream(spark, sf_dir), model)
    assert stream.isStreaming
    streamed = {
        r["doc_id"]: r
        for r in run_curation_available_now(stream, "t_dsir_scores").collect()
    }
    assert set(streamed) == set(batch) and len(batch) > 0
    for doc_id, b in batch.items():
        s = streamed[doc_id]
        assert s["n_grams"] == b["n_grams"], doc_id
        assert s["logw"] == b["logw"], (doc_id, s["logw"], b["logw"])
        assert s["gumbel"] == b["gumbel"], doc_id
        assert s["score"] == b["score"], doc_id
    # scores must actually separate documents for the parity to mean much
    assert len({r["score"] for r in batch.values()}) > 10
