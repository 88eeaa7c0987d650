"""Streaming language-ID twin (r14): row-identical to the batch
classifier, and genuinely runnable as a stateless streaming append."""

from __future__ import annotations

from pyspark.sql import functions as F

from danae_spark.catalog import load_table
from danae_spark.operators.langid import lang_id_ngram_frame
from danae_spark.streaming.langstream import lang_id_stream


def test_rowwise_twin_matches_batch_classifier(spark, sf_dir):
    """The whole point of shared semantics: the row-wise array-expr
    plan must reproduce the batch explode+window plan EXACTLY —
    predicted, n_profile, best_dist — over the real documents table
    (which includes multilingual and short/empty texts)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = lang_id_ngram_frame(docs, label_col=None).select(
        "doc_id", "n_profile", "predicted", "best_dist"
    )
    twin = lang_id_stream(docs)
    diff = batch.alias("b").join(twin.alias("t"), "doc_id").filter(
        (F.col("b.predicted") != F.col("t.predicted"))
        | (F.col("b.n_profile") != F.col("t.n_profile"))
        | ~F.col("b.best_dist").eqNullSafe(F.col("t.best_dist"))
    )
    assert batch.count() == twin.count() > 0
    assert diff.count() == 0


def test_twin_handles_letterless_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "1234 #### 5678"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in lang_id_stream(df).collect()}
    for i in (1, 2, 3):
        assert got[i]["predicted"] == "und"
        assert got[i]["n_profile"] == 0 and got[i]["best_dist"] is None


def test_twin_is_stateless_streaming_append(spark, tmp_path):
    """Run the twin as an ACTUAL Structured Streaming query (file
    source -> memory sink, append mode): it must start — proof there
    is no shuffle/state in the plan — and its rows must match the
    batch run of the same input."""
    src = str(tmp_path / "in")
    rows = [
        (1, "the quick brown fox reads a good book by the window every evening"),
        (2, "le renard brun rapide saute par dessus le chien paresseux chaque matin"),
        (3, "der schnelle braune fuchs springt jeden morgen über den faulen hund"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        lang_id_stream(stream)
        .writeStream.format("memory")
        .queryName("langstream_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: r["predicted"]
            for r in spark.sql("SELECT * FROM langstream_test").collect()
        }
    finally:
        q.stop()
    want = {r["doc_id"]: r["predicted"] for r in lang_id_stream(df).collect()}
    assert got == want
    assert got[1] == "en" and got[2] == "fr" and got[3] == "de"
