"""Streaming text_harvest twin: micro-batched replay produces
row-identical output to the batch frame (structural parity — same
frame function), and the stream plan is stateless."""

import os

from danae_spark.multimodal.harvest import synth_doc, text_harvest_frame
from danae_spark.streaming.harvest import harvest_stream, read_blob_stream


def test_stream_matches_batch(spark, tmp_path):
    blob_dir = str(tmp_path / "blobs")
    os.makedirs(blob_dir)
    # two landed files -> two micro-batches; mixed classes + a corrupt blob
    rows1 = [(d, bytearray(synth_doc(d))) for d in range(0, 7)]
    rows2 = [(d, bytearray(synth_doc(d))) for d in range(7, 13)] + [
        (99, bytearray(b"\x00\x01\x02\x03"))
    ]
    spark.createDataFrame(rows1, "doc_id long, payload binary").coalesce(1).write.parquet(
        blob_dir + "/f1"
    )
    spark.createDataFrame(rows2, "doc_id long, payload binary").coalesce(1).write.parquet(
        blob_dir + "/f2"
    )
    # flatten: the file source wants one directory of parquet files
    import glob
    import shutil

    for sub in ("f1", "f2"):
        for i, f in enumerate(glob.glob(f"{blob_dir}/{sub}/*.parquet")):
            shutil.move(f, f"{blob_dir}/{sub}_{i}.parquet")
        shutil.rmtree(f"{blob_dir}/{sub}")

    stream = harvest_stream(read_blob_stream(spark, blob_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("harvest_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["doc_id"]: tuple(r)
        for r in spark.sql("SELECT * FROM harvest_stream_test").collect()
    }
    batch_df = spark.createDataFrame(
        rows1 + rows2, "doc_id long, payload binary"
    )
    want = {r["doc_id"]: tuple(r) for r in text_harvest_frame(batch_df).collect()}
    assert got == want
    assert got[99][1] is None  # corrupt blob -> null row, not a stream crash
    # stateless append: no state store operators in the streaming plan
    assert q.lastProgress is None or all(
        op.get("numRowsUpdated", 0) == 0 for op in (q.lastProgress.get("stateOperators") or [])
    )
