"""Streaming link-graph twin: micro-batched replay produces
row-identical output to the batch frame (structural parity — same
frame function), and the stream plan is stateless."""

import glob
import os
import shutil

from danae_spark.multimodal.warc import synth_warc
from danae_spark.operators.frontier import page_links_frame
from danae_spark.streaming.harvest import read_blob_stream
from danae_spark.streaming.links import links_stream


def test_links_stream_matches_batch(spark, tmp_path):
    blob_dir = str(tmp_path / "warcs")
    os.makedirs(blob_dir)
    rows1 = [(d, bytearray(synth_warc(d))) for d in range(0, 5)]
    rows2 = [(d, bytearray(synth_warc(d))) for d in range(5, 9)] + [
        (99, bytearray(b"\x00\x01"))  # corrupt capture: no edges
    ]
    for name, rows in (("f1", rows1), ("f2", rows2)):
        spark.createDataFrame(rows, "doc_id long, payload binary").coalesce(
            1
        ).write.parquet(f"{blob_dir}/{name}")
    for sub in ("f1", "f2"):
        for i, f in enumerate(glob.glob(f"{blob_dir}/{sub}/*.parquet")):
            shutil.move(f, f"{blob_dir}/{sub}_{i}.parquet")
        shutil.rmtree(f"{blob_dir}/{sub}")

    stream = links_stream(read_blob_stream(spark, blob_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("links_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM links_stream_test").collect()
    )

    batch_df = spark.createDataFrame(
        rows1 + rows2, "doc_id long, payload binary"
    )
    want = sorted(tuple(r) for r in page_links_frame(batch_df).collect())
    assert got == want and len(got) > 0
    # the corrupt capture contributed nothing
    assert not any(r[0] == 99 for r in got)
