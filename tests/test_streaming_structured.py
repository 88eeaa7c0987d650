"""Streaming structured-data twin: micro-batched replay produces
row-identical output to the batch frame (structural parity — same
frame function), and the stream plan is stateless."""

import glob
import os
import shutil

from danae_spark.multimodal.htmltext import html_structured_frame, synth_structured_html
from danae_spark.streaming.harvest import read_blob_stream
from danae_spark.streaming.structured import structured_stream


def test_structured_stream_matches_batch(spark, tmp_path):
    blob_dir = str(tmp_path / "pages")
    os.makedirs(blob_dir)
    rows1 = [(d, bytearray(synth_structured_html(d))) for d in range(0, 5)]
    rows2 = [(d, bytearray(synth_structured_html(d))) for d in range(5, 9)] + [
        (99, bytearray(b"<a hre"))  # unwalkable page: NULL metadata row
    ]
    for name, rows in (("f1", rows1), ("f2", rows2)):
        spark.createDataFrame(rows, "doc_id long, payload binary").coalesce(
            1
        ).write.parquet(f"{blob_dir}/{name}")
    for sub in ("f1", "f2"):
        for i, f in enumerate(glob.glob(f"{blob_dir}/{sub}/*.parquet")):
            shutil.move(f, f"{blob_dir}/{sub}_{i}.parquet")
        shutil.rmtree(f"{blob_dir}/{sub}")

    stream = structured_stream(read_blob_stream(spark, blob_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("structured_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM structured_stream_test").collect()
    )

    batch_df = spark.createDataFrame(rows1 + rows2, "doc_id long, payload binary")
    want = sorted(tuple(r) for r in html_structured_frame(batch_df).collect())
    assert got == want and len(got) == 10
    # the unwalkable page contributed a NULL row, not a crash
    null_row = next(r for r in got if r[0] == 99)
    assert all(v is None for v in null_row[1:])
