"""Streaming EXIF twin: micro-batched replay produces row-identical
output to the batch frame (structural parity — same frame function),
and the stream plan is stateless."""

import glob
import os
import shutil

from danae_spark.multimodal.exif import exif_frame, synth_exif_jpeg
from danae_spark.streaming.harvest import read_blob_stream
from danae_spark.streaming.media import exif_stream


def test_exif_stream_matches_batch(spark, tmp_path):
    blob_dir = str(tmp_path / "imgs")
    os.makedirs(blob_dir)
    rows1 = [(d, bytearray(synth_exif_jpeg(d))) for d in range(0, 8)]
    rows2 = [(d, bytearray(synth_exif_jpeg(d))) for d in range(8, 14)] + [
        (99, bytearray(b"not a jpeg"))  # junk payload: has_exif=0 row
    ]
    for name, rows in (("f1", rows1), ("f2", rows2)):
        spark.createDataFrame(rows, "doc_id long, payload binary").coalesce(
            1
        ).write.parquet(f"{blob_dir}/{name}")
    for sub in ("f1", "f2"):
        for i, f in enumerate(glob.glob(f"{blob_dir}/{sub}/*.parquet")):
            shutil.move(f, f"{blob_dir}/{sub}_{i}.parquet")
        shutil.rmtree(f"{blob_dir}/{sub}")

    stream = exif_stream(read_blob_stream(spark, blob_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("exif_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM exif_stream_test").collect())

    batch_df = spark.createDataFrame(rows1 + rows2, "doc_id long, payload binary")
    want = sorted(tuple(r) for r in exif_frame(batch_df).collect())
    assert got == want and len(got) == 15
    # the GPS PII signal flows through the stream (d=0 carries GPS)
    by_id = {r[0]: r for r in got}
    assert by_id[0][9] == 1  # has_gps
    assert by_id[99][1] == 0  # junk: has_exif=0, not a crash
    # docs 6 and 13 are the grid's no-EXIF / truncated-TIFF legs
    assert by_id[6][1] == 0 and by_id[13][1] == 0


def test_office_stream_matches_batch(spark, tmp_path):
    """Office text over a live streaming query: two landed files ->
    two micro-batches, row-identical to the batch frame, stateless."""
    import glob
    import os
    import shutil

    from danae_spark.multimodal.office import office_text_frame, synth_office
    from danae_spark.streaming.harvest import read_blob_stream
    from danae_spark.streaming.media import office_stream

    blob_dir = str(tmp_path / "office_blobs")
    os.makedirs(blob_dir)
    rows1 = [(d, bytearray(synth_office(d))) for d in range(0, 9)]  # incl. d=0 reject
    rows2 = [(d, bytearray(synth_office(d))) for d in range(9, 20)] + [
        (99, bytearray(b"PK\x03\x04 not a package"))
    ]
    for i, rows in enumerate((rows1, rows2)):
        sub = f"{blob_dir}/f{i}"
        spark.createDataFrame(rows, "doc_id long, payload binary").coalesce(
            1
        ).write.parquet(sub)
        for j, f in enumerate(glob.glob(f"{sub}/*.parquet")):
            shutil.move(f, f"{blob_dir}/f{i}_{j}.parquet")
        shutil.rmtree(sub)

    q = (
        office_stream(read_blob_stream(spark, blob_dir))
        .writeStream.format("memory")
        .queryName("office_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["doc_id"]: tuple(r)
        for r in spark.sql("SELECT * FROM office_stream_test").collect()
    }
    batch = spark.createDataFrame(rows1 + rows2, "doc_id long, payload binary")
    want = {r["doc_id"]: tuple(r) for r in office_text_frame(batch).collect()}
    assert got == want and len(got) == 21
    assert got[0][1] is None and got[99][1] is None  # rejects flow as NULL rows
    assert q.lastProgress is None or all(
        op.get("numRowsUpdated", 0) == 0
        for op in (q.lastProgress.get("stateOperators") or [])
    )
